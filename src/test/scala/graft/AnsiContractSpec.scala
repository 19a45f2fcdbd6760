package graft

import org.scalatest.funsuite.AnyFunSuite

/** The ANSI session contract (round 14).
  *
  * Every contract in the degenerate/differential program leans on
  * `spark.sql.ansi.enabled=true` — loud ANSI failures on overflow and bad
  * casts, with the `try_*` family as the explicit opt-out — but ANSI mode
  * is a runtime conf a production cluster can flip in
  * `spark-defaults.conf`. Rather than re-verify 272 queries under a second
  * arithmetic semantics (and maintain a divergence list forever), the
  * engine DECLARES ANSI-on as part of its session contract: GraftSession
  * pins it at build time and `getOrCreate` fails fast if a host override
  * survived. This spec pins all three sides of that contract:
  * the pin exists, a dynamically flipped session is healed (or rejected)
  * by the next `getOrCreate`, and the semantics the contract buys —
  * overflow fails loud, `try_*` stays the sanctioned escape — really hold
  * on a contract session.
  */
class AnsiContractSpec extends AnyFunSuite {

  private def session = GraftSession.getOrCreate("local[4,2]", 4)

  test("GraftSession sessions run with ANSI on") {
    assert(session.conf.get("spark.sql.ansi.enabled") == "true")
  }

  test("a host-style dynamic override is restored by the next getOrCreate (or rejected loudly)") {
    val s = session
    s.conf.set("spark.sql.ansi.enabled", "false")
    try {
      // the builder re-applies runtime confs to the existing session; if a
      // future Spark stops doing that, the require must throw the named
      // contract message instead of silently returning an ANSI-off session
      val healed =
        try Right(GraftSession.getOrCreate("local[4,2]", 4))
        catch { case e: IllegalArgumentException => Left(e) }
      healed match {
        case Right(s2) =>
          assert(s2.conf.get("spark.sql.ansi.enabled") == "true",
            "getOrCreate returned a session with the contract silently violated")
        case Left(e) =>
          assert(e.getMessage.contains("spark.sql.ansi.enabled"),
            s"contract rejection must name the conf: ${e.getMessage}")
      }
    } finally session.conf.set("spark.sql.ansi.enabled", "true")
  }

  test("the contract buys loud overflow: BIGINT sum overflow fails instead of wrapping") {
    import org.apache.spark.sql.functions._
    val s = session
    val e = intercept[Throwable] {
      s.range(0, 3).select(lit(Long.MaxValue).as("v"))
        .agg(sum(col("v"))).collect()
    }
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => String.valueOf(t.getMessage)).mkString("\n")
    assert(msgs.toLowerCase.contains("overflow"), s"expected a loud ANSI overflow, got: $msgs")
  }

  test("try_* stays the sanctioned opt-out under the contract") {
    val s = session
    val r = s.sql("SELECT try_add(9223372036854775807L, 1L) AS a, try_cast('x' AS INT) AS c")
      .collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
