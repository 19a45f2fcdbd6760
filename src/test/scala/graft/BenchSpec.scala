package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench harness's baseline parser feeds the self-reconciliation gate
  * (in-suite median >2x the BASELINE.md row triggers an isolated
  * re-measure) — a parser that silently returns an empty map would turn
  * reconciliation off without any visible failure, so it gets its own
  * spec. */
class BenchSpec extends AnyFunSuite {

  private def withBaseline(content: String)(f: String => Unit): Unit = {
    val p = java.nio.file.Files.createTempFile("baseline", ".md")
    try {
      java.nio.file.Files.writeString(p, content)
      f(p.toString)
    } finally java.nio.file.Files.deleteIfExists(p)
  }

  private val table =
    """# BASELINE
      |
      || query | sf | wall-clock ms (median of 3) | spark conf |
      ||---|---|---|---|
      || agg_approx | 0.1 | 851 | local[32], shuffle.partitions=32, AQE on |
      || ded_contain | 0.1 | 3810 | local[32], shuffle.partitions=32, AQE on |
      |
      |## scale ramp (must not override the 0.1 rows)
      |
      || query | sf | wall-clock ms | spark conf |
      ||---|---|---|---|
      || ded_contain | 1 | 12000 | local[32] |
      |""".stripMargin

  test("parses first sf0.1 row per query, in seconds") {
    withBaseline(table) { path =>
      val b = Bench.parseBaseline("/root/testdata/sf0.1", path)
      assert(b == Map("agg_approx" -> 0.851, "ded_contain" -> 3.810))
    }
  }

  test("trailing slash on the sf dir still pins sf0.1") {
    withBaseline(table) { path =>
      assert(Bench.parseBaseline("/root/testdata/sf0.1//", path).nonEmpty)
    }
  }

  test("non-0.1 bench SF disables reconciliation (empty envelope)") {
    withBaseline(table) { path =>
      assert(Bench.parseBaseline("/root/testdata/sf0.01", path).isEmpty)
      assert(Bench.parseBaseline("/tmp/sf1", path).isEmpty)
    }
  }

  test("missing baseline file yields an empty envelope, not a crash") {
    assert(Bench.parseBaseline("/root/testdata/sf0.1", "/nonexistent/BASELINE.md").isEmpty)
  }

  test("the committed BASELINE.md parses to a full envelope") {
    val b = Bench.parseBaseline("/root/testdata/sf0.1", "BASELINE.md")
    assert(b.size > 200, s"expected one row per gated query, got ${b.size}")
    assert(b.values.forall(v => v > 0 && v < 120), "rows are positive seconds under 2 min")
  }

  test("pinned calibration parses the probe line in seconds") {
    withBaseline(table + "\nCalibration probe: 700 ms at local[32].\n") { path =>
      assert(Bench.pinnedCalibration(path).contains(0.7))
    }
    // absent line / absent file -> None (factor reported null, never a crash)
    withBaseline(table) { path => assert(Bench.pinnedCalibration(path).isEmpty) }
    assert(Bench.pinnedCalibration("/nonexistent/BASELINE.md").isEmpty)
  }

  test("the committed BASELINE.md pins a calibration probe cost") {
    val c = Bench.pinnedCalibration("BASELINE.md")
    assert(c.exists(v => v > 0.05 && v < 10), s"probe pin missing or implausible: $c")
  }

  test("the reconciliation trigger fires at >2x, or >1.5x with >0.5s inflation") {
    assert(Bench.polluted(2.1, 1.0))    // plain 2x breach
    assert(Bench.polluted(1.9, 1.0))    // 1.9x with 0.9s inflation — the widened arm
    assert(Bench.polluted(6.4, 3.81))   // round-8 ded_contain: 1.68x, +2.6s — must fire
    assert(!Bench.polluted(1.4, 1.0))   // under both arms
    assert(!Bench.polluted(1.6, 1.2))   // 1.33x — ratio arm not met despite +0.4s
    assert(!Bench.polluted(0.35, 0.2))  // cheap query, 1.75x but only +0.15s absolute
    assert(Bench.polluted(0.45, 0.2))   // cheap query past plain 2x still fires
  }

  // Reconciliation reports the FASTER of the in-suite and isolated medians:
  // both measure the identical plan and pollution only inflates, so taking
  // the isolated figure unconditionally lets a polluted RE-MEASURE replace a
  // clean in-suite number (round 8: ded_contain 6.1s in-suite → 12.1s
  // isolated, identical shuffle bytes).
  test("final figure is the faster of in-suite and isolated medians") {
    def rs(sec: Double) = Bench.RunStats(sec, 1L, 2L, 3L)
    def iso(sec: Double) =
      Bench.Isolated(rs(sec), "median", Some(0.7), 1, probeHot = false, None)
    assert(Bench.QueryResult(Some(rs(6.1)), Some(iso(12.1))).finalSec == 6.1)
    assert(Bench.QueryResult(Some(rs(29.3)), Some(iso(4.2))).finalSec == 4.2)
    assert(Bench.QueryResult(Some(rs(1.0)), None).finalSec == 1.0)
    assert(Bench.QueryResult(None, Some(iso(2.0))).finalSec == 2.0)
    assert(Bench.QueryResult(None, None).finalSec == -1.0)
  }
}
