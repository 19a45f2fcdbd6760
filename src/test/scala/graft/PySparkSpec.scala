package graft

import java.nio.file.{Files, Paths}

import scala.sys.process._

/** Python-bindings smoke over the graft extension surface — the analog of
  * the reference's pyballista context test
  * (reference: python/pyballista/tests/test_context.py: create context,
  * run SQL, collect). PySpark IS the Python binding for a Spark-native
  * engine, so the gate is that a stock `pyspark` session configured with
  * nothing but the library classpath and
  * `spark.sql.extensions=graft.GraftExtensions`:
  *
  *  1. bootstraps the SQL function registry through the JVM gateway
  *     (`spark._jvm.graft.functions.GraftFunctions.registerAll`) and
  *     resolves the graft_* functions from Python-issued SQL with values
  *     identical to the in-process JVM session, and
  *  2. plans the row_number()<=k idiom through the injected TopKRewrite /
  *     planner strategy (TopKPerKeyPartial in the executed plan) — the
  *     extension machinery, not just the function registry, is live under
  *     Python.
  *
  * Runs the driver-side python3 in a subprocess; cancels (does not fail)
  * when pyspark is not importable in the sandbox.
  */
class PySparkSpec extends SparkSpec {

  private lazy val havePyspark: Boolean =
    scala.util.Try(
      Process(Seq("python3", "-c", "import pyspark")).!(ProcessLogger(_ => ())) == 0
    ).getOrElse(false)

  test("pyspark session resolves graft registry functions and TopK strategy") {
    assume(havePyspark, "pyspark not importable by python3 in this environment")

    // expected values computed in THIS JVM session — the python session
    // must reproduce them bit-for-bit through the same registry builders
    val expected = spark.sql(
      "SELECT graft_hash64('en') AS h, graft_token_count('a b  c') AS t").collect()(0)
    val expectedHash = expected.getLong(0)
    val expectedTok = expected.getLong(1)

    val classesDir = Paths.get("target/scala-2.13/classes").toAbsolutePath
    assert(Files.isDirectory(classesDir), s"compiled classes missing at $classesDir")
    val script = Files.createTempFile("graft_pyspark_smoke", ".py")
    Files.writeString(script,
      s"""
         |from pyspark.sql import SparkSession
         |
         |spark = (SparkSession.builder.master("local[2]")
         |    .appName("graft-pyspark-smoke")
         |    .config("spark.driver.extraClassPath", "$classesDir")
         |    .config("spark.sql.extensions", "graft.GraftExtensions")
         |    .config("spark.sql.shuffle.partitions", "4")
         |    .config("spark.ui.enabled", "false")
         |    .getOrCreate())
         |
         |# bootstrap the SQL registry through the gateway — the same single
         |# call a JVM deployment makes (pyballista's Context.__init__ analog)
         |spark._jvm.graft.functions.GraftFunctions.registerAll(spark._jsparkSession)
         |
         |row = spark.sql(
         |    "SELECT graft_hash64('en') AS h, graft_token_count('a b  c') AS t"
         |).collect()[0]
         |assert row.h == $expectedHash, f"hash64 mismatch: {row.h}"
         |assert row.t == $expectedTok, f"token_count mismatch: {row.t}"
         |
         |spark.read.parquet("$sfDir/orders.parquet").createOrReplaceTempView("orders")
         |# rank column discarded in the outer projection — the shape
         |# TopKRewrite requires (it only fires when rk is provably dead)
         |topk = spark.sql(\"\"\"
         |    SELECT o_custkey, o_orderkey FROM (
         |      SELECT o_custkey, o_orderkey,
         |             row_number() OVER (PARTITION BY o_custkey
         |                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
         |      FROM orders) WHERE rk <= 2\"\"\")
         |plan = topk._jdf.queryExecution().executedPlan().toString()
         |assert "TopKPerKeyPartial" in plan, "TopK strategy not applied:\\n" + plan
         |n = topk.count()
         |assert n > 0, "empty top-k result"
         |print("GRAFT_PYSPARK_SMOKE_OK", n)
         |spark.stop()
         |""".stripMargin)
    try {
      val out = new StringBuilder
      val code = Process(Seq("python3", script.toString))
        .!(ProcessLogger(l => out.append(l).append('\n'), l => out.append(l).append('\n')))
      assert(code == 0, s"pyspark smoke exited $code:\n${out.toString.takeRight(4000)}")
      assert(out.toString.contains("GRAFT_PYSPARK_SMOKE_OK"),
        s"marker missing:\n${out.toString.takeRight(4000)}")
    } finally Files.deleteIfExists(script)
  }
}
