package graft

import org.apache.spark.sql.SparkSession

/** Benchmark harness: runs every registered query against
  * SPARK_GRAFT_SF_DIR, prints one JSON line the driver consumes.
  *
  * Each query is forced through the noop sink (full plan executes — unlike
  * count(), which lets Catalyst prune projections), after one warmup run;
  * the reported time is the median of SPARK_GRAFT_BENCH_ITERS (default 3)
  * runs, mirroring the reference harness's iterations
  * (reference: benchmarks/src/bin/tpch.rs:353-445).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    val spark = GraftSession.getOrCreate(s"local[$cpus]", cpus.toInt)
    graft.queries.SourcesDdl.cleanStaleScratch()

    def runOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }

    // optional subset (comma-separated names), same contract as Verify —
    // used by the local scale-ramp run; the driver never sets it
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)

    // State hygiene between queries: ddl_cache leaves a table cached and the
    // iterative graph/clustering queries localCheckpoint RDD blocks that are
    // never unpersisted. In a 269-query single-JVM sweep, everything that runs
    // after them sees storage-memory pressure (judge measured q3 9.7s in-suite
    // vs 1.5s isolated). Clear both after every query so per-query times
    // reflect the plan, not the suite order.
    def clearSuiteState(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val t = try {
        runOnce(fn) // warmup: plan + codegen + file-footer caches
        clearSuiteState()
        val times = (1 to iters).map { _ =>
          val t = runOnce(fn); clearSuiteState(); t
        }.sorted
        times(times.length / 2)
      } catch { case _: Throwable => -1.0 }
      name -> t
    }
    // The driver retains only the last 2000 chars of stdout ("tail") and
    // parses the JSON line out of that buffer — at 180+ queries a
    // full-precision map is ~4KB and truncates, so BENCH_r{3,4}.json came
    // back parsed:null. Two outputs instead: the complete map goes to
    // BENCH_FULL.json (cwd = repo root; round-end auto-commit picks it up),
    // and stdout carries a line capped to fit the tail, keeping every
    // failed query (-1 sentinel) plus the most expensive ones — the
    // entries the baseline comparison actually needs.
    def fmt(v: Double): String =
      if (v < 0) "-1" else String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def jsonLine(rs: Seq[(String, Double)], extra: String): String = {
      val qs = rs.sortBy(_._1).map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      val total = results.collect { case (_, v) if v >= 0 => v }.sum
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${results.length},$extra"queries":$qs,"sf":"$sfDir"}"""
    }
    // only full-surface runs own the committed artifact — a SPARK_GRAFT_ONLY
    // subset run (scale ramps, spot checks) must not clobber it
    if (only.isEmpty)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("BENCH_FULL.json"), jsonLine(results, "") + "\n")
    val budget = 1800
    // failures first (always visible), then descending cost
    val prio = results.sortBy { case (_, v) => (v >= 0, -v) }
    var kept = prio
    while (jsonLine(kept, "\"full\":\"BENCH_FULL.json\",").length > budget && kept.nonEmpty)
      kept = kept.dropRight(1)
    println(jsonLine(kept, "\"full\":\"BENCH_FULL.json\","))
    spark.stop()
  }
}
