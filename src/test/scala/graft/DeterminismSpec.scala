package graft

/** Partitioning-determinism guarantees: queries whose oracle gate depends on
  * bit-exact float arithmetic must produce IDENTICAL bytes under a different
  * shuffle layout — the property that makes their results reproducible on a
  * 1000-executor cluster, not just on this box. Each test re-runs the query
  * with a co-prime shuffle-partition count and compares the rendered rows
  * (Row equality would coerce -0.0 == 0.0 via boxed numeric equality;
  * toString preserves the sign, so a fold-order sign flip fails the test).
  */
class DeterminismSpec extends SparkSpec {

  private def runTwice(name: String): Unit = {
    def render(): Seq[String] =
      SparkEntry.queries(name)(spark, sfDir).collect().toSeq.map(_.toString)
    val a = render()
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try {
      val b = render()
      assert(a == b, s"$name differs under 7 shuffle partitions")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("txt_lmscore: ordered log-prob sums are layout-independent") {
    runTwice("txt_lmscore")
  }

  test("emb_centroid: ordered component sums are layout-independent") {
    runTwice("emb_centroid")
  }

  test("smp_mixture: quotas and sampled sets are layout-independent") {
    runTwice("smp_mixture")
  }

  test("ded_semantic: cell assignment and keep flags are layout-independent") {
    runTwice("ded_semantic")
  }

  test("sim_kmeans: iterated centroids are layout-independent") {
    runTwice("sim_kmeans")
  }

  test("sim_lsh: collapsed pair generation is layout-independent") {
    runTwice("sim_lsh")
  }

  test("sort_distinct_on: top-1-per-key tie-breaks are layout-independent") {
    runTwice("sort_distinct_on")
  }

  test("agg_stragg: WITHIN GROUP ordering is layout-independent") {
    runTwice("agg_stragg")
  }
}
