package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** End-to-end demonstrations of the at-scale access paths the operator
  * scaladocs promise: the IVF corpus written bucketed by cell so probes
  * become partition-pruned scans, and Spark's runtime Bloom-filter join
  * pruning cutting the big side of a selective join before the shuffle.
  */
class ScalePathsSpec extends SparkSpec {

  test("IVF at rest: cell-partitioned layout turns probes into pruned scans") {
    val corpus = Tables.embeddings(spark, sfDir)
    val assigned = Similarity.ivfAssign(corpus, nCells = 16)
      .select(col("cell_id"), col("corpus_id"), col("c_vec").as("embedding"))
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    assigned.write.mode("overwrite").partitionBy("cell_id").parquet(dir)

    val probeCells = Seq(1, 5, 9)
    val atRest = spark.read.parquet(dir).filter(col("cell_id").isin(probeCells.map(Int.box): _*))
    atRest.collect()
    val plan = atRest.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("cell_id"),
      "probe filter must prune partitions, not scan-and-filter:\n" + plan.take(1500))
    // and the pruned read is semantically the in-memory filter
    val expected = assigned.filter(col("cell_id").isin(probeCells.map(Int.box): _*)).count()
    assert(expected > 0 && atRest.count() === expected)
  }

  test("runtime Bloom filter prunes the big side of a selective shuffle join") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      // force a shuffle join (broadcast would use its own pruning) and let
      // the injection rule see our small local files as "big enough"
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1")
      val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val hot = spark.read.parquet(s"$sfDir/orders.parquet")
        .filter(col("o_totalprice") > 300000) // selective but non-empty at sf0.001
      val joined = lineitem.join(hot, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
        "expected a runtime bloom filter on the lineitem scan side:\n" + plan.take(2000))
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
