package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Source/sink round-trips (reference §2.1: parquet/csv/json scans + write
  * sinks). Avro is unavailable in this environment (no spark-avro module
  * jar) — documented gap; ORC covered as the columnar alternative.
  */
class SourcesSpec extends SparkSpec {

  private lazy val base = Tables.nation(spark, sfDir)
  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-$name").resolve("out").toString

  private def assertRoundTrip(written: org.apache.spark.sql.DataFrame): Unit = {
    val a = base.orderBy("n_nationkey").collect()
    val b = written.orderBy("n_nationkey").collect()
    assert(a.length === b.length)
    assert(a.map(_.getAs[String]("n_name")).toSeq === b.map(_.getAs[String]("n_name")).toSeq)
  }

  test("parquet write/read round-trip") {
    val p = tmp("parquet")
    base.write.parquet(p)
    assertRoundTrip(spark.read.parquet(p))
  }

  test("csv write/read round-trip with header and delimiter") {
    val p = tmp("csv")
    base.write.option("header", "true").option("delimiter", "|").csv(p)
    val back = spark.read.option("header", "true").option("delimiter", "|")
      .schema(base.schema).csv(p)
    assertRoundTrip(back)
  }

  test("csv read with inferred schema") {
    val p = tmp("csv2")
    base.write.option("header", "true").csv(p)
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(p)
    assert(back.count() === base.count())
    assert(back.schema.fieldNames.toSeq === base.schema.fieldNames.toSeq)
  }

  test("ndjson write/read round-trip") {
    val p = tmp("json")
    base.write.json(p)
    assertRoundTrip(spark.read.json(p).select(base.columns.map(col): _*))
  }

  test("orc write/read round-trip") {
    val p = tmp("orc")
    base.write.orc(p)
    assertRoundTrip(spark.read.orc(p))
  }

  test("partitioned parquet write prunes partitions on read") {
    val p = tmp("part")
    Tables.customer(spark, sfDir).write.partitionBy("c_mktsegment").parquet(p)
    val one = spark.read.parquet(p).filter(col("c_mktsegment") === "BUILDING")
    val scanned = one.queryExecution.executedPlan.toString
    assert(one.count() > 0)
    // partition filter must not survive as a data filter — it's pruned at file listing
    assert(!scanned.contains("PushedFilters: [IsNotNull(c_mktsegment)"))
  }
}
