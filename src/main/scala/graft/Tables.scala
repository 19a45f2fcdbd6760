package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the synthetic TPC-H-ish tables (TESTDATA.md).
  *
  * Equivalent of the reference's table registration surface
  * (reference: ballista/client/src/context.rs:234-301 register_parquet/csv/avro).
  * Parquet scans get projection + predicate pushdown from Catalyst for free;
  * at 100 TB these are hive-partitionable paths — the loader takes any
  * directory, so partitioned layouts work unchanged.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def events(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "events")

  /** events with both a proper timestamp `ts` and epoch-nanos long `ts_ns`,
    * whatever physical type the parquet writer used. Generated data has
    * shipped both ways across rounds: TIMESTAMP(NANOS) (surfaced as
    * nanos-long via the nanosAsLong conf in GraftSession) and plain
    * timestamp[us] (surfaced as TIMESTAMP_NTZ). Branching on the scanned
    * type keeps every downstream ts/ts_ns consumer schema-agnostic; the
    * NTZ→LTZ cast is wall-clock-preserving under the session's UTC zone,
    * matching how DuckDB reads the same naive column in the oracles.
    * Integer DIV avoids double-precision loss on ~1.7e18 nano values.
    */
  def eventsTs(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", expr("timestamp_micros(ts_ns DIV 1000)"))
      case _ =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
          .withColumn("ts_ns", expr("unix_micros(ts) * 1000"))
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Register every table as a temp view (for the SQL entry points). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
