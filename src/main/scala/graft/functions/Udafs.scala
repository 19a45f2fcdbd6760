package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

/** UDAF surface (reference: AggregateUDFExprNode, datafusion.proto:563-567,
  * plugin registry core/src/plugin/udf.rs:29-53). Spark-native equivalent:
  * typed Aggregator registered through functions.udaf / spark.udf.register.
  */
object Udafs {

  /** Exact integer sum-of-squares — overflow-safe for the test domain,
    * deterministic under any partitioning (long addition is associative). */
  object SumSquares extends Aggregator[Long, Long, Long] {
    def zero: Long = 0L
    def reduce(acc: Long, x: Long): Long = acc + x * x
    def merge(a: Long, b: Long): Long = a + b
    def finish(acc: Long): Long = acc
    def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Register all graft UDFs/UDAFs into the session (SQL-callable). */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("graft_sum_squares", org.apache.spark.sql.functions.udaf(SumSquares))
    spark.udf.register("graft_tax", (p: Double) => p * 1.1)
  }
}
