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

  /** Weighted-percentile buffer: distinct values → accumulated weight,
    * capped at [[WeightedPercentile.Cap]] entries (rank-merged when
    * exceeded — t-digest-style compaction, exact below the cap). */
  case class WPBuf(pairs: Map[Double, Double], q: Double)

  /** Mergeable weighted percentile (the reference's
    * APPROX_PERCENTILE_CONT_WITH_WEIGHT, datafusion.proto:545) as a typed
    * Aggregator: per-partition partial maps merge associatively, so it
    * runs as a normal two-phase aggregate at any scale. Exact whenever the
    * value column has fewer than `Cap` distinct values (true for e.g.
    * quantity-like columns); beyond that, rank-adjacent entries merge by
    * weighted mean — the same error model as a fixed-size t-digest. Input:
    * (value, weight, q) with q constant per group. */
  object WeightedPercentile extends Aggregator[(Double, Double, Double), WPBuf, Double] {
    val Cap = 4096

    def zero: WPBuf = WPBuf(Map.empty, Double.NaN)

    private def compact(b: WPBuf): WPBuf =
      if (b.pairs.size <= Cap) b
      else {
        // merge rank-adjacent pairs (deterministic: sorted by value)
        val sorted = b.pairs.toArray.sortBy(_._1)
        val per = math.ceil(sorted.length.toDouble / Cap).toInt
        val merged = sorted.grouped(per).map { g =>
          val w = g.map(_._2).sum
          val v = g.map { case (x, wx) => x * wx }.sum / w
          v -> w
        }.toMap
        WPBuf(merged, b.q)
      }

    def reduce(b: WPBuf, in: (Double, Double, Double)): WPBuf = {
      val (v, w, q) = in
      compact(WPBuf(b.pairs.updated(v, b.pairs.getOrElse(v, 0.0) + w), q))
    }

    def merge(a: WPBuf, b: WPBuf): WPBuf = {
      val pairs = b.pairs.foldLeft(a.pairs) { case (acc, (v, w)) =>
        acc.updated(v, acc.getOrElse(v, 0.0) + w)
      }
      compact(WPBuf(pairs, if (a.q.isNaN) b.q else a.q))
    }

    /** Smallest value whose cumulative weight reaches q of the total. */
    def finish(b: WPBuf): Double = {
      if (b.pairs.isEmpty) return Double.NaN
      val sorted = b.pairs.toArray.sortBy(_._1)
      val tot = sorted.map(_._2).sum
      var cum = 0.0
      var i = 0
      while (i < sorted.length) {
        cum += sorted(i)._2
        if (cum >= b.q * tot) return sorted(i)._1
        i += 1
      }
      sorted.last._1
    }

    def bufferEncoder: Encoder[WPBuf] = Encoders.product[WPBuf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Register all graft UDFs/UDAFs into the session (SQL-callable). */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("graft_sum_squares", org.apache.spark.sql.functions.udaf(SumSquares))
    spark.udf.register("graft_tax", (p: Double) => p * 1.1)
    spark.udf.register("graft_wpercentile", org.apache.spark.sql.functions.udaf(WeightedPercentile))
  }
}
