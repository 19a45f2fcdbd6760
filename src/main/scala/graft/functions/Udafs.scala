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

  /** Misra-Gries summary: item → lower-bound count, plus the cumulative
    * decrement `err` that bounds the undercount. */
  case class MGBuf(counts: Map[String, Long], err: Long)

  /** Mergeable Misra-Gries heavy-hitters sketch with capacity [[MisraGries.K]]
    * — the constant-memory at-scale path behind exact top-k term queries
    * (when the term domain itself is too hot to aggregate exactly). Partial
    * summaries merge associatively (Agarwal et al., "Mergeable Summaries",
    * PODS'12: pointwise sum, then subtract the (K+1)-th largest count), so
    * it runs as a normal two-phase Spark aggregate: map-side partials of K
    * entries each, one tiny shuffle, no row ever leaves its partition.
    *
    * Invariants (checked end-to-end by the `txt_heavyhitters` gate):
    * estimates never overcount (`est ≤ true`), the undercount is bounded by
    * the tracked decrement total (`true − est ≤ err`), and any item absent
    * from the summary has `true ≤ err` — so every item with
    * `true > err` is guaranteed present. */
  object MisraGries extends Aggregator[String, MGBuf, MGBuf] {
    val K = 8

    def zero: MGBuf = MGBuf(Map.empty, 0L)

    def reduce(b: MGBuf, term: String): MGBuf =
      b.counts.get(term) match {
        case Some(c) => MGBuf(b.counts.updated(term, c + 1), b.err)
        case None if b.counts.size < K => MGBuf(b.counts.updated(term, 1L), b.err)
        case None =>
          // full and unseen: decrement every counter (one "vote" cancels
          // K+1 distinct items), drop zeros — the classic MG step
          val dec = b.counts.view.mapValues(_ - 1).filter(_._2 > 0).toMap
          MGBuf(dec, b.err + 1)
      }

    def merge(a: MGBuf, b: MGBuf): MGBuf = {
      val summed = b.counts.foldLeft(a.counts) { case (acc, (t, c)) =>
        acc.updated(t, acc.getOrElse(t, 0L) + c)
      }
      val err = a.err + b.err
      if (summed.size <= K) MGBuf(summed, err)
      else {
        // subtract the (K+1)-th largest count from everything; at most K
        // entries stay positive and the undercount grows by exactly d
        val d = summed.values.toArray.sorted(Ordering[Long].reverse)(K)
        MGBuf(summed.view.mapValues(_ - d).filter(_._2 > 0).toMap, err + d)
      }
    }

    def finish(b: MGBuf): MGBuf = b
    def bufferEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
    def outputEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
  }

  /** KLL-style quantile-sketch buffer: `levels(i)` holds items of weight
    * 2^i; `n` is the exact input count; `err` is the accumulated worst-case
    * rank-error bound (one 2^i per compaction of level i). */
  case class KLBuf(levels: Seq[Seq[Double]], n: Long, err: Long)

  /** Mergeable quantile sketch in the KLL family (Karnin, Lang, Liberty,
    * FOCS'16) with DETERMINISTIC compaction: a full level is sorted and the
    * lower element of each consecutive pair is promoted at doubled weight
    * (the classic randomized coin-flip is replaced by "keep even ranks" so
    * results are reproducible given an input order). Each compaction of
    * level i moves any value's weighted rank by at most 2^i — consecutive
    * sorted pairs are disjoint, so one query point straddles at most one
    * pair — and `err` accumulates exactly that bound. An odd element count
    * leaves the maximum behind unpaired, so total weight always equals `n`.
    *
    * Invariant carried to the `agg_kll` gate: for every value v,
    * |sketch_rank(v) − true_rank(v)| ≤ err, regardless of partitioning or
    * merge order (partials merge level-wise then re-compact — the standard
    * mergeable-summaries shape, one tiny buffer per partition, two-phase
    * aggregate at any scale; state is K·log(n/K) doubles, never the data). */
  object KllSketch extends Aggregator[Double, KLBuf, KLBuf] {
    val K = 128

    def zero: KLBuf = KLBuf(Seq(Vector.empty), 0L, 0L)

    private def compact(levels0: Seq[Seq[Double]], err0: Long): (Seq[Seq[Double]], Long) = {
      val ls = scala.collection.mutable.ArrayBuffer[Vector[Double]](
        levels0.map(_.toVector): _*)
      var err = err0
      var i = 0
      while (i < ls.length) {
        if (ls(i).size > K) {
          val sorted = ls(i).sorted
          val evenCount = sorted.size - (sorted.size % 2)
          val promoted = (0 until evenCount by 2).map(sorted(_)).toVector
          ls(i) = if (sorted.size % 2 == 1) Vector(sorted.last) else Vector.empty
          if (i + 1 >= ls.length) ls += Vector.empty
          ls(i + 1) = ls(i + 1) ++ promoted
          err += 1L << i
        }
        i += 1
      }
      (ls.toSeq, err)
    }

    def reduce(b: KLBuf, v: Double): KLBuf = {
      val l0 = b.levels.head :+ v
      val levels = l0 +: b.levels.tail
      if (l0.size > K) {
        val (ls, e) = compact(levels, b.err)
        KLBuf(ls, b.n + 1, e)
      } else KLBuf(levels, b.n + 1, b.err)
    }

    def merge(a: KLBuf, b: KLBuf): KLBuf = {
      val depth = a.levels.size max b.levels.size
      val joined = (0 until depth).map { i =>
        a.levels.applyOrElse(i, (_: Int) => Seq.empty[Double]) ++
          b.levels.applyOrElse(i, (_: Int) => Seq.empty[Double])
      }
      val (ls, e) = compact(joined, a.err + b.err)
      KLBuf(ls, a.n + b.n, e)
    }

    def finish(b: KLBuf): KLBuf = b
    def bufferEncoder: Encoder[KLBuf] = Encoders.product[KLBuf]
    def outputEncoder: Encoder[KLBuf] = Encoders.product[KLBuf]
  }

  /** Smallest sketch item whose cumulative weight reaches rank target `t`
    * — the quantile-extraction half of [[KllSketch]] (driver/plan side; the
    * sketch is a single tiny row by the time this runs). */
  def kllValueAtRank(levels: Seq[Seq[Double]], t: Long): Double = {
    val items = levels.zipWithIndex
      .flatMap { case (lvl, i) => lvl.map(v => (v, 1L << i)) }
      .sortBy(_._1)
    var cum = 0L
    var j = 0
    while (j < items.length) {
      cum += items(j)._2
      if (cum >= t) return items(j)._1
      j += 1
    }
    if (items.isEmpty) Double.NaN else items.last._1
  }

  /** Register all graft UDFs/UDAFs into the session (SQL-callable). */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("graft_sum_squares", org.apache.spark.sql.functions.udaf(SumSquares))
    spark.udf.register("graft_tax", (p: Double) => p * 1.1)
    spark.udf.register("graft_wpercentile", org.apache.spark.sql.functions.udaf(WeightedPercentile))
    spark.udf.register("graft_heavy_hitters", org.apache.spark.sql.functions.udaf(MisraGries))
    spark.udf.register("graft_kll", org.apache.spark.sql.functions.udaf(KllSketch))
  }
}
