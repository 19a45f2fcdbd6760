package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Time-series joins Spark lacks as built-ins, formulated for scale.
  *
  * (Absent from the reference's serializable surface — SURVEY §2.3 — these
  * back the event-pipeline operators; both reduce to keyed shuffles, never
  * a nested-loop join.)
  */
object TimeJoins {

  /** Backward as-of join: for each left row, attach the payload of the
    * latest right row with `rightTime <= leftTime` for the same key (LEFT
    * semantics — unmatched left rows keep nulls).
    *
    * Formulation: tag sides, union, and carry the last non-null payload
    * forward with a window ordered by (time, side) — right rows sort
    * before left rows at equal timestamps, so equality matches. One
    * shuffle on the key; no join node at all, so there is nothing to
    * degenerate into a nested loop at scale.
    *
    * Both time columns must be long-comparable (cast to long internally).
    * `payload` columns are emitted as `asof_<name>`. Left and right may
    * share column names (the right side is pre-projected to key + time +
    * payload). */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               payload: Seq[String]): DataFrame = {
    val rNorm = right.select(
      (col(key) +: col(rightTime).cast(LongType).as("_t") +:
        payload.map(c => col(c).as(s"asof_$c"))): _*)
      .withColumn("_side", lit(0))
    val lNorm0 = left
      .withColumn("_t", col(leftTime).cast(LongType))
      .withColumn("_side", lit(1))
    val lNorm = payload.foldLeft(lNorm0) { (df, c) =>
      df.withColumn(s"asof_$c", lit(null).cast(rNorm.schema(s"asof_$c").dataType))
    }
    // align right to left's full column list (left-only columns as nulls)
    val rAligned = lNorm.columns.foldLeft(rNorm) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(lNorm.schema(c).dataType))
    }.select(lNorm.columns.map(col): _*)

    val w = Window.partitionBy(col(key)).orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(lNorm.unionByName(rAligned)) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"asof_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("_side") === 1).drop("_t", "_side")
  }

  /** Point-in-interval range join via fixed-width binning: every interval
    * registers in each bin it overlaps (explode), every point probes its
    * single bin, and the equi-join on the bin is verified with the exact
    * range predicate. Turns Spark's nested-loop fallback for inequality
    * joins into a keyed shuffle — bin width trades replication factor
    * (interval_span / width) against bucket size. No duplicates: a point
    * lives in exactly one bin. */
  def rangeJoinBinned(points: DataFrame, intervals: DataFrame,
                      pointCol: String, startCol: String, endCol: String,
                      binWidth: Long): DataFrame = {
    val p = points.withColumn("_bin",
      (col(pointCol).cast(LongType) / binWidth).cast(LongType))
    val iv = intervals.withColumn("_bin",
      explode(sequence((col(startCol).cast(LongType) / binWidth).cast(LongType),
        (col(endCol).cast(LongType) / binWidth).cast(LongType))))
    p.join(iv, Seq("_bin"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("_bin")
  }

  /** Interval-OVERLAP join via the same fixed-width binning: both interval
    * sets register in every bin they span (explode), the equi-join runs on
    * (keys, bin), and the exact overlap predicate
    * `lStart <= rEnd && rStart <= lEnd` verifies candidates. A pair spanning
    * several shared bins would surface once per bin, so only the FIRST
    * overlapping bin — the bin of `greatest(lStart, rStart)` — reports it:
    * duplicate elimination by arithmetic, not a `distinct` shuffle.
    * Replaces the nested-loop plan Spark falls back to for
    * inequality-only joins with a keyed shuffle whose replication factor is
    * span/binWidth per side. Caller pre-projects non-key column names to be
    * disjoint. */
  def overlapJoinBinned(left: DataFrame, right: DataFrame, keys: Seq[String],
                        lStart: String, lEnd: String,
                        rStart: String, rEnd: String,
                        binWidth: Long): DataFrame = {
    def binned(df: DataFrame, s: String, e: String): DataFrame =
      df.withColumn("_bin",
        explode(sequence((col(s).cast(LongType) / binWidth).cast(LongType),
          (col(e).cast(LongType) / binWidth).cast(LongType))))
    binned(left, lStart, lEnd)
      .join(binned(right, rStart, rEnd), keys :+ "_bin")
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter((greatest(col(lStart), col(rStart)).cast(LongType) / binWidth)
        .cast(LongType) === col("_bin"))
      .drop("_bin")
  }
}
