package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-frame extensions Spark lacks natively.
  *
  * GROUPS frames (reference: WindowFrameUnits GROUPS, datafusion.proto:
  * 651-676) count frame bounds in *peer groups* (distinct ORDER BY values)
  * rather than rows or value ranges. Spark supports only ROWS and RANGE —
  * but a GROUPS frame over `o` is exactly a RANGE frame over
  * `dense_rank() ORDER BY o`, because dense_rank is the 1-based index of
  * the peer group and RANGE on an integer key with offset n spans n
  * adjacent groups. Two window passes over the same partitioning = one
  * shuffle (Spark reuses the sort), so this scales like any window. */
object Windows {

  /** Add `outName` = agg over a GROUPS BETWEEN nPreceding PRECEDING AND
    * nFollowing FOLLOWING frame, partitioned by `part`, ordered by `order`. */
  def withGroupsFrame(df: DataFrame, part: Seq[Column], order: Column,
                      nPreceding: Long, nFollowing: Long,
                      agg: Column, outName: String): DataFrame = {
    val rankCol = "_groups_frame_rank"
    val w = Window.partitionBy(part: _*).orderBy(order)
    val framed = Window.partitionBy(part: _*).orderBy(col(rankCol))
      .rangeBetween(-nPreceding, nFollowing)
    df.withColumn(rankCol, dense_rank().over(w))
      .withColumn(outName, agg.over(framed))
      .drop(rankCol)
  }
}
