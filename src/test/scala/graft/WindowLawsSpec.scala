package graft

import graft.operators.Windows
import org.apache.spark.sql.functions._

/** Randomized law for the GROUPS-frame rewrite (dense_rank → integer
  * RANGE). The gated query exercises one frame shape (2 PRECEDING ..
  * CURRENT ROW) against an independent oracle; here the frame bounds vary —
  * including FOLLOWING > 0, which no gate covers — over tie-heavy random
  * data, compared with a direct transcription of the SQL-standard GROUPS
  * definition (peer groups of the ORDER BY value; the frame spans whole
  * adjacent groups; every row of a peer group shares the same frame).
  */
class WindowLawsSpec extends SparkSpec {

  test("GROUPS frame rewrite equals the standard's definition for varied bounds") {
    for ((seed, nPrec, nFoll) <- Seq((1L, 2L, 0L), (2L, 0L, 2L), (3L, 1L, 3L), (4L, 5L, 5L))) {
      val rng = new scala.util.Random(seed)
      // few distinct order values -> heavy ties -> real peer groups
      val rows = (0 until 300).map(i =>
        (i.toLong, rng.nextInt(4), rng.nextInt(10), rng.nextInt(100).toLong))
      val df = spark.createDataFrame(rows).toDF("id", "part", "o", "v")
        .repartition(1 + rng.nextInt(8))
      val got = Windows.withGroupsFrame(df,
          part = Seq(col("part")), order = col("o"),
          nPreceding = nPrec, nFollowing = nFoll,
          agg = sum(col("v")), outName = "s")
        .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap

      // direct GROUPS semantics: distinct o values per partition, sorted;
      // a row in peer group g sums groups [g-nPrec, g+nFoll]
      val want = rows.groupBy(_._2).flatMap { case (_, part) =>
        val groups = part.map(_._3).distinct.sorted
        val gIdx = groups.zipWithIndex.toMap
        val sumByGroup = part.groupBy(_._3).view.mapValues(_.map(_._4).sum).toMap
        part.map { case (id, _, o, _) =>
          val g = gIdx(o)
          val lo = math.max(0L, g - nPrec).toInt
          val hi = math.min(groups.size - 1L, g + nFoll).toInt
          id -> (lo to hi).map(i => sumByGroup(groups(i))).sum
        }
      }
      assert(got == want, s"seed=$seed frame=($nPrec,$nFoll): " +
        (got.keySet ++ want.keySet).filter(k => got.get(k) != want.get(k)).take(5)
          .map(k => s"row $k got ${got.get(k)} want ${want.get(k)}").mkString("; "))
    }
  }
}
