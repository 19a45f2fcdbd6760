package graft

import graft.operators.TopK
import org.apache.spark.sql.functions._

/** Randomized differential test of the custom bounded-heap TopKPerKey
  * physical operator against the window-rank formulation it replaces.
  *
  * The operator is the riskiest custom code in the engine — a hand-written
  * SparkPlan with its own partial/final phases, heap ordering, and keyed
  * exchange — and its existing specs pin fixed fixtures. Here the data,
  * tie structure, k, sort directions, and input partitioning all vary per
  * seeded case; the window reference (`row_number` over the same order)
  * is independent machinery end to end. The trailing unique-id sort column
  * makes both sides deterministic, so results must match as exact row
  * sets — any heap-comparator inversion, partial-phase overflow, or
  * per-partition boundary bug shows up as a set difference.
  */
class TopKLawsSpec extends SparkSpec {

  test("random corpora: heap top-k equals the window-rank reference under any partitioning") {
    import org.apache.spark.sql.expressions.Window
    for (seed <- Seq(8L, 4711L, 20260815L)) {
      val rng = new scala.util.Random(seed)
      val n = 500 + rng.nextInt(1500)
      // few keys (every group well over k) and a tiny score domain (ties
      // everywhere — the case that punishes comparator/tiebreak bugs)
      val rows = (0 until n).map(i => (rng.nextInt(8), rng.nextInt(20), i.toLong))
      val df = spark.createDataFrame(rows).toDF("key", "score", "id")
        .repartition(1 + rng.nextInt(12))
      val k = 1 + rng.nextInt(7)
      val scoreAsc = rng.nextBoolean()

      val got = TopK.perKey(df, Seq("key"), Seq("score" -> scoreAsc, "id" -> true), k)
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet

      val order = Seq(if (scoreAsc) col("score").asc else col("score").desc, col("id").asc)
      val want = df.withColumn("rk",
          row_number().over(Window.partitionBy(col("key")).orderBy(order: _*)))
        .filter(col("rk") <= k).drop("rk")
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet

      assert(got == want,
        s"seed=$seed k=$k scoreAsc=$scoreAsc: heap-only ${got.diff(want).take(5)}, window-only ${want.diff(got).take(5)}")
      // and the group-size contract: exactly min(k, |group|) rows per key
      val sizes = got.groupBy(_._1).view.mapValues(_.size)
      val groupN = rows.groupBy(_._1).view.mapValues(_.size)
      assert(sizes.forall { case (key, s) => s == math.min(k, groupN(key)) })
    }
  }
}
