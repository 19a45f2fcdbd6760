package graft

import graft.operators.TimeJoins
import org.apache.spark.sql.functions._

/** Randomized differentials for the time-join formulations.
  *
  * Each operator re-expresses an inequality join as a keyed shuffle (union
  * + carry-forward for as-of, bin replication for range/overlap); the
  * existing specs compare curated fixtures. Here random corpora vary the
  * boundary structure — equal timestamps across sides, intervals ending
  * exactly on bin edges, spans covering many bins — and the reference is
  * the naive inequality join (tiny inputs, so the nested-loop plan the
  * formulations exist to avoid is affordable as an oracle).
  */
class TimeJoinLawsSpec extends SparkSpec {

  test("asof join equals the naive latest-at-or-before lookup on random series") {
    for (seed <- Seq(3L, 99L, 2026L)) {
      val rng = new scala.util.Random(seed)
      // right rows get UNIQUE (key, time) so "latest at-or-before" is
      // well-defined on both sides; left times deliberately collide with
      // right times (the <= boundary is the bug surface)
      val rightRows = rng.shuffle((0 until 6).flatMap(k =>
          (0 until 50).map(t => (k, t)))).take(80)
        .map { case (k, t) => (k, t.toLong, rng.nextInt(1000)) }
      val leftRows = (0 until 150).map(i =>
        (i.toLong, rng.nextInt(6), rng.nextInt(52).toLong))
      val right = spark.createDataFrame(rightRows).toDF("k", "qt", "px")
      val left = spark.createDataFrame(leftRows).toDF("trade_id", "k", "tt")
        .repartition(1 + rng.nextInt(8))

      val got = TimeJoins.asofJoin(left, right, "k", "tt", "qt", Seq("px"))
        .select(col("trade_id"), col("asof_px"))
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1))))
        .toMap

      val want = leftRows.map { case (id, k, tt) =>
        val best = rightRows.filter(r => r._1 == k && r._2 <= tt)
        id -> (if (best.isEmpty) None else Some(best.maxBy(_._2)._3))
      }.toMap

      assert(got == want, s"seed=$seed: " +
        (got.keySet ++ want.keySet).filter(id => got.get(id) != want.get(id)).take(5)
          .map(id => s"trade $id got ${got.get(id)} want ${want.get(id)}").mkString("; "))
    }
  }

  test("binned range join equals the naive inequality join on random intervals") {
    for (seed <- Seq(11L, 500L)) {
      val rng = new scala.util.Random(seed)
      val binW = 8L
      // interval bounds biased onto bin edges (multiples of 8) half the time
      def t(): Long = if (rng.nextBoolean()) rng.nextInt(12) * binW else rng.nextInt(96).toLong
      val ivRows = (0 until 60).map { i =>
        val a = t(); val b = t()
        (i.toLong, math.min(a, b), math.max(a, b))
      }
      val ptRows = (0 until 120).map(i => (i.toLong + 1000, t()))
      val ivs = spark.createDataFrame(ivRows).toDF("iid", "s", "e")
      val pts = spark.createDataFrame(ptRows).toDF("pid", "t")
        .repartition(1 + rng.nextInt(8))

      val got = TimeJoins.rangeJoinBinned(pts, ivs, "t", "s", "e", binW)
        .select(col("pid"), col("iid")).collect().map(r => (r.getLong(0), r.getLong(1)))
      val want = for {
        (pid, pt) <- ptRows
        (iid, s, e) <- ivRows if pt >= s && pt <= e
      } yield (pid, iid)

      assert(got.length == want.length, s"seed=$seed: duplicate or lost rows")
      assert(got.toSet == want.toSet, s"seed=$seed: pair sets differ")
    }
  }

  test("binned overlap join equals the naive overlap join, exactly once per pair") {
    for (seed <- Seq(21L, 760L)) {
      val rng = new scala.util.Random(seed)
      val binW = 8L
      def iv(): (Long, Long) = {
        val a = if (rng.nextBoolean()) rng.nextInt(12) * binW else rng.nextInt(96).toLong
        val span = rng.nextInt(30).toLong // frequently spans several bins
        (a, a + span)
      }
      val lRows = (0 until 50).map { i => val (s, e) = iv(); (i.toLong, rng.nextInt(3), s, e) }
      val rRows = (0 until 50).map { i => val (s, e) = iv(); (i.toLong + 500, rng.nextInt(3), s, e) }
      val l = spark.createDataFrame(lRows).toDF("lid", "key", "ls", "le")
      val r = spark.createDataFrame(rRows).toDF("rid", "key", "rs", "re")
        .repartition(1 + rng.nextInt(8))

      val got = TimeJoins.overlapJoinBinned(l, r, Seq("key"), "ls", "le", "rs", "re", binW)
        .select(col("lid"), col("rid")).collect().map(row => (row.getLong(0), row.getLong(1)))
      val want = for {
        (lid, k1, ls, le) <- lRows
        (rid, k2, rs, re) <- rRows if k1 == k2 && ls <= re && rs <= le
      } yield (lid, rid)

      assert(got.length == want.length,
        s"seed=$seed: ${got.length} rows vs ${want.length} — multi-bin pair deduped wrong")
      assert(got.toSet == want.toSet, s"seed=$seed: pair sets differ")
    }
  }
}
