package graft

import graft.queries.Evaluation
import org.apache.spark.sql.functions._

/** Randomized differentials for the eval tier's statistics. These queries
  * are oracle-REPLAYED (DuckDB runs the same formula), so a wrong formula
  * would pass the gate on both sides — the laws here compare against
  * independent textbook definitions instead: AUC as brute-force
  * concordant/tied pair counting (Mann–Whitney's definition, not the
  * rank-sum identity the engine uses), KS as a sequential exact-rational
  * ECDF sup, and Kaplan–Meier as a direct sequential product transcription.
  * Degenerate corpora (one class only, one cohort only) pin the NULL
  * contract — before round 10 a single-class slice killed the job with
  * ANSI DIVIDE_BY_ZERO, the same failure class as round 9's zero-norm
  * embeddings.
  */
class EvalLawsSpec extends SparkSpec {

  /** Spark round(x, 9) transcription (BigDecimal over Double.toString,
    * HALF_UP) — the law-arithmetic recipe from the verify skill. */
  private def round9(x: Double): Double =
    new java.math.BigDecimal(java.lang.Double.toString(x))
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()

  test("AUC equals brute-force concordant/tied pair counting; single-class is NULL, not a crash") {
    import spark.implicits._
    for (seed <- Seq(19L, 83L, 20260815L)) {
      val rng = new scala.util.Random(seed)
      val n = 50 + rng.nextInt(250)
      // tiny score domain: massive tie mass, the regime where the
      // tie-corrected term actually matters
      val rows = (0 until n).map(_ => (rng.nextInt(7).toLong, rng.nextInt(3) == 0))
      val pos = rows.collect { case (s, true) => s }
      val neg = rows.collect { case (s, false) => s }
      val conc = pos.map(p => neg.count(_ < p).toLong).sum
      val ties = pos.map(p => neg.count(_ == p).toLong).sum
      val u2 = 2L * conc + ties
      val wantAuc = u2.toDouble / (2.0 * pos.size.toDouble * neg.size.toDouble)

      val r = Evaluation.aucCore(rows.toDF("sc", "pos").repartition(5)).collect().head
      assert(r.getLong(0) == pos.size && r.getLong(1) == neg.size)
      assert(r.getDouble(2) == wantAuc, // same IEEE op tree ⇒ exact
        s"seed=$seed: got ${r.getDouble(2)} want $wantAuc (P=${pos.size} N=${neg.size})")
    }
    // degenerate: every row one class — NULL auc, counts intact, job alive
    val one = (0 until 40).map(i => (i.toLong % 5, true))
    val r = Evaluation.aucCore(one.toDF("sc", "pos")).collect().head
    assert(r.getLong(0) == 40 && r.getLong(1) == 0 && r.isNullAt(2))
  }

  test("KS equals the sequential exact-rational ECDF sup; single-cohort is NULL, not a crash") {
    import spark.implicits._
    for (seed <- Seq(29L, 101L)) {
      val rng = new scala.util.Random(seed)
      val n = 80 + rng.nextInt(300)
      val rows = (0 until n).map(_ => (rng.nextInt(12).toLong, rng.nextBoolean()))
      val na = rows.count(_._2).toLong
      val nb = n - na
      // sequential reference: integer cross-multiplied ECDF gap per distinct
      // value, sup + smallest attaining value
      val byV = rows.groupBy(_._1).toSeq.sortBy(_._1)
      var ca = 0L; var cb = 0L
      var md = BigInt(-1); var at = Long.MinValue
      for ((v, xs) <- byV) {
        ca += xs.count(_._2); cb += xs.count(!_._2)
        val diff = (BigInt(ca) * nb - BigInt(cb) * na).abs
        if (diff > md) { md = diff; at = v }
      }
      val wantKs = md.toDouble / (na.toDouble * nb.toDouble)

      val r = Evaluation.ksCore(rows.toDF("v", "in_a").repartition(4)).collect().head
      assert(r.getLong(0) == na && r.getLong(1) == nb)
      assert(r.getLong(2) == at, s"seed=$seed: ks_at ${r.getLong(2)} want $at")
      assert(r.getDouble(3) == wantKs, s"seed=$seed: ks ${r.getDouble(3)} want $wantKs")
    }
    // degenerate: one cohort only — NULL ks and ks_at, counts intact
    val one = (0 until 30).map(i => (i.toLong % 6, true))
    val r = Evaluation.ksCore(one.toDF("v", "in_a")).collect().head
    assert(r.getLong(0) == 30 && r.getLong(1) == 0 && r.isNullAt(2) && r.isNullAt(3))
  }

  test("Kaplan-Meier log-survival equals the sequential transcription incl. the fixed-point log") {
    import spark.implicits._
    for (seed <- Seq(37L, 211L)) {
      val rng = new scala.util.Random(seed)
      val n = 60 + rng.nextInt(200)
      // random lifetimes over a small timepoint domain (heavy ties), random
      // censoring; planted shapes: an all-censored timepoint (contributes
      // zero log mass, no output row) and a terminal all-event timepoint
      // (n = d: excluded from BOTH the cumulative sum and the output)
      val base = (0 until n).map(_ => (rng.nextInt(10).toLong, rng.nextInt(3).min(1).toLong))
      val life = base ++ Seq((11L, 0L), (11L, 0L), (99L, 1L), (99L, 1L))

      // sequential KM over distinct t ascending
      val byT = life.groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (t, xs) => (t, xs.map(_._2).sum, xs.size.toLong - xs.map(_._2).sum) }
      var atRisk = life.size.toLong
      var cum = 0L
      val want = Seq.newBuilder[(Long, Long, Long, Double)]
      for ((t, d, c) <- byT) {
        val nr = atRisk
        if (nr > d) {
          val l = math.floor(round9(math.log((nr - d).toDouble / nr.toDouble)) * 1e9 + 0.5).toLong
          cum += l
          if (d > 0) want += ((t, nr, d, cum.toDouble / 1e9))
        }
        atRisk -= (d + c)
      }

      val got = Evaluation.survivalCore(life.toDF("t", "ev").repartition(4))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
      assert(got == want.result(), s"seed=$seed: got $got want ${want.result()}")
      // teeth: the terminal n = d timepoint must be absent
      assert(!got.exists(_._1 == 99L), "terminal n=d timepoint leaked into the output")
    }
  }

  test("Kish ESS equals the direct formula; an all-zero-weight stratum is NULL, not a crash") {
    import spark.implicits._
    val rng = new scala.util.Random(47)
    val rows = (0 until 300).map(_ => (s"s${rng.nextInt(4)}", rng.nextInt(50).toLong)) ++
      (0 until 20).map(_ => ("dead", 0L)) // the all-empty-document source
    val got = Evaluation.essCore(rows.toDF("source", "w").repartition(5))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1),
         if (r.isNullAt(2)) None else Some(r.getDouble(2)),
         if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    val want = rows.groupBy(_._1).map { case (src, xs) =>
      val n = xs.size.toLong
      val sw = xs.map(x => BigInt(x._2)).sum
      val sw2 = xs.map(x => BigInt(x._2) * BigInt(x._2)).sum
      val ess = if (sw2 > 0) Some((sw * sw).toDouble / sw2.toDouble) else None
      src -> (n, ess, ess.map(_ / n.toDouble))
    }
    assert(got == want, s"got $got\nwant $want")
    assert(got("dead")._2.isEmpty, "all-zero-weight stratum must be NULL")
  }

  test("reciprocity equals brute-force reverse-pair counting; empty edge set is NULL") {
    import spark.implicits._
    for (seed <- Seq(53L, 167L)) {
      val rng = new scala.util.Random(seed)
      val edges = (0 until 200).map(_ => (rng.nextInt(20).toLong, rng.nextInt(20).toLong))
        .filter(e => e._1 != e._2).distinct
      val set = edges.toSet
      val nRecip = edges.count(e => set.contains((e._2, e._1))).toLong
      val r = Evaluation.recipCore(edges.toDF("src", "dst").repartition(4)).collect().head
      assert(r.getLong(0) == edges.size && r.getLong(1) == nRecip)
      assert(r.getDouble(2) == nRecip.toDouble / edges.size.toDouble, s"seed=$seed")
    }
    val r = Evaluation.recipCore(Seq.empty[(Long, Long)].toDF("src", "dst")).collect().head
    assert(r.getLong(0) == 0L && r.isNullAt(2), "empty edge set must yield NULL reciprocity")
  }

  test("PR threshold sweep equals brute-force confusion counting; empty denominators are NULL") {
    import spark.implicits._
    val rng = new scala.util.Random(61)
    val rows = (0 until 400).map(_ => (rng.nextInt(600).toLong, rng.nextInt(4) == 0))
    // 700 exceeds every score: tp+fp = 0 there — precision must be NULL
    val thresholds = Seq(50L, 200L, 450L, 700L)
    val got = Evaluation.prCore(rows.toDF("sc", "pos").repartition(5), thresholds)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
         if (r.isNullAt(4)) None else Some(r.getDouble(4)),
         if (r.isNullAt(5)) None else Some(r.getDouble(5)),
         if (r.isNullAt(6)) None else Some(r.getDouble(6)))).toMap
    val want = thresholds.map { t =>
      val tp = rows.count(x => x._2 && x._1 >= t).toLong
      val fp = rows.count(x => !x._2 && x._1 >= t).toLong
      val fn = rows.count(x => x._2 && x._1 < t).toLong
      def ratio(num: Long, den: Long) = if (den > 0) Some(num.toDouble / den.toDouble) else None
      t -> (tp, fp, fn, ratio(tp, tp + fp), ratio(tp, tp + fn), ratio(2 * tp, 2 * tp + fp + fn))
    }.toMap
    assert(got == want, s"got $got\nwant $want")
    assert(got(700L)._4.isEmpty, "threshold above every score must yield NULL precision")
    // all-negative corpus: no actual positives anywhere — recall is NULL
    val neg = (0 until 50).map(i => (i.toLong, false))
    val r = Evaluation.prCore(neg.toDF("sc", "pos"), Seq(10L)).collect().head
    assert(r.isNullAt(5), "recall over zero actual positives must be NULL")
  }

  test("Zipf regression equals the sequential fixed-point reference; zero-variance corpora are NULL") {
    import spark.implicits._
    def fix9(v: Double): Long = math.floor(round9(math.log(v)) * 1e9 + 0.5).toLong
    for (seed <- Seq(71L, 311L)) {
      val rng = new scala.util.Random(seed)
      // Zipf-ish skew: token i appears ~ N/(i+1) times
      val words = (0 until 20).map(i => s"w$i")
      val toks = words.zipWithIndex.flatMap { case (w, i) =>
        Seq.fill(1 + (60 / (i + 1)) + rng.nextInt(3))(w)
      }
      val counts = toks.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      val ranked = counts.sortBy { case (w, c) => (-c, w) }.zipWithIndex
        .map { case ((_, c), i) => (fix9((i + 1).toDouble), fix9(c.toDouble)) }
      val nv = BigInt(ranked.size)
      val sx = ranked.map(x => BigInt(x._1)).sum
      val sy = ranked.map(x => BigInt(x._2)).sum
      val sxx = ranked.map(x => BigInt(x._1) * BigInt(x._1)).sum
      val syy = ranked.map(x => BigInt(x._2) * BigInt(x._2)).sum
      val sxy = ranked.map(x => BigInt(x._1) * BigInt(x._2)).sum
      val num = (nv * sxy - sx * sy).toDouble
      val denX = (nv * sxx - sx * sx).toDouble
      val denY = (nv * syy - sy * sy).toDouble
      val r = Evaluation.zipfCore(toks.toDF("tok").repartition(4)).collect().head
      assert(r.getLong(0) == ranked.size)
      assert(r.getDouble(1) == num / denX, s"seed=$seed slope")
      assert(r.getDouble(2) == num / denX * num / denY, s"seed=$seed r2")
    }
    // single-token vocabulary: x has no variance — slope AND r2 NULL
    val single = Evaluation.zipfCore(Seq.fill(9)("only").toDF("tok")).collect().head
    assert(single.getLong(0) == 1L && single.isNullAt(1) && single.isNullAt(2))
    // perfectly uniform counts (every token once — the post-dedup hapax
    // shape): y has no variance — slope is an exact 0, r2 NULL
    val uniform = Evaluation.zipfCore((1 to 12).map(i => s"u$i").toDF("tok")).collect().head
    assert(uniform.getDouble(1) == 0.0 && uniform.isNullAt(2))
  }
}
