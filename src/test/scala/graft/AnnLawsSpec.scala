package graft

import graft.operators.Similarity
import org.apache.spark.sql.DataFrame

/** Randomized differentials for the ANN tier — the operators whose scale
  * story rests on an INDEX lemma (IVF cell pruning, PQ code reconstruction)
  * rather than on a pair-pruning bound. The DuckDB oracle replays the same
  * cell/codebook construction, so it cannot catch a bug in the lemma
  * itself; these laws compare against independent in-test references:
  *
  *  - full-probe IVF ≡ exhaustive search: probing every cell must return
  *    exactly the brute-force top-k (the index only PARTITIONS the corpus —
  *    a row lost or double-counted by assignment breaks this first);
  *  - partial-probe IVF ≡ a direct transcription of the probe contract
  *    (top-nProbe cells by centroid cosine, exhaustive within probed cells);
  *  - kNN-graph at one cell ≡ the brute-force graph over distinct
  *    positive-norm vectors (exercising the collapse tier's claim);
  *  - PQ on a corpus whose vectors are exact copies of the codewords must
  *    reconstruct with zero error, making ADC the EXACT distance — so
  *    ivfPqTopK must equal the true-distance top-k within the probed cell.
  *
  * Corpora plant the adversarial shapes: exact duplicate vectors (collapse
  * tier), zero-norm vectors (the normsPositive contract — planting them
  * caught ivfTopK/bruteForceTopK/hardNegatives crashing with ANSI
  * DIVIDE_BY_ZERO on one degenerate embedding), score ties.
  * Arithmetic in the references transcribes the engine's contracts exactly:
  * float→double products summed left to right (VecDot), Spark round
  * semantics (HALF_UP on the decimal string, NaN/∞ pass through), NaN
  * ordered above every double (java.lang.Double.compare — Spark's order).
  */
class AnnLawsSpec extends SparkSpec {

  private type Vec = Array[Float]

  // ---- engine-contract transcriptions ---------------------------------------

  private def dot(a: Vec, b: Vec): Double = {
    val n = math.min(a.length, b.length)
    var s = 0.0; var i = 0
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }
  private def nrm(a: Vec): Double = math.sqrt(dot(a, a))

  /** Spark `round(x, 6)`: HALF_UP over the canonical decimal string; NaN
    * and infinities pass through untouched. */
  private def round6(x: Double): Double =
    if (x.isNaN || x.isInfinite) x
    else new java.math.BigDecimal(java.lang.Double.toString(x))
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Spark's total order on doubles: NaN greatest (Double.compare). */
  private val sparkDouble: Ordering[Double] =
    (a: Double, b: Double) => java.lang.Double.compare(a, b)

  /** Cell scores per the nearestCells contract: NULL (None) when the norm
    * product is not positive, else round6 cosine; cells ranked score-desc
    * NULLS LAST with cell_id tie-break; top `keep` kept. */
  private def nearestCells(v: Vec, cents: Seq[(Long, Vec)], keep: Int): Seq[Long] =
    cents.map { case (cid, c) =>
      val p = nrm(v) * nrm(c)
      (cid, if (p > 0) Some(round6(dot(v, c) / p)) else None)
    }.sortBy { case (cid, s) => (s.isEmpty, s.map(-_).getOrElse(0.0), cid) }(
      Ordering.Tuple3(Ordering.Boolean, sparkDouble, Ordering.Long))
      .take(keep).map(_._1)

  /** Per-query exhaustive top-k over `candidates`: round6 cosine under the
    * tier-wide normsPositive contract (zero-norm vectors pair with nothing,
    * on either side), ordered (score desc, corpus_id asc), first k. */
  private def topK(q: (Long, Vec), candidates: Seq[(Long, Vec)], k: Int): Seq[(Long, Long, Double, Int)] = {
    val (qid, qv) = q
    if (!(nrm(qv) > 0)) return Seq.empty
    candidates.filter { case (cid, cv) => cid != qid && nrm(cv) > 0 }
      .map { case (cid, cv) => (cid, round6(dot(qv, cv) / (nrm(qv) * nrm(cv)))) }
      .sortBy { case (cid, s) => (s, cid) }(
        Ordering.Tuple2(sparkDouble.reverse, Ordering.Long))
      .take(k).zipWithIndex
      .map { case ((cid, s), i) => (qid, cid, s, i + 1) }
  }

  // ---- corpora ---------------------------------------------------------------

  /** Random corpus with planted exact duplicates and zero-norm vectors. */
  private def corpus(seed: Long, n: Int, dim: Int): Seq[(Long, Vec)] = {
    val rng = new scala.util.Random(seed)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Vec)]
    var id = 0L
    while (id < n) {
      val v: Vec =
        // ids 5 and 7 are ALWAYS zero-norm: 5 lands in both tests' query
        // samples (5%5==0, 5%4==1) and 7 is corpus-only, so every run
        // exercises the normsPositive guard on both sides of the join
        if (id == 5 || id == 7) Array.fill(dim)(0f)
        else if (id > 2 && rng.nextInt(5) == 0) out(rng.nextInt(id.toInt))._2 // exact copy
        else if (rng.nextInt(12) == 0) Array.fill(dim)(0f)                    // zero norm
        else Array.fill(dim)((rng.nextInt(41) - 20).toFloat / 4f)
      out += ((id, v)); id += 1
    }
    out.toSeq
  }

  private def toDf(rows: Seq[(Long, Vec)]): DataFrame = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  private def collectTopK(df: DataFrame): Set[(Long, Long, Double, Int)] =
    df.select("query_id", "corpus_id", "score", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet

  // ---- laws ------------------------------------------------------------------

  test("IVF with every cell probed equals brute force equals the exhaustive reference") {
    for (seed <- Seq(11L, 97L, 251L)) {
      val rows = corpus(seed, n = 36, dim = 8)
      val queries = rows.filter(_._1 % 5 == 0)
      val (c, q) = (toDf(rows), toDf(queries))
      val k = 4; val nCells = 4
      val ivf = collectTopK(Similarity.ivfTopK(q, c, nCells = nCells, nProbe = nCells, k = k))
      val bf = collectTopK(Similarity.bruteForceTopK(q, c, k))
      val ref = queries.flatMap(topK(_, rows, k)).toSet
      assert(bf == ref, s"seed=$seed: bruteForceTopK diverges from the exhaustive reference: " +
        s"missing ${(ref -- bf).take(5)}, spurious ${(bf -- ref).take(5)}")
      assert(ivf == ref, s"seed=$seed: full-probe IVF must equal exhaustive search: " +
        s"missing ${(ref -- ivf).take(5)}, spurious ${(ivf -- ref).take(5)}")
    }
  }

  test("partial-probe IVF equals the probe contract's direct transcription") {
    for (seed <- Seq(23L, 61L)) {
      val rows = corpus(seed, n = 36, dim = 8)
      val queries = rows.filter(_._1 % 4 == 1)
      val k = 3; val nCells = 4; val nProbe = 2
      val cents = rows.filter(_._1 < nCells).map { case (id, v) => (id, v) }
      val cellOf = rows.map { case (id, v) => id -> nearestCells(v, cents, 1).head }.toMap
      val ref = queries.flatMap { case (qid, qv) =>
        val probed = nearestCells(qv, cents, nProbe).toSet
        topK((qid, qv), rows.filter(r => probed.contains(cellOf(r._1))), k)
      }.toSet
      val got = collectTopK(Similarity.ivfTopK(toDf(queries), toDf(rows),
        nCells = nCells, nProbe = nProbe, k = k))
      assert(got == ref, s"seed=$seed: missing ${(ref -- got).take(5)}, " +
        s"spurious ${(got -- ref).take(5)}")
    }
  }

  test("kNN graph at one cell equals the brute-force graph over distinct positive-norm vectors") {
    for (seed <- Seq(7L, 43L)) {
      val rows = corpus(seed, n = 30, dim = 8)
      val k = 3
      // collapse tier: one representative (min id) per distinct content
      val reps = rows.groupBy(_._2.toSeq).map { case (_, g) => g.minBy(_._1) }.toSeq
        .filter { case (_, v) => nrm(v) > 0 }
      val ref = (for {
        (src, sv) <- reps
        cands = reps.filter { case (dst, _) => dst != src }
          .map { case (dst, dv) => (dst, round6(dot(sv, dv) / (nrm(sv) * nrm(dv)))) }
          .sortBy { case (dst, s) => (s, dst) }(
            Ordering.Tuple2(sparkDouble.reverse, Ordering.Long))
        (dst, s) <- cands.take(k)
      } yield (src, dst, s)).toSet
      val got = Similarity.knnGraph(toDf(rows), nCells = 1, k = k)
        .select("src", "dst", "cos").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == ref, s"seed=$seed: missing ${(ref -- got).take(5)}, " +
        s"spurious ${(got -- ref).take(5)}")
    }
  }

  test("semanticDedup equals the uncollapsed single-tier transcription") {
    // The operator's scale story is the collapse tier: pair generation runs
    // over distinct vectors only, with a written proof sketch that rep-level
    // flags + the intra-group rule reproduce the uncollapsed cell join. This
    // law checks that claim directly against a single-tier reference that
    // assigns EVERY vector (no collapse) and searches for a lower-id
    // same-cell witness, across thresholds including the t=1.0 boundary
    // (intra-group cosine is ~1.0 only up to sqrt ulps — round6 must absorb
    // them) and t>1.0 (nothing can ever be a duplicate).
    for (seed <- Seq(19L, 53L); t <- Seq(0.8, 1.0, 1.0000001)) {
      val rows = corpus(seed, n = 32, dim = 8)
      val nCells = 4
      val cents = rows.filter(_._1 < nCells)
      val cell = rows.map { case (id, v) => id -> nearestCells(v, cents, 1).head }.toMap
      val ref = rows.map { case (vid, v) =>
        val dup = nrm(v) > 0 && rows.exists { case (uid, u) =>
          uid < vid && cell(uid) == cell(vid) && nrm(u) > 0 && {
            val raw = dot(u, v) / (nrm(u) * nrm(v))
            raw >= t - 1e-5 && round6(raw) >= t
          }
        }
        (vid, cell(vid), !dup)
      }.toSet
      val got = Similarity.semanticDedup(toDf(rows), nCells, t)
        .select("vec_id", "cell_id", "is_kept").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
      assert(got == ref, s"seed=$seed t=$t: missing ${(ref -- got).take(5)}, " +
        s"spurious ${(got -- ref).take(5)}")
      // teeth: below the boundary the corpus must actually flag duplicates
      // (planted copies) while keeping the zero-norm rows
      if (t <= 1.0) assert(ref.exists(!_._3) && ref.exists(r => r._3 && (r._1 == 5L || r._1 == 7L)),
        s"seed=$seed t=$t: no flagged duplicate or kept zero-norm row; corpus drifted")
      if (t > 1.0) assert(ref.forall(_._3), s"t=$t must keep everything")
    }
  }

  test("k-means training equals the sequential Lloyd transcription") {
    // The trainer's determinism contract — cosine assignment rounded to
    // 6dp with cell_id tie-break, centroid components summed in vec_id
    // order (left-to-right double adds), empty cells dropped — transcribed
    // sequentially. The planted zero-norm vector gets NULL cscores and the
    // lowest cell id (the guard AnnLawsSpec forced into cosD: ANSI throws
    // on double division by zero).
    for (seed <- Seq(29L, 71L); iters <- Seq(1, 2)) {
      val rows = corpus(seed, n = 26, dim = 8)
      val k = 4
      var cents: Seq[(Long, Seq[Double], Long)] = rows.filter(_._1 < k)
        .map { case (id, v) => (id, v.map(_.toDouble).toSeq, 1L) }
      def dotD(a: Seq[Double], b: Seq[Double]): Double =
        a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x * y }
      for (_ <- 1 to iters) {
        val assigned = rows.map { case (vid, v) =>
          val vd = v.map(_.toDouble).toSeq
          val best = cents.map { case (cid, c, _) =>
            val p = math.sqrt(dotD(vd, vd)) * math.sqrt(dotD(c, c))
            (cid, if (p > 0) Some(round6(dotD(vd, c) / p)) else None)
          }.sortBy { case (cid, s) => (s.isEmpty, s.map(-_).getOrElse(0.0), cid) }(
            Ordering.Tuple3(Ordering.Boolean, sparkDouble, Ordering.Long)).head._1
          (best, vid, v)
        }
        cents = assigned.groupBy(_._1).toSeq.map { case (cid, members) =>
          val ordered = members.sortBy(_._2)
          val n = ordered.size
          val cent = (0 until 8).map { pos =>
            ordered.foldLeft(0.0) { case (s, (_, _, v)) => s + v(pos).toDouble } / n
          }
          (cid, cent, n.toLong)
        }.sortBy(_._1)
      }
      val got = Similarity.kmeansCells(toDf(rows), k, iters)
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toSeq, r.getLong(2)))
        .toSeq.sortBy(_._1)
      assert(got == cents, s"seed=$seed iters=$iters:\n got $got\nwant $cents")
    }
  }

  test("lshPairs equals the uncollapsed bucket-join transcription") {
    // The collapse tier's expansion logic (cross pairs via the member map,
    // intra pairs at literal score 1.0, csize/norm gating) must reproduce
    // the single-tier form: bucket every RAW vector on the same hyperplane
    // signs, join within bucket, score, threshold. The intra literal is
    // only sound because round6 absorbs the sqrt ulps of x·x/(‖x‖·‖x‖) —
    // the reference computes the raw score and must land on exactly 1.0.
    val dim = 8; val nPlanes = 4
    val planes = Array.tabulate(nPlanes, dim)((j, i) =>
      Similarity.planeWeightValue(j, i + 1)) // column indices are 1-based
    def bucket(v: Vec): Long =
      (0 until nPlanes).map { j =>
        var s = 0.0; var i = 0
        while (i < dim) { s += v(i).toDouble * planes(j)(i); i += 1 }
        if (s >= 0) 1L << j else 0L
      }.sum
    for (seed <- Seq(31L, 67L); t <- Seq(0.3, 0.9)) {
      val rows = corpus(seed, n = 30, dim = dim)
      val ref = (for {
        (a, va) <- rows; (b, vb) <- rows
        if a < b && bucket(va) == bucket(vb) && nrm(va) > 0 && nrm(vb) > 0
        s = round6(dot(va, vb) / (nrm(va) * nrm(vb)))
        if s >= t
      } yield (bucket(va), a, b, s)).toSet
      val got = Similarity.lshPairs(toDf(rows), dim, nPlanes, t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      assert(got == ref, s"seed=$seed t=$t: missing ${(ref -- got).take(5)}, " +
        s"spurious ${(got -- ref).take(5)}")
      // teeth: planted copies must surface as intra pairs at exactly 1.0,
      // and (at the lower threshold) some non-identical pair must survive
      assert(ref.exists(_._4 == 1.0), s"seed=$seed t=$t: no intra pair; corpus drifted")
      if (t <= 0.3) assert(ref.exists(_._4 < 1.0),
        s"seed=$seed t=$t: no cross pair; corpus drifted")
    }
  }

  test("PQ over a codeword-copy corpus reconstructs exactly; ADC top-k equals true-distance top-k") {
    // Every vector is an exact copy of one of the first kCodes vectors and
    // components are integer-valued, so codebook means are exact (n·x/n = x
    // for integer x), reconstruction error must be identically zero, and
    // ADC degenerates to the TRUE squared L2 distance — which the reference
    // computes independently.
    val dim = 8; val nSub = 2; val dimPerSub = 4; val kCodes = 4; val nCells = 2; val k = 3
    for (seed <- Seq(3L, 77L)) {
      val rng = new scala.util.Random(seed)
      // distinct integer-valued bases (component (i, pos) unique per base)
      val bases: Seq[Vec] = (0 until kCodes).map(i =>
        Array.tabulate(dim)(p => (i * dim + p + rng.nextInt(3) * 32).toFloat))
      val rows: Seq[(Long, Vec)] = bases.zipWithIndex.map { case (v, i) => (i.toLong, v) } ++
        (kCodes until 28).map(id => (id.toLong, bases(rng.nextInt(kCodes))))
      val queries = rows.filter(_._1 % 6 == 2)
      val codes = Similarity.productQuantize(toDf(rows), nSub, dimPerSub, kCodes)
      val errs = codes.select("d").collect().map(_.getDouble(0))
      assert(errs.nonEmpty && errs.forall(_ == 0.0),
        s"seed=$seed: copies of codewords must quantize losslessly, got max err ${errs.max}")

      val cents = rows.filter(_._1 < nCells)
      val cellOf = rows.map { case (id, v) => id -> nearestCells(v, cents, 1).head }.toMap
      def l2sq(a: Vec, b: Vec): Double = {
        var s = 0.0; var i = 0
        while (i < dim) { val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1 }
        s
      }
      val ref = queries.flatMap { case (qid, qv) =>
        val cell = nearestCells(qv, cents, 1).head
        rows.filter { case (cid, _) => cid != qid && cellOf(cid) == cell }
          .map { case (cid, cv) => (cid, l2sq(qv, cv)) }
          .sortBy { case (cid, d) => (d, cid) }
          .take(k).map { case (cid, d) => (qid, cid, d) }
      }.toSet
      val got = Similarity.ivfPqTopK(toDf(queries), toDf(rows), nCells = nCells,
        nSub = nSub, dimPerSub = dimPerSub, kCodes = kCodes, k = k)
        .select("query_id", "corpus_id", "adc").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == ref, s"seed=$seed: missing ${(ref -- got).take(5)}, " +
        s"spurious ${(got -- ref).take(5)}")
    }
  }
}
