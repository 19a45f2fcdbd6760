package graft

import graft.operators._
import org.apache.spark.sql.functions._

class OperatorsSpec extends SparkSpec {

  private lazy val docs = spark.createDataFrame(Seq(
    (1L, "the quick brown fox jumps over the lazy dog today"),
    (2L, "the quick brown fox jumps over the lazy dog today"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog tonight"), // near dup of 1
    (4L, "completely different words nothing shared here at all everywhere")
  )).toDF("doc_id", "text")

  test("exact dedup groups identical normalized texts") {
    val out = Dedup.exact(docs, "doc_id", "text").collect()
    val dupGroup = out.filter(_.getAs[Long]("n_copies") == 2L)
    assert(dupGroup.length === 1)
    assert(dupGroup.head.getAs[Long]("keeper_id") === 1L)
    assert(out.map(_.getAs[Long]("n_copies")).sum === 4L)
  }

  test("minhash LSH finds exact and near duplicates, not unrelated docs") {
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
    // identical docs agree on the full signature
    val agree = Dedup.minhashPairs(docs, "doc_id", "text")
      .filter(col("doc_a") === 1 && col("doc_b") === 2)
      .collect().head.getAs[Double]("sig_agree")
    assert(agree === 1.0)
  }

  test("exact-dup collapse expands every member pair; null texts never pair") {
    // 3-copy group (1,2,5), a near dup (3), and two null-text docs that the
    // uncollapsed pipelines would drop at tokenization
    val dup3 = spark.createDataFrame(Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (5L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "the quick brown fox jumps over the lazy dog tonight"),
      (6L, null.asInstanceOf[String]),
      (7L, null.asInstanceOf[String])
    )).toDF("doc_id", "text")
    // Since round 10 a null (or sub-k-token) text has NO shingles on either
    // engine — null docs never reach any candidate stage. (They used to pair
    // each other through a padded "" shingle, the same greatest(...,1)
    // convention whose ANSI element_at overflow DegenerateCorpusSpec caught.)
    for (pairsDf <- Seq(
      Dedup.ngramJaccardPairs(dup3, "doc_id", "text", 3, 0.2),
      Dedup.minhashPairs(dup3, "doc_id", "text"),
      Dedup.simhashPairs(dup3, "doc_id", "text", maxHamming = 8))) {
      val pairs = pairsDf.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // all three intra-group pairs surface, expanded from one representative
      assert(Set((1L, 2L), (1L, 5L), (2L, 5L)).subsetOf(pairs))
      // cross-content pairs reach every member of the group, not just the rep
      assert(Set((1L, 3L), (2L, 3L), (3L, 5L)).subsetOf(pairs))
      // the null-text docs pair with nothing, including each other
      assert(!pairs.exists { case (a, b) => a >= 6L || b >= 6L })
      // each unordered pair exactly once, ordered a < b
      assert(pairsDf.collect().length === pairs.size)
      assert(pairs.forall { case (a, b) => a < b })
    }
  }

  test("ngram jaccard is exact: identical docs = 1.0, near dups high, others absent") {
    val rows = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.2)
      .collect().map(r => ((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")), r.getAs[Double]("jaccard"))).toMap
    assert(rows((1L, 2L)) === 1.0)
    assert(rows((1L, 3L)) > 0.5 && rows((1L, 3L)) < 1.0)
    assert(!rows.keySet.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("ngram jaccard stop-shingle cap drops hot shingles and bounds the bucket") {
    import spark.implicits._
    // 30 docs all sharing one hot shingle ("aa bb cc"), plus unique tails;
    // docs 1 and 2 additionally share their full text (true near-dups)
    val hot = (1 to 30).map { i =>
      val tail = if (i <= 2) "same same same" else s"tail$i word$i only$i"
      (i.toLong, s"aa bb cc $tail")
    }.toDF("doc_id", "text")
    // cap below the hot shingle's df=30: the hot shingle is removed, so the
    // only surviving candidate pairs come from the shared tails
    val capped = Dedup.ngramJaccardPairs(hot, "doc_id", "text", 3, 0.01, maxDf = 10)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(capped === Set((1L, 2L)))
    // with the cap above df, all 30*29/2 hot-bucket pairs reappear
    val uncapped = Dedup.ngramJaccardPairs(hot, "doc_id", "text", 3, 0.01, maxDf = 10000)
    assert(uncapped.count() === 435L)
  }

  test("simhash of identical docs is identical; near dups within hamming 8") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Long]("hamming"))).toMap
    assert(pairs((1L, 2L)) === 0L)
    assert(pairs.get((1L, 3L)).exists(_ <= 8L))
  }

  private lazy val vecs = spark.createDataFrame(Seq(
    (0L, Seq.tabulate(64)(i => if (i == 0) 1.0f else 0.0f)),
    (1L, Seq.tabulate(64)(i => if (i == 0) 0.9f else if (i == 1) 0.1f else 0.0f)),
    (2L, Seq.tabulate(64)(i => if (i == 1) 1.0f else 0.0f)),
    (3L, Seq.tabulate(64)(i => if (i == 2) -1.0f else 0.0f))
  )).toDF("vec_id", "embedding")

  test("brute-force top-k ranks by cosine with deterministic tiebreak") {
    val out = Similarity.bruteForceTopK(vecs.filter(col("vec_id") === 0), vecs, 2)
      .collect().sortBy(_.getAs[Int]("rank"))
    assert(out.length === 2)
    assert(out.head.getAs[Long]("corpus_id") === 1L) // closest to e0
    assert(out.head.getAs[Double]("score") > 0.99)
  }

  test("semantic dedup drops the higher-id near-identical vector, keeps distinct ones") {
    // vecs 0/1 seed two cells; 2 is nearly parallel to 0 (same cell, cos ~1),
    // 3 is nearly parallel to 1. The lower id of each neighborhood is kept.
    val vecs = spark.createDataFrame(Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 0.0f)),
      (2L, Array(0.99f, 0.01f, 0.0f)),
      (3L, Array(0.01f, 0.99f, 0.0f))
    )).toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(vecs, nCells = 2, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out === Map(0L -> true, 1L -> true, 2L -> false, 3L -> false))
  }

  test("LSH buckets put identical-direction vectors together") {
    val pairs = Similarity.lshPairs(vecs, 64, 8, 0.9)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((0L, 1L)))
  }

  // exercises the exact-collapse tier (testdata has no duplicate embeddings,
  // so only these specs and the ScaleUp bench data reach the member-expansion
  // code): duplicate groups, a zero-norm duplicate group, and an unreachable
  // threshold must all match the uncollapsed first-principles semantics.
  private lazy val dupVecs = spark.createDataFrame(Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),   // rep of {0, 4, 7}
    (1L, Array(0.0f, 1.0f, 0.0f)),   // distinct, kept
    (2L, Array(0.0f, 0.0f, 0.0f)),   // rep of zero-norm group {2, 5}
    (3L, Array(0.99f, 0.01f, 0.0f)), // near-dup of 0's direction
    (4L, Array(1.0f, 0.0f, 0.0f)),   // exact copy of 0
    (5L, Array(0.0f, 0.0f, 0.0f)),   // exact copy of 2 (zero norm)
    (7L, Array(1.0f, 0.0f, 0.0f))    // exact copy of 0
  )).toDF("vec_id", "embedding")

  test("semantic dedup: exact copies collapse to the min-id keeper; zero-norm copies all kept") {
    val out = Similarity.semanticDedup(dupVecs, nCells = 2, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    // 0 kept (lowest of its neighborhood), 4/7 exact dups, 3 near-dup;
    // zero-norm vectors (2, 5) produce NULL/NaN cosines -> never duplicates
    assert(out === Map(0L -> true, 1L -> true, 2L -> true, 3L -> false,
      4L -> false, 5L -> true, 7L -> false))
  }

  test("semantic dedup: unreachable threshold keeps everything, even exact copies") {
    val out = Similarity.semanticDedup(dupVecs, nCells = 2, threshold = 1.5)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out.values.forall(identity), s"nothing can exceed cosine 1.0: $out")
  }

  test("LSH pairs: duplicate groups expand to all member pairs with score 1.0, zero-norm exempt") {
    val pairs = Similarity.lshPairs(dupVecs, 3, 8, 0.9)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("score"))).toSet
    val intra = pairs.filter(p => Set(0L, 4L, 7L).contains(p._1) && Set(0L, 4L, 7L).contains(p._2))
    assert(intra.map(p => (p._1, p._2)) === Set((0L, 4L), (0L, 7L), (4L, 7L)))
    assert(intra.forall(_._3 == 1.0))
    // the zero-norm group {2, 5} must produce no pair at all
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L || p._1 == 5L || p._2 == 5L))
  }

  test("LSH pairs: unreachable threshold yields no pairs") {
    assert(Similarity.lshPairs(dupVecs, 3, 8, 1.5).count() === 0L)
  }

  test("IVF top-k probes nearest cells and finds the true neighbor") {
    // nCells=2 -> centroids are vec 0 (e0) and vec 1 (~e0). Query vec 0
    // probes both cells, so it must find vec 1 (cosine ~0.994) at rank 1.
    val out = Similarity.ivfTopK(vecs.filter(col("vec_id") === 0), vecs,
      nCells = 2, nProbe = 2, k = 2).collect().sortBy(_.getAs[Int]("rank"))
    assert(out.nonEmpty)
    assert(out.head.getAs[Long]("corpus_id") === 1L)
    assert(out.head.getAs[Double]("score") > 0.99)
    assert(!out.exists(_.getAs[Long]("corpus_id") == 0L)) // no self-match
  }

  test("frame sampling chunks payloads deterministically") {
    val media = Multimodal.asMedia(docs, "doc_id", "text")
    val frames = Multimodal.sampleFrames(media, frameBytes = 16, everyN = 2)
      .collect().filter(_.doc_id == 1L).sortBy(_.frame_idx)
    val text = "the quick brown fox jumps over the lazy dog today" // 49 bytes
    // ceil(49/16)=4 frames, keep idx 0 and 2
    assert(frames.map(_.frame_idx).toSeq == Seq(0L, 2L))
    assert(new String(frames.head.frame, "UTF-8") == text.substring(0, 16))
    assert(frames.map(_.frame_len).toSeq == Seq(16L, 16L))
  }

  test("resize stub pads/truncates payload to target size, keeps plumbing typed") {
    val media = Multimodal.asMedia(docs, "doc_id", "text")
    val out = Multimodal.resize(media, 8, 8).collect().head
    assert(out.media.length === 64)
    assert(out.media_type.endsWith(";resized=8x8"))
  }

  test("salted join equals the plain join and spreads the hot key") {
    import spark.implicits._
    // hot key: 90 of 100 fact rows share key 1
    val facts = (1 to 100).map(i => (if (i <= 90) 1L else i.toLong, i.toLong))
      .toDF("k", "v")
    val dims = Seq((1L, "hot"), (95L, "cold")).toDF("k", "name")
    val salted = Skew.saltedJoin(facts, dims, "k", 8)
    val plain = facts.join(dims, "k")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // the hot key's fact rows actually use multiple salt buckets
    val buckets = facts.filter(col("k") === 1)
      .withColumn("_salt", pmod(hash(struct(facts.columns.map(col): _*)), lit(8)))
      .select("_salt").distinct().count()
    assert(buckets > 1)
  }

  test("GROUPS frame rewrite matches a hand-computed peer-group sum") {
    import spark.implicits._
    val df = Seq(("a", 1, 10), ("a", 1, 20), ("a", 2, 30), ("a", 3, 40), ("a", 5, 50))
      .toDF("p", "o", "x")
    val out = Windows.withGroupsFrame(df, Seq(col("p")), col("o"),
      nPreceding = 1, nFollowing = 0, agg = sum(col("x")), outName = "s")
      .orderBy(col("o"), col("x")).select("o", "x", "s")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
    // groups: {o=1: 10,20} {o=2: 30} {o=3: 40} {o=5: 50}; frame = this + prev group
    assert(out == Seq((1, 10, 30L), (1, 20, 30L), (2, 30, 60L), (3, 40, 70L), (5, 50, 90L)))
  }

  test("blocked cosine pairs are bit-equal to the declarative VecDot form") {
    import graft.functions.VectorFunctions
    val e = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 200)
      .select(col("vec_id"), col("embedding"),
        sqrt(VectorFunctions.dot(col("embedding"), col("embedding"))).as("nrm"))
    val l = e.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"), col("nrm").as("nrm_a"))
    val r = e.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"), col("nrm").as("nrm_b"))
    val declarative = l.crossJoin(r).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (VectorFunctions.dot(col("emb_a"), col("emb_b")) / (col("nrm_a") * col("nrm_b")))
          .as("raw_score"))
    val blocked = Similarity.cosinePairsBlocked(
      Tables.embeddings(spark, sfDir).filter(col("vec_id") < 200))
    assert(blocked.exceptAll(declarative).isEmpty && declarative.exceptAll(blocked).isEmpty)
  }

  test("block-join all-pairs is bit-equal to the broadcast reference, any block count") {
    val corpus = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 200)
    val reference = Similarity.cosinePairsBlocked(corpus)
    // exercise bucket bookkeeping at the degenerate (1 = everything in one
    // same-block bucket) and non-divisor block counts
    for (b <- Seq(1, 7, 16)) {
      val keyed = Similarity.cosineAllPairsBlockJoin(corpus, nBlocks = b)
      assert(keyed.exceptAll(reference).isEmpty && reference.exceptAll(keyed).isEmpty,
        s"nBlocks=$b diverges from the broadcast reference")
      // exactly one row per unordered pair
      assert(keyed.groupBy(col("id_a"), col("id_b")).count()
        .filter(col("count") > 1).isEmpty, s"nBlocks=$b emits duplicate pairs")
    }
  }

  test("blocked cosine pairs refuses a corpus over the broadcast bound") {
    val corpus = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 200)
    val e = intercept[IllegalArgumentException] {
      Similarity.cosinePairsBlocked(corpus, maxRows = 100L)
    }
    assert(e.getMessage.contains("lshPairs"))
  }

  test("asof join picks the latest right row at-or-before, null when none") {
    import spark.implicits._
    val quotes = Seq((1L, 10L, 1.0), (1L, 20L, 2.0), (2L, 15L, 9.0))
      .toDF("k", "qt", "px")
    val trades = Seq((1L, 5L, 100L), (1L, 10L, 101L), (1L, 25L, 102L), (2L, 14L, 103L))
      .toDF("k", "tt", "trade_id")
    val out = TimeJoins.asofJoin(trades, quotes, "k", "tt", "qt", Seq("px"))
      .select("trade_id", "asof_px").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(100L).isEmpty)          // t=5: no quote yet
    assert(out(101L).contains(1.0))    // t=10: equal timestamp matches
    assert(out(102L).contains(2.0))    // t=25: latest is qt=20
    assert(out(103L).isEmpty)          // k=2: quote at 15 is after 14
  }

  test("range join binned equals the naive inequality join, no duplicates") {
    import spark.implicits._
    val pts = (0L until 100L).map(t => (t, t * 7 % 50)).toDF("pid", "t")
    val ivs = Seq((0L, 5L, 20L), (1L, 18L, 40L), (2L, 45L, 49L)).toDF("iid", "s", "e")
    val binned = TimeJoins.rangeJoinBinned(pts, ivs, "t", "s", "e", binWidth = 8)
    val naive = pts.crossJoin(ivs).filter(col("t") >= col("s") && col("t") <= col("e"))
    assert(binned.count() == naive.count())
    assert(binned.select("pid", "iid").exceptAll(naive.select("pid", "iid")).isEmpty)
  }

  test("overlap join binned equals the naive overlap join, one row per pair") {
    import spark.implicits._
    // intervals spanning up to 5 bins (width 8) so multi-bin pairs exercise
    // the first-overlapping-bin dedup arithmetic; key splits two groups
    val ls = (0L until 40L).map(i => (i, i % 2, i * 3 % 60, i * 3 % 60 + 37L))
      .toDF("lid", "k", "ls", "le")
    val rs = (0L until 30L).map(i => (1000L + i, i % 2, i * 5 % 55, i * 5 % 55 + 11L))
      .toDF("rid", "k", "rs", "re")
    val binned = TimeJoins.overlapJoinBinned(ls, rs, Seq("k"), "ls", "le", "rs", "re", 8L)
    val naive = ls.join(rs.withColumnRenamed("k", "k2"), col("k") === col("k2")
      && col("ls") <= col("re") && col("rs") <= col("le"))
    assert(binned.count() == naive.count())
    assert(binned.groupBy("lid", "rid").count().filter(col("count") > 1).isEmpty)
    assert(binned.select("lid", "rid").exceptAll(naive.select("lid", "rid")).isEmpty)
  }

  test("edit-distance dedup: near dups pair, hot blocks never join, -1 sentinel filtered") {
    // 70 docs sharing a prefix+length block (over the cap of 64) plus one
    // near-dup pair in a small block. The hot block must contribute ZERO
    // pairs — its 70·69/2 candidates are exactly what would go quadratic
    // corpus-wide — and the thresholded levenshtein's -1 (distance above
    // maxDist) must not leak through the `dist <= maxDist` filter.
    val hot = (100L until 170L).map(i => (i, s"shared boilerplate header unit $i"))
    val near = Seq(
      (1L, "a distinctive document about spark engines and scale"),
      (2L, "a distinctive document about spark engines and scales"),
      (3L, "a distinctive bbbbb ccccc ddddd eeeee fffff ggggg")) // same block as 1/2, dist > maxDist → -1
    val df = spark.createDataFrame(hot ++ near).toDF("doc_id", "text")
    val pairs = Dedup.editPairs(df, "doc_id", "text", blockCap = 64L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((1L, 2L)), pairs.mkString(","))
    assert(pairs.head._3 === 1L) // one trailing-char edit
    // same data under a higher cap: the hot block pairs freely (cap, not
    // blocking, was what suppressed it)
    val uncapped = Dedup.editPairs(df, "doc_id", "text", blockCap = 100L).count()
    assert(uncapped > 2000L)
  }

  test("edit-distance dedup collapse tier: exact dups pair at distance 0, cap counts raw membership") {
    // 5 identical docs (one rep, distance-0 intra pairs expanded through the
    // member map) + 1 near-dup (rep-level comparison expands to 5 cross
    // pairs) + a cluster of 70 identical docs: ONE representative, but the
    // cap must count raw membership (70 > 64), exactly as uncollapsed —
    // so it contributes zero pairs.
    val dups = (1L to 5L).map(i => (i, "identical content repeated verbatim here"))
    val near = Seq((6L, "identical content repeated verbatim hore"))
    val hot = (100L until 170L).map(i => (i, "hot boilerplate shared by everyone"))
    val df = spark.createDataFrame(dups ++ near ++ hot).toDF("doc_id", "text")
    val pairs = Dedup.editPairs(df, "doc_id", "text", blockCap = 64L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val intra = pairs.filter(p => p._1 <= 5 && p._2 <= 5)
    assert(intra.length == 10 && intra.forall(_._3 == 0L), pairs.mkString(","))
    val cross = pairs.filter(p => p._2 == 6L)
    assert(cross.length == 5 && cross.forall(_._3 == 1L), pairs.mkString(","))
    assert(pairs.length == 15, s"hot cluster must contribute nothing: ${pairs.length}")
  }

  test("topKPerKey matches the window formulation and is partition-invariant") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // 3 keys x 40 rows with deliberate score ties (score = i % 7)
    val df = (0 until 120).map(i => (s"k${i % 3}", i.toLong, (i % 7).toDouble))
      .toDF("key", "id", "score")
    def asSet(out: org.apache.spark.sql.DataFrame) =
      out.select("key", "id", "score").as[(String, Long, Double)].collect().toSet
    val expected = asSet(df.withColumn("rn",
      row_number().over(Window.partitionBy($"key").orderBy($"score".desc, $"id")))
      .filter($"rn" <= 5).drop("rn"))
    val got = asSet(TopK.perKey(df, Seq("key"), Seq("score" -> false, "id" -> true), 5))
    assert(got === expected)
    // partition-invariance: 1 vs 16 input partitions agree
    val one = asSet(TopK.perKey(df.coalesce(1), Seq("key"), Seq("score" -> false, "id" -> true), 5))
    val many = asSet(TopK.perKey(df.repartition(16), Seq("key"), Seq("score" -> false, "id" -> true), 5))
    assert(one === got && many === got)
    // k larger than a group returns the whole group
    val all = TopK.perKey(df.filter($"id" < 4), Seq("key"), Seq("score" -> true, "id" -> true), 100)
    assert(all.count() === 4)
    // unknown column fails fast with the available names
    val e = intercept[IllegalArgumentException](
      TopK.perKey(df, Seq("nope"), Seq("score" -> false), 3))
    assert(e.getMessage.contains("nope") && e.getMessage.contains("key"))
  }

  test("winnowing: shared-run guarantee, short-doc fallback, df cap") {
    import spark.implicits._
    val k = 4; val w = 5
    // doc 1 and 2 share a run of w+k-1 = 8 tokens -> guaranteed >=1 shared fp
    val shared = "alpha bravo charlie delta echo foxtrot golf hotel"
    val docs = Seq(
      (1L, s"unique one two three $shared"),
      (2L, s"$shared other closing words here"),
      (3L, "tiny doc four tokens"),          // exactly k tokens -> 1 gram -> 1 fp
      (4L, "too short"),                     // < k tokens -> dropped
      (5L, s"unique one two three $shared")  // identical to 1 -> identical fps
    ).toDF("doc_id", "text")
    val fps = Winnow.fingerprints(docs, "doc_id", "text", k, w)
      .collect().groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(_.getAs[String]("fp")).toSet).toMap
    assert(!fps.contains(4L), "sub-k docs produce no fingerprints")
    assert(fps(3L).size === 1, "short docs fall back to one whole-doc fingerprint")
    assert(fps(1L) === fps(5L), "identical docs fingerprint identically")
    assert((fps(1L) & fps(2L)).nonEmpty, "w+k-1 shared tokens guarantee a shared fp")
    // the guarantee survives partitioning (windows are per-doc)
    val fpsMany = Winnow.fingerprints(docs.repartition(7), "doc_id", "text", k, w)
      .collect().groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(_.getAs[String]("fp")).toSet).toMap
    assert(fpsMany === fps)
    // pairs: 1-2 and 1-5 and 2-5 candidates exist at minShared=1;
    // a df cap of 2 keeps the fp shared by exactly {1,2,5} out
    val pairs = Winnow.pairs(docs, "doc_id", "text", k, w, dfCap = 50, minShared = 1L)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs.contains((1L, 5L)) && pairs.contains((1L, 2L)))
    val capped = Winnow.pairs(docs, "doc_id", "text", k, w, dfCap = 2, minShared = 1L)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(!capped.contains((1L, 2L)),
      "fingerprints above the df cap must not generate pairs")
  }

  test("prefix-filtered jaccard join is lossless vs brute force and honors collapse") {
    // 6 docs: a 2-copy exact group, a near dup, and unrelated docs; brute
    // force = all-pairs jaccard over the same 3-shingle sets
    val d = spark.createDataFrame(Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d e f g h"), // exact dup of 1
      (3L, "a b c d e f g x"), // near dup (shares 5 of 6 trigrams)
      (4L, "p q r s t u v w"),
      (5L, "z z z z z z z z"),
      (6L, "m n o"))).toDF("doc_id", "text") // ≥ k tokens (shinglesFromTokens contract)
    val got = Dedup.prefixJaccardPairs(d, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // brute force over every unordered pair
    import graft.functions.TextFunctions
    val sets = d.select(col("doc_id"), TextFunctions.tokens(col("text")).as("t"))
      .select(col("doc_id"), TextFunctions.shinglesFromTokens(col("t"), 3).as("ss"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val want = (for {
      a <- sets.keys; b <- sets.keys if a < b
      j = sets(a).intersect(sets(b)).size.toDouble /
        sets(a).union(sets(b)).size
      if j >= 0.5
    } yield (a, b) -> j).toMap
    assert(got.keySet === want.keySet,
      s"prefix filter must be lossless: got ${got.keySet}, want ${want.keySet}")
    want.foreach { case (k, j) => assert(got(k) === j, s"jaccard mismatch at $k") }
    assert(got((1L, 2L)) === 1.0, "exact dups score exactly 1.0 via the collapse tier")
    // partition invariance (prefix ranks are per-doc windows; df is global)
    val many = Dedup.prefixJaccardPairs(d.repartition(7), "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(many === got)
  }

  test("containment join is lossless vs brute force, directional, and collapse-aware") {
    val d = spark.createDataFrame(Seq(
      (1L, "a b c d e f g h i j k l"),
      (2L, "a b c d e f g h i j k l"), // exact dup of 1
      (3L, "a b c d e f g h"),         // contained in 1 (all 6 trigrams shared)
      (4L, "a b c d e f g h x y z w"), // partial overlap with 1
      (5L, "p q r s t u v w"))).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(d, "doc_id", "text", tNum = 4, tDen = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    import graft.functions.TextFunctions
    val sets = d.select(col("doc_id"), TextFunctions.tokens(col("text")).as("t"))
      .select(col("doc_id"), TextFunctions.shinglesFromTokens(col("t"), 3).as("ss"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val want = (for {
      a <- sets.keys; b <- sets.keys if a != b
      i = sets(a).intersect(sets(b)).size
      if i * 5 >= sets(a).size * 4
    } yield (a, b) -> i.toDouble / sets(a).size).toMap
    assert(got.keySet === want.keySet,
      s"containment prefix filter must be lossless: got ${got.keySet}, want ${want.keySet}")
    want.foreach { case (k, c) => assert(got(k) === c, s"containment mismatch at $k") }
    // direction: the small doc is contained in the big one, not vice versa
    assert(got.contains((3L, 1L)) && !got.contains((1L, 3L)))
    // exact dups contain each other, via the collapse tier, in both directions
    assert(got((1L, 2L)) === 1.0 && got((2L, 1L)) === 1.0)
    // partition invariance
    val many = Dedup.containmentPairs(d.repartition(7), "doc_id", "text", 4, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(many === got)
  }

  test("phash pairs: near-identical payloads pair, unrelated never; dups are hamming 0") {
    val base = ("the quick brown fox jumps over the lazy dog " * 20).trim
    val nearDup = base.dropRight(6) + " zzzzz"            // small tail edit
    val other = ("XYZXYZ completely different payload QRSQRS " * 20).trim
    val d = spark.createDataFrame(Seq(
      (1L, base), (2L, base), (3L, nearDup), (4L, other))).toDF("doc_id", "text")
    val got = Dedup.phashPairs(d, "doc_id", "text", maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got((1L, 2L)) === 0L, "exact dups are hamming 0 via the collapse tier")
    assert(got.contains((1L, 3L)) && got((1L, 3L)) <= 6L, "small edits flip few blocks")
    assert(!got.keySet.exists { case (a, b) => a == 4L || b == 4L },
      "unrelated payloads never pair")
    // signatures are partition-invariant (pure integer arithmetic)
    val sigs1 = Dedup.phash(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sigs7 = Dedup.phash(d.repartition(7), "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs1 === sigs7)
  }

  test("phash compiled loop is bit-identical to the explode/window column formula") {
    // Round 15: Dedup.phash became one compiled per-doc loop. Pin bit
    // equality against the ORIGINAL column pipeline (posexplode + ascii +
    // groupBy + window) on payloads that exercise every branch of the
    // UTF-8 first-byte arithmetic Spark's `ascii` uses: pure ASCII,
    // Latin-1 (2-byte), BMP multi-byte (3-byte), supplementary plane
    // (4-byte), strings shorter/longer than 64 blocks, a 1-char payload,
    // and empties/nulls (dropped by both).
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.LongType
    val payloads: Seq[(Long, String)] = Seq(
      1L -> ("the quick brown fox " * 40).trim,
      2L -> "café naïve résumé über " * 12,
      3L -> "你好世界 mixed €✓ text " * 9,
      4L -> (new String(Character.toChars(0x1F600)) * 70 + " tail"),
      5L -> "x",
      6L -> "short",
      7L -> "",
      8L -> null,
      9L -> ("block boundary " * 5).take(63),
      10L -> ("block boundary " * 5).take(65))
    val d = spark.createDataFrame(payloads).toDF("doc_id", "text")
    def reference(docs: org.apache.spark.sql.DataFrame): Map[Long, Long] = {
      val chars = docs
        .select(col("doc_id"), length(col("text")).cast(LongType).as("len"),
          posexplode(split(col("text"), ""))).toDF("doc_id", "len", "p", "ch")
        .filter(col("len") > 0)
        .select(col("doc_id"), expr("p * 64 div len").as("blk"),
          ascii(col("ch")).cast(LongType).as("s"))
      val blocks = chars.groupBy(col("doc_id"), col("blk"))
        .agg(sum(col("s")).as("sb"), count(lit(1)).as("cb"))
      val w = Window.partitionBy(col("doc_id"))
      blocks
        .withColumn("st", sum(col("sb")).over(w))
        .withColumn("nt", sum(col("cb")).over(w))
        .select(col("doc_id"),
          when(col("sb") * col("nt") > col("st") * col("cb"),
            expr("shiftleft(1L, cast(blk as int))")).otherwise(0L).as("bit"))
        .groupBy(col("doc_id"))
        .agg(sum(col("bit")).as("phash"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val want = reference(d)
    val got = Dedup.phash(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
    assert(!got.contains(7L) && !got.contains(8L), "empty/null payloads have no signature")
  }

  test("KMV minima are partition-invariant and the estimator is within the sketch bound") {
    // 1000 distinct values through the same md5-derived hash the query uses
    import graft.functions.TextFunctions
    import org.apache.spark.sql.types.StringType
    val n = 1000
    val vals = spark.range(n.toLong).select(col("id").cast(StringType).as("v"))
    def kmin(parts: Int) = graft.operators.TopK.perKey(
      vals.repartition(parts).select(lit(1).as("g"), TextFunctions.hash64(col("v")).as("h")).distinct(),
      Seq("g"), Seq("h" -> true), 64)
      .collect().map(_.getAs[Long]("h")).sorted.toSeq
    val one = kmin(1)
    assert(one.length === 64)
    assert(kmin(13) === one, "K-minima must not depend on partitioning")
    val est = 63.0 * math.pow(2, 60) / one.last
    // 3-sigma KMV bound: sigma ~ D / sqrt(K-2)
    assert(math.abs(est - n) < 3.0 * n / math.sqrt(62),
      s"KMV estimate $est outside 3-sigma of $n")
  }

  test("product quantization: Lloyd round never increases error; partition-invariant") {
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    import org.apache.spark.sql.Row
    // 60 deterministic 8-dim vectors, 2 subspaces x 4 dims, 4 codewords
    val rows = (0 until 60).map { i =>
      Row(i.toLong, Array.tabulate(8)(j => ((i * 7 + j * 3) % 13 - 6) / 6.0f))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("embedding", ArrayType(FloatType))))
    val vecs = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    val pq = Similarity.productQuantize(vecs, nSub = 2, dimPerSub = 4, k = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(pq.length === 120, "one row per (vector, subspace)")
    assert(pq.forall { case (_, _, code, _) => code >= 0 && code < 4 })
    assert(pq.forall { case (_, _, _, d) => d >= 0.0 })
    // seeds quantize to themselves in the seeded round; after one Lloyd
    // round their error can grow only if the refit moved the codeword —
    // total error across the corpus must not increase (Lloyd monotonicity)
    val total = pq.map(_._4).sum
    val seeded = {
      val subs = (0 until 60).flatMap { i =>
        val v = Array.tabulate(8)(j => (((i * 7 + j * 3) % 13 - 6) / 6.0f).toDouble)
        Seq((i, 0, v.slice(0, 4)), (i, 1, v.slice(4, 8)))
      }
      val seeds = subs.filter(_._1 < 4)
      subs.map { case (_, m, v) =>
        seeds.filter(_._2 == m).map { case (_, _, c) =>
          c.zip(v).map { case (x, y) => (y - x) * (y - x) }.sum
        }.min
      }.sum
    }
    assert(total <= seeded + 1e-9,
      s"Lloyd refinement must not increase total error: $total vs seeded $seeded")
    val many = Similarity.productQuantize(vecs.repartition(7), 2, 4, 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(many.sortBy(t => (t._1, t._2)) === pq.sortBy(t => (t._1, t._2)),
      "PQ must be partitioning-invariant")
  }

  test("multimodal decode produces deterministic metadata from bytes") {
    val meta = Multimodal.decodeDocuments(spark, docs)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(meta(1L).getAs[Long]("width") === 64L + ('t' & 0x3f))
    assert(meta(1L).getAs[Long]("height") === 64L + ('h' & 0x3f))
    assert(meta(1L).getAs[Long]("n_bytes") ===
      "the quick brown fox jumps over the lazy dog today".getBytes("UTF-8").length.toLong)
    assert(meta(1L).getAs[String]("format") === "fake")
    // identical payloads decode identically
    assert(meta(1L).getAs[Long]("width") === meta(2L).getAs[Long]("width"))
  }
}
