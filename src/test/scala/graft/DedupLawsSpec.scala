package graft

import graft.operators.Dedup

/** Randomized losslessness differentials for the candidate-pruned
  * similarity joins — the operators whose scale story RESTS on a pruning
  * lemma (prefix filtering, positional filter, rarity-prefix pigeonhole,
  * stop-shingle df cap). Each is compared against an in-test brute force
  * over every document pair on corpora built to stress the lemmas: exact
  * copies (the collapse tier), single-token mutations (pairs near the
  * threshold boundary), truncations (containment pairs with asymmetric
  * sizes), across several thresholds. A pruning bug that drops a true pair
  * — the failure mode candidate generation can have silently — shows up as
  * a missing row; scores are compared exactly (both sides compute the same
  * int/int IEEE division).
  */
class DedupLawsSpec extends SparkSpec {

  private val K = 3 // shingle size used by all three operators

  /** Reference shingling: distinct k-shingles of whitespace tokens —
    * transcribed from the TextFunctions definition, computed independently. */
  private def shingleSet(text: String): Set[String] =
    text.split(" ").sliding(K).filter(_.size == K).map(_.mkString(" ")).toSet

  /** Corpus with planted duplicate structure; every doc has >= K tokens
    * (the shingling contract). */
  private def corpus(seed: Long): Seq[(Long, String)] = {
    val rng = new scala.util.Random(seed)
    val words = (0 until 8).map(i => s"w$i")
    def doc(n: Int) = Seq.fill(n)(words(rng.nextInt(words.size))).mkString(" ")
    var id = -1L
    def nextId() = { id += 1; id }
    (0 until 12).flatMap { _ =>
      val base = doc(4 + rng.nextInt(7))
      val toks = base.split(" ")
      val variants = Seq.newBuilder[String]
      variants += base
      if (rng.nextBoolean()) variants += base // exact copy
      if (rng.nextBoolean()) { // single-token mutation
        val i = rng.nextInt(toks.length)
        variants += toks.updated(i, words(rng.nextInt(words.size))).mkString(" ")
      }
      if (rng.nextBoolean() && toks.length > K) // truncation (containment)
        variants += toks.dropRight(1).mkString(" ")
      variants.result().map(t => (nextId(), t))
    }
  }

  private def collectPairs(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Double] =
    df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("prefix-filtered jaccard join is lossless vs brute force on random corpora") {
    for (seed <- Seq(5L, 81L); t <- Seq(0.4, 0.7)) {
      val docs = corpus(seed)
      val df = spark.createDataFrame(docs).toDF("doc_id", "text")
      val got = collectPairs(Dedup.prefixJaccardPairs(df, "doc_id", "text", threshold = t))
      val sets = docs.map { case (id, text) => id -> shingleSet(text) }
      val want = (for {
        (a, sa) <- sets; (b, sb) <- sets if a < b
        inter = (sa & sb).size
        j = inter.toDouble / (sa.size + sb.size - inter)
        if j >= t
      } yield (a, b) -> j).toMap
      assert(got == want, s"seed=$seed t=$t: missing ${(want.keySet -- got.keySet).take(5)}, " +
        s"spurious ${(got.keySet -- want.keySet).take(5)}")
    }
  }

  test("containment join is lossless vs brute force on random corpora") {
    for (seed <- Seq(7L, 42L); (tNum, tDen) <- Seq((4, 5), (1, 2))) {
      val docs = corpus(seed)
      val df = spark.createDataFrame(docs).toDF("doc_id", "text")
      val got = collectPairs(Dedup.containmentPairs(df, "doc_id", "text", tNum, tDen))
      val sets = docs.map { case (id, text) => id -> shingleSet(text) }
      val want = (for {
        (a, sa) <- sets; (b, sb) <- sets if a != b
        inter = (sa & sb).size
        if inter.toLong * tDen >= sa.size.toLong * tNum
      } yield (a, b) -> inter.toDouble / sa.size.toDouble).toMap
      assert(got == want, s"seed=$seed t=$tNum/$tDen: missing ${(want.keySet -- got.keySet).take(5)}, " +
        s"spurious ${(got.keySet -- want.keySet).take(5)}")
    }
  }

  test("inverted-index ngram jaccard (cap disabled) is exact vs brute force") {
    val seed = 13L
    val docs = corpus(seed)
    val df = spark.createDataFrame(docs).toDF("doc_id", "text")
    val t = 0.3
    val got = collectPairs(Dedup.ngramJaccardPairs(df, "doc_id", "text",
      k = K, threshold = t, maxDf = 1000000L))
    val sets = docs.map { case (id, text) => id -> shingleSet(text) }
    val want = (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = (sa & sb).size
      j = inter.toDouble / (sa.size + sb.size - inter)
      if j > t // this operator's threshold is strict
    } yield (a, b) -> j).toMap
    assert(got == want, s"missing ${(want.keySet -- got.keySet).take(5)}, " +
      s"spurious ${(got.keySet -- want.keySet).take(5)}")
  }
}
