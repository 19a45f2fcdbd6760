package graft

import graft.operators.Winnow
import org.apache.spark.sql.functions._

/** Randomized equivalence of the distributed winnowing selection against a
  * direct single-machine transcription of the algorithm (Schleimer et al.,
  * SIGMOD'03): hash every k-gram, slide a window of w hashes, keep each
  * window's minimum.
  *
  * OperatorsSpec pins a handful of curated fixtures; this spec drives the same
  * operator over seeded-random corpora, where the awkward shapes (documents
  * shorter than k tokens, gram counts below w, duplicated grams inside one
  * window) occur by construction rather than by curation. The reference
  * implementation is ~10 lines of sliding-window Scala — independent of the
  * lead()/ROWS-frame machinery the operator uses — so agreement checks the
  * whole distributed assembly: tokenization, gram construction at document
  * tails, truncated first windows, and the hex-string min ordering.
  *
  * Docs are generated pre-normalized (lowercase alphanumeric tokens, single
  * spaces) so TextFunctions.normalize is the identity and the reference's
  * tokenization is a plain split.
  */
class WinnowLawsSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** The paper's selection, directly: min of each window of w gram hashes;
    * fewer than w grams → the single truncated window (matches the
    * operator's `idx <= greatest(0, ng - w)` filter). */
  private def refWinnow(toks: Seq[String], k: Int, w: Int): Set[String] = {
    if (toks.size < k) return Set.empty
    val hashes = toks.sliding(k).map(g => md5hex(g.mkString(" "))).toVector
    if (hashes.size <= w) Set(hashes.min)
    else hashes.sliding(w).map(_.min).toSet
  }

  private def randomCorpus(seed: Long, nDocs: Int, maxLen: Int): Seq[(Long, String)] = {
    val rng = new scala.util.Random(seed)
    val alphabet = Vector("a", "b", "c", "d", "e", "f", "g", "h", "i", "j")
    (1 to nDocs).map { id =>
      val n = 1 + rng.nextInt(maxLen) // 1..maxLen tokens; sub-k lengths common
      id.toLong -> Seq.fill(n)(alphabet(rng.nextInt(alphabet.size))).mkString(" ")
    }
  }

  private def checkEquivalence(corpus: Seq[(Long, String)], k: Int, w: Int): Unit = {
    val df = spark.createDataFrame(corpus).toDF("doc_id", "text")
    val got = Winnow.fingerprints(df, "doc_id", "text", k, w)
      .collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(_.getAs[String]("fp")).toSet).toMap
    val want = corpus.map { case (id, text) =>
      id -> refWinnow(text.split(" ").toSeq, k, w)
    }.filter(_._2.nonEmpty).toMap
    assert(got == want,
      s"k=$k w=$w: diverging docs ${(got.keySet ++ want.keySet).filter(d => got.get(d) != want.get(d))}")
  }

  test("random corpora: distributed selection equals the paper's algorithm (k=3, w=4)") {
    checkEquivalence(randomCorpus(seed = 8341L, nDocs = 60, maxLen = 40), k = 3, w = 4)
  }

  test("random corpora: distributed selection equals the paper's algorithm (k=2, w=6)") {
    checkEquivalence(randomCorpus(seed = 97L, nDocs = 60, maxLen = 25), k = 2, w = 6)
  }

  test("pair generation (cap disabled) equals brute-force fingerprint intersection") {
    val k = 3; val w = 4
    for ((seed, minShared) <- Seq((61L, 1L), (15L, 2L))) {
      val rng = new scala.util.Random(seed)
      val alphabet = Vector("a", "b", "c", "d", "e", "f")
      def toks(n: Int) = Seq.fill(n)(alphabet(rng.nextInt(alphabet.size)))
      // bases + planted shared runs + exact copies (collapse tier)
      var id = -1L
      def nid() = { id += 1; id }
      val docs: Seq[(Long, String)] = (0 until 10).flatMap { _ =>
        val run = toks(w + k - 1)
        val out = Seq.newBuilder[String]
        out += (toks(rng.nextInt(10)) ++ run ++ toks(rng.nextInt(10))).mkString(" ")
        out += (toks(rng.nextInt(10)) ++ run ++ toks(rng.nextInt(10))).mkString(" ")
        if (rng.nextBoolean()) out += toks(k + rng.nextInt(12)).mkString(" ")
        val built = out.result()
        (built ++ (if (rng.nextBoolean()) Seq(built.head) else Nil)).map(t => (nid(), t))
      }
      val df = spark.createDataFrame(docs).toDF("doc_id", "text")
      val got = Winnow.pairs(df, "doc_id", "text", k, w,
          dfCap = 1000000, minShared = minShared)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val fps = docs.map { case (i, t) => i -> refWinnow(t.split(" ").toSeq, k, w) }.toMap
      val want = (for {
        (a, fa) <- fps.toSeq; (b, fb) <- fps.toSeq if a < b
        shared = (fa & fb).size.toLong if shared >= minShared
      } yield (a, b) -> shared).toMap
      assert(got == want, s"seed=$seed minShared=$minShared: " +
        s"missing ${(want.keySet -- got.keySet).take(5)}, spurious ${(got.keySet -- want.keySet).take(5)}")
    }
  }

  test("planted shared runs of w+k-1 tokens always share a fingerprint") {
    val k = 3; val w = 4
    val rng = new scala.util.Random(20260815L)
    val alphabet = Vector("a", "b", "c", "d", "e", "f", "g", "h", "i", "j")
    def toks(n: Int) = Seq.fill(n)(alphabet(rng.nextInt(alphabet.size)))
    // 20 pairs; each shares one run of exactly w+k-1 tokens at random offsets
    val corpus = (0 until 20).flatMap { i =>
      val run = toks(w + k - 1)
      def doc = {
        val (pre, post) = (toks(rng.nextInt(15)), toks(rng.nextInt(15)))
        (pre ++ run ++ post).mkString(" ")
      }
      Seq((2L * i, doc), (2L * i + 1, doc))
    }
    val df = spark.createDataFrame(corpus).toDF("doc_id", "text")
    val fps = Winnow.fingerprints(df, "doc_id", "text", k, w).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(_.getAs[String]("fp")).toSet).toMap
    for (i <- 0 until 20) {
      val shared = fps(2L * i) intersect fps(2L * i + 1)
      assert(shared.nonEmpty,
        s"pair $i shares a ${w + k - 1}-token run but no fingerprint — the winnowing guarantee is broken")
    }
  }
}
