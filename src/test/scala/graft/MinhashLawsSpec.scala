package graft

import graft.functions.TextFunctions
import graft.operators.Dedup

/** Full-pipeline differential for MinHash+LSH.
  *
  * The whole pipeline is deterministic given the md5-based shingle hash —
  * signatures, band keys, candidate pairs, agreement scores — so unlike
  * classic randomized-permutation MinHash it admits an exact independent
  * reference: this spec transcribes the definition (min over distinct
  * k-shingles of (a_i·(h mod P) + b_i) mod P; band key = rows consecutive
  * signature slots; candidates share any band; agreement = matching slots
  * / K) in plain Scala and requires the operator's member-level output to
  * match it exactly, collapse tier and intra-group 1.0 contract included.
  * Any drift in the hash staging, the banding arithmetic, or the agreement
  * fold shows up as a map difference.
  */
class MinhashLawsSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def hash64(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).take(15), 16)

  private def shingleSet(text: String, k: Int): Set[String] =
    text.split(" ").sliding(k).filter(_.size == k).map(_.mkString(" ")).toSet

  test("minhash LSH pipeline equals its exact transcription on random corpora") {
    val K = 16; val bands = 4; val rows = K / bands; val minAgree = 0.5
    val kSh = 3
    for (seed <- Seq(29L, 733L)) {
      val rng = new scala.util.Random(seed)
      val vocab = (0 until 12).map(i => s"w$i")
      def toks(n: Int) = Seq.fill(n)(vocab(rng.nextInt(vocab.size)))
      var id = -1L
      def nid() = { id += 1; id }
      val docs: Seq[(Long, String)] = (0 until 10).flatMap { _ =>
        val base = toks(5 + rng.nextInt(8))
        val out = Seq.newBuilder[Seq[String]]
        out += base
        if (rng.nextBoolean()) out += base // exact copy
        if (rng.nextBoolean()) // 1-token mutation: high sig agreement likely
          out += base.updated(rng.nextInt(base.size), vocab(rng.nextInt(vocab.size)))
        out.result().map(t => (nid(), t.mkString(" ")))
      }
      val df = spark.createDataFrame(docs).toDF("doc_id", "text")
      val got = Dedup.minhashPairs(df, "doc_id", "text", K, bands, minAgree)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

      // --- exact transcription ---
      def sig(text: String): Vector[Long] = {
        val hs = shingleSet(text, kSh).toVector.map(s => hash64(s) % TextFunctions.MinhashP)
        (0 until K).map(i => hs.map(h =>
          (TextFunctions.MinhashA(i) * h + TextFunctions.MinhashB(i)) % TextFunctions.MinhashP).min).toVector
      }
      val groups = docs.groupBy(_._2).values.map(_.map(_._1).sorted).toSeq
      val reps = groups.map(g => g.head -> docs.find(_._1 == g.head).get._2)
      val sigs = reps.map { case (i, t) => i -> sig(t) }.toMap
      def bandKeys(s: Vector[Long]): Seq[(Int, String)] =
        (0 until bands).map(b => b -> s.slice(b * rows, b * rows + rows).mkString("_"))
      val cross = for {
        (a, sa) <- sigs.toSeq; (b, sb) <- sigs.toSeq if a < b
        if bandKeys(sa).toSet.intersect(bandKeys(sb).toSet).nonEmpty
        agree = sa.zip(sb).count { case (x, y) => x == y }.toDouble / K
        if agree >= minAgree
        ma <- groups.find(_.head == a).get; mb <- groups.find(_.head == b).get
      } yield (math.min(ma, mb), math.max(ma, mb)) -> agree
      val intra = for {
        g <- groups if g.size > 1
        ma <- g; mb <- g if ma < mb
      } yield (ma, mb) -> 1.0
      val want = (cross ++ intra).toMap

      assert(got == want, s"seed=$seed: missing ${(want.keySet -- got.keySet).take(5)}, " +
        s"spurious ${(got.keySet -- want.keySet).take(5)}")
    }
  }
}
