package graft

import graft.operators.{Dedup, Skew}
import org.apache.spark.sql.functions._

/** Randomized laws for the banding and salting rewrites.
  *
  * SimHash candidate generation banks on a pigeonhole: 4 disjoint 16-bit
  * chunks of the 64-bit signature, so any pair within Hamming distance 3
  * has at least one untouched chunk and MUST meet in the chunk join —
  * lossless for maxHamming <= 3. The salted join claims exact equivalence
  * to the plain inner join (same rows, same multiplicities) for any salt
  * fan-out. Both are compared against brute force on seeded random inputs;
  * the simhash corpora use long documents with single-token substitutions
  * so real pairs land on both sides of the Hamming cutoff.
  */
class BandingLawsSpec extends SparkSpec {

  test("simhash chunk banding is lossless at maxHamming <= 3 vs brute force") {
    for (seed <- Seq(17L, 923L)) {
      val rng = new scala.util.Random(seed)
      val vocab = (0 until 200).map(i => s"tok$i")
      def doc(n: Int) = Seq.fill(n)(vocab(rng.nextInt(vocab.size)))
      var id = -1L
      def nid() = { id += 1; id }
      val docs: Seq[(Long, String)] = (0 until 10).flatMap { _ =>
        val base = doc(50 + rng.nextInt(30))
        val out = Seq.newBuilder[Seq[String]]
        out += base
        if (rng.nextBoolean()) out += base // exact copy -> collapse tier
        // 1-2 token substitutions: flips few signature bits on long docs
        (0 until rng.nextInt(3)).foreach { _ =>
          out += base.updated(rng.nextInt(base.size), vocab(rng.nextInt(vocab.size)))
        }
        out.result().map(t => (nid(), t.mkString(" ")))
      }
      val df = spark.createDataFrame(docs).toDF("doc_id", "text")
      val got = Dedup.simhashPairs(df, "doc_id", "text", maxHamming = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

      // reference: collapse by exact text, signatures from the operator's
      // own simhash (the claim under test is the BANDING, not the
      // signature definition), brute-force Hamming over all rep pairs
      val groups = docs.groupBy(_._2).values.map(_.map(_._1).sorted).toSeq
      val repOf = groups.flatMap(g => g.map(_ -> g.head)).toMap
      val reps = docs.filter { case (i, _) => repOf(i) == i }
      val sig = Dedup.simhash(
          spark.createDataFrame(reps).toDF("doc_id", "text"), "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val cross = for {
        (a, sa) <- sig.toSeq; (b, sb) <- sig.toSeq if a < b
        h = java.lang.Long.bitCount(sa ^ sb).toLong if h <= 3
        ma <- groups.find(_.head == a).get; mb <- groups.find(_.head == b).get
      } yield (math.min(ma, mb), math.max(ma, mb)) -> h
      val intra = for {
        g <- groups if g.size > 1
        ma <- g; mb <- g if ma < mb
      } yield (ma, mb) -> 0L
      val want = (cross ++ intra).toMap
      assert(got == want, s"seed=$seed: missing ${(want.keySet -- got.keySet).take(5)}, " +
        s"spurious ${(got.keySet -- want.keySet).take(5)}")
    }
  }

  // phash mask construction: 64 chars, one per block, 'a' (97) or 'z' (122).
  // The global mean stays strictly between them for ANY z-count in 0..63,
  // so the signature is exactly the bitmask of 'z' positions — Hamming
  // distances are controlled by construction.
  private def maskDoc(mask: Long): String =
    (0 until 64).map(b => if ((mask >> b & 1L) == 1L) 'z' else 'a').mkString

  test("phash of a mask document is exactly the mask (constructed-signature identity)") {
    val rng = new scala.util.Random(101L)
    val masks = Seq(0L, 1L, (1L << 63) - 1) ++ Seq.fill(8)(rng.nextLong() & ~(1L << 63))
    val docs = masks.zipWithIndex.map { case (m, i) => (i.toLong, maskDoc(m)) }
    val got = Dedup.phash(spark.createDataFrame(docs).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    docs.foreach { case (id, _) => assert(got(id) == masks(id.toInt),
      s"doc $id: phash ${got(id).toBinaryString} != mask ${masks(id.toInt).toBinaryString}") }
  }

  test("phash banding is lossless at Hamming <= 3 and a documented heuristic above") {
    val rng = new scala.util.Random(202L)
    // corpus of mutated masks: controlled small Hamming distances
    val base = Seq.fill(6)(rng.nextLong() & ~(1L << 63))
    val masks = (base ++ base.flatMap { m =>
      Seq.fill(2)(m ^ (0 until (1 + rng.nextInt(3)))
        .map(_ => 1L << rng.nextInt(63)).reduce(_ | _))
    }).distinct
    val docs = masks.zipWithIndex.map { case (m, i) => (i.toLong, maskDoc(m)) }
    val df = spark.createDataFrame(docs).toDF("doc_id", "text")
    val got3 = Dedup.phashPairs(df, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want3 = (for {
      (a, ma) <- masks.zipWithIndex.map(_.swap); (b, mb) <- masks.zipWithIndex.map(_.swap)
      if a < b
      h = java.lang.Long.bitCount(ma ^ mb).toLong if h <= 3
    } yield (a.toLong, b.toLong) -> h).toMap
    assert(got3 == want3, s"lossless boundary: missing ${(want3.keySet -- got3.keySet).take(5)}, " +
      s"spurious ${(got3.keySet -- want3.keySet).take(5)}")

    // above 3 the chunk join is a recall heuristic, pinned from both sides:
    // 4 flips confined to one chunk ARE found; 4 flips spread across all
    // four chunks share no chunk and are NOT (the documented tradeoff)
    val boundary = Seq(
      (100L, maskDoc(0L)),
      (101L, maskDoc(1L | (1L << 1) | (1L << 2) | (1L << 3))), // 4 bits, chunk 0
      (200L, maskDoc(1L << 5)),
      (201L, maskDoc((1L << 5) ^ (1L | (1L << 16) | (1L << 32) | (1L << 48)))))
    val bdf = spark.createDataFrame(boundary).toDF("doc_id", "text")
    val pairs6 = Dedup.phashPairs(bdf, "doc_id", "text", maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs6.contains((100L, 101L)), "4 flips in one chunk must be found")
    assert(!pairs6.contains((200L, 201L)),
      "4 flips spread over all chunks share no chunk — the heuristic boundary moved, update the scaladoc")
  }

  test("salted join equals the plain inner join with exact multiplicities, any fan-out") {
    for (seed <- Seq(31L, 77L); n <- Seq(1, 3, 8)) {
      val rng = new scala.util.Random(seed)
      // one hot key carrying most facts (the case salting exists for),
      // duplicate fact rows (multiplicities), duplicate dim keys (fan-out)
      val facts = (0 until 300).map { _ =>
        (if (rng.nextInt(10) < 7) 1 else rng.nextInt(6), rng.nextInt(20))
      }
      val dims = (0 until 6).map(k => (k, s"d$k")) ++ Seq((1, "d1-b"), (3, "d3-b"))
      val f = spark.createDataFrame(facts).toDF("k", "v").repartition(1 + rng.nextInt(8))
      val d = spark.createDataFrame(dims).toDF("k", "tag")

      def multiset(rows: Array[org.apache.spark.sql.Row]) =
        rows.map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSeq
          .groupBy(identity).view.mapValues(_.size).toMap

      val got = multiset(Skew.saltedJoin(f, d, "k", n).collect())
      val want = multiset(f.join(d, Seq("k")).collect())
      assert(got == want, s"seed=$seed n=$n: multiset mismatch")
    }
  }
}
