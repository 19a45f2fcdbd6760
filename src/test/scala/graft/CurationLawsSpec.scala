package graft

import org.apache.spark.sql.functions._

/** Randomized differentials for the curation-tier trainers whose rounds
  * feed back into the next round's plan (the iterative-driver shape) —
  * a wrong merge choice or a wrong merge APPLICATION compounds across
  * rounds, and the gate corpus exercises one vocabulary only.
  */
class CurationLawsSpec extends SparkSpec {

  /** Sequential BPE trainer — same contract, independent implementation:
    * adjacent-pair counts weighted by word frequency, argmax by
    * (count desc, pair asc), merge applied with Java's left-to-right
    * non-overlapping String.replace on the sentinel-padded spaced string
    * (scanning continues AFTER each replacement — "a a a a" → "aa a a",
    * NOT the list-walk "aa aa"; the planted run word pins this convention). */
  private def refBpe(words: Seq[(String, Long)], rounds: Int): Set[(Long, String, Long)] = {
    var vocab = words.map { case (w, f) => (w.toCharArray.mkString(" "), f) }
    val out = Set.newBuilder[(Long, String, Long)]
    for (round <- 1 to rounds) {
      val counts = vocab.flatMap { case (sym, f) =>
        val toks = sym.split(" ")
        if (toks.length < 2) Nil
        else toks.sliding(2).map(p => (p.mkString(" "), f)).toSeq
      }.groupBy(_._1).map { case (p, xs) => (p, xs.map(_._2).sum) }.toSeq
        .sortBy { case (p, c) => (-c, p) }
      val top = counts.head._1
      out ++= counts.take(5).map { case (p, c) => (round.toLong, p, c) }
      val merged = top.replace(" ", "")
      vocab = vocab.map { case (sym, f) =>
        ((" " + sym + " ").replace(" " + top + " ", " " + merged + " ").trim, f)
      }
    }
    out.result()
  }

  test("BPE trainer rounds equal the sequential reference on random vocabularies") {
    for (seed <- Seq(3L, 59L); rounds <- Seq(2, 4)) {
      val rng = new scala.util.Random(seed)
      val alpha = "abc"
      val randomWords = (0 until 30).map(_ =>
        Seq.fill(2 + rng.nextInt(7))(alpha(rng.nextInt(alpha.length))).mkString)
      // the planted heavy run word forces a run-char pair to win a round,
      // pinning the replace-scan convention against the list-walk variant
      val words = (randomWords :+ "aaaa").distinct
        .map(w => (w, 1L + rng.nextInt(9)))
        .map { case (w, f) => if (w == "aaaa") (w, 50L) else (w, f) }
      val want = refBpe(words, rounds)
      import spark.implicits._
      val vocab0 = words.toDF("word", "wfreq")
        .select(trim(array_join(split(col("word"), ""), " ")).as("sym"), col("wfreq"))
      val got = graft.queries.Curation.bpeTrainRounds(vocab0, rounds)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got == want, s"seed=$seed rounds=$rounds: " +
        s"missing ${(want -- got).take(5)}, spurious ${(got -- want).take(5)}")
    }
  }
}
