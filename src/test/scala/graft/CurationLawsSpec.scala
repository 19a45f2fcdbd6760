package graft

import org.apache.spark.sql.functions._

/** Randomized differentials for the curation-tier trainers whose rounds
  * feed back into the next round's plan (the iterative-driver shape) —
  * a wrong merge choice or a wrong merge APPLICATION compounds across
  * rounds, and the gate corpus exercises one vocabulary only — plus the
  * ordered funnel, whose strictly-after lemma only shows on tie-heavy,
  * out-of-order event logs.
  */
class CurationLawsSpec extends SparkSpec {

  test("N-stage funnel equals the sequential strictly-after reference on tie-heavy logs") {
    // The lemma: stage i's time is the min stage-i event STRICTLY AFTER
    // stage i−1's time — an event at exactly the previous stage's
    // timestamp must not advance the funnel, and out-of-order events never
    // count. A tiny timestamp domain (0..11) makes ties and reorders the
    // common case, and the 4th stage goes past the gate's 3.
    val stages = Seq("view", "click", "cart", "purchase")
    for (seed <- Seq(23L, 97L)) {
      val rng = new scala.util.Random(seed)
      val types = stages :+ "noise"
      val events = (0 until 160).map { _ =>
        (1L + rng.nextInt(12), types(rng.nextInt(types.size)), rng.nextInt(12).toLong)
      } ++ Seq(
        // planted strictness witness: user 99's only click is AT the view
        // time — strictly-after must stop the funnel at stage 1
        (99L, "view", 5L), (99L, "click", 5L),
        // planted reorder witness: user 98 reaches cart, but their only
        // purchase PRECEDES the funnel — out-of-order must not count
        (98L, "purchase", 0L), (98L, "view", 3L), (98L, "click", 4L), (98L, "cart", 5L))
      // sequential reference
      var reached: Map[Long, Long] = events.collect { case (u, t, ts) if t == stages.head => (u, ts) }
        .groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).min }
      val refTimes = Set.newBuilder[(Long, Long, Long)]
      reached.foreach { case (u, t) => refTimes += ((u, 1L, t)) }
      val refCounts = Seq.newBuilder[(String, Long, Long)]
      refCounts += ((stages.head, 1L, reached.size.toLong))
      for ((st, i) <- stages.zipWithIndex.drop(1)) {
        reached = reached.flatMap { case (u, prevT) =>
          val cands = events.collect { case (`u`, `st`, ts) if ts > prevT => ts }
          if (cands.isEmpty) None else Some(u -> cands.min)
        }
        reached.foreach { case (u, t) => refTimes += ((u, (i + 1).toLong, t)) }
        refCounts += ((stages.take(i + 1).mkString(">"), (i + 1).toLong, reached.size.toLong))
      }
      import spark.implicits._
      val df = events.toDF("user_id", "event_type", "ts")
      val gotTimes = graft.operators.Funnel.stageTimes(df, "user_id", "event_type", "ts", stages)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = refTimes.result()
      assert(gotTimes == want, s"seed=$seed: missing ${(want -- gotTimes).take(5)}, " +
        s"spurious ${(gotTimes -- want).take(5)}")
      val gotCounts = graft.operators.Funnel.counts(df, "user_id", "event_type", "ts", stages)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(gotCounts == refCounts.result().toSet, s"seed=$seed counts: got $gotCounts")
      // teeth: the planted witnesses must behave — user 99 stops at stage 1
      // (strictness), user 98's early purchase never counts (reorder)
      assert(gotTimes.contains((99L, 1L, 5L)) && !gotTimes.exists(r => r._1 == 99L && r._2 == 2L),
        "planted strictness witness advanced past stage 1")
      assert(gotTimes.contains((98L, 3L, 5L)) && !gotTimes.exists(r => r._1 == 98L && r._2 == 4L),
        "planted reorder witness mis-handled")
    }
  }

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
