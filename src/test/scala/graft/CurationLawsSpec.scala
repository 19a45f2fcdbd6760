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

  test("packBins equals the sequential start-offset packing reference, conserves tokens, and ignores input order") {
    import graft.queries.Curation
    for (seed <- Seq(5L, 71L, 20260815L)) {
      val rng = new scala.util.Random(seed)
      val budget = 50L + rng.nextInt(100)
      val langs = Seq("en", "zh", "de")
      // token counts span the regimes that matter: tiny docs, docs that
      // straddle a budget boundary, and GIANT docs bigger than the whole
      // budget (which must make following bin ids skip)
      val docs = (0 until (30 + rng.nextInt(60))).map { i =>
        val n = rng.nextInt(4) match {
          case 0 => 1L + rng.nextInt(5)
          case 3 => budget + 1L + rng.nextInt(200) // giant
          case _ => 1L + rng.nextInt(budget.toInt)
        }
        (i.toLong, langs(rng.nextInt(langs.size)), n)
      }

      // independent sequential reference: walk docs in id order per shard,
      // carrying the running start offset imperatively (no window algebra)
      val want = scala.collection.mutable.Map.empty[(String, Long), (Long, Long)]
      docs.groupBy(_._2).foreach { case (lang, ds) =>
        var off = 0L
        var lastTok = scala.collection.mutable.Map.empty[Long, Long]
        ds.sortBy(_._1).foreach { case (_, _, n) =>
          val bin = off / budget
          val (c, t) = want.getOrElse((lang, bin), (0L, 0L))
          want((lang, bin)) = (c + 1, t + n)
          lastTok(bin) = n
          off += n
        }
        // the packing contract: a bin overruns its budget only by its final
        // straddling doc — everything before the last doc fits the window
        want.foreach { case ((l, bin), (_, t)) =>
          if (l == lang) assert(t - lastTok(bin) < budget,
            s"seed=$seed: bin ($l,$bin) holds $t tokens with last doc ${lastTok(bin)} — " +
              s"non-straddling overrun past budget $budget")
        }
      }

      val df = spark.createDataFrame(docs).toDF("doc_id", "lang", "n_tok")
      for (parts <- Seq(1, 7)) {
        // permuted row order + partitioning: the keyed window must re-sort
        val shuffled = spark.createDataFrame(rng.shuffle(docs))
          .toDF("doc_id", "lang", "n_tok").repartition(parts)
        val got = Curation.packBins(shuffled, budget)
          .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
          .toMap
        assert(got == want.toMap, s"seed=$seed parts=$parts budget=$budget: " +
          s"missing ${(want.toMap.toSet -- got.toSet).take(5)}, spurious ${(got.toSet -- want.toMap.toSet).take(5)}")
        // conservation: every shard's tokens land in exactly one bin each
        val totGot = got.groupBy(_._1._1).view.mapValues(_.values.map(_._2).sum)
        val totWant = docs.groupBy(_._2).view.mapValues(_.map(_._3).sum)
        assert(totGot.toMap == totWant.toMap)
      }
      val _ = df
    }
  }

  test("cutRepeatedSpans equals the sequential transcription on corpora with planted repeats") {
    import graft.queries.ModelPrep
    for ((seed, width) <- Seq((11L, 10), (43L, 3), (20260815L, 5))) {
      val rng = new scala.util.Random(seed)
      val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
        "eta", "theta", "iota", "kappa", "mu", "nu")
      def randTokens(n: Int): Vector[String] = Vector.fill(n)(words(rng.nextInt(words.size)))
      val plant = (0 until width).map(i => s"plant$i").toVector // one exact span
      val base = (0 until (10 + rng.nextInt(15))).map { i =>
        (i.toLong, randTokens(1 + rng.nextInt(4 * width)))
      }
      // plant the block GRID-ALIGNED in three docs (exact-span collision —
      // must be cut from all three) and MISALIGNED in one (a fixed
      // segmentation grid must NOT see it as a repeated span)
      val planted = base.map {
        case (id, t) if id <= 2 =>
          val pad = randTokens(width * (1 + rng.nextInt(2)))
          (id, pad ++ plant ++ t)
        case (id, t) if id == 3 =>
          (id, randTokens(1 + rng.nextInt(width - 1).max(0)) ++ plant ++ t)
        case other => other
      }
      val docs = planted.map { case (id, t) => (id, t.mkString(" ")) }

      // sequential transcription of the whole pipeline
      val segsPerDoc = docs.map { case (id, text) =>
        val t = text.trim.split("\\s+", -1).toVector
        val nSeg = math.ceil(t.size / width.toDouble).toInt
        id -> (0 until nSeg).map(i => t.slice(i * width, i * width + width).mkString(" "))
      }
      val cnt = segsPerDoc.flatMap(_._2).groupBy(identity).view.mapValues(_.size).toMap
      val want = segsPerDoc.map { case (id, ss) =>
        val nd = ss.count(cnt(_) >= 2)
        (id, ss.size.toLong, nd.toLong, nd.toDouble / ss.size,
          ss.filter(cnt(_) < 2).mkString(" "))
      }.toSet

      val df = spark.createDataFrame(docs).toDF("doc_id", "text").repartition(5)
      val got = ModelPrep.cutRepeatedSpans(df, width)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4)))
        .toSet
      assert(got == want, s"seed=$seed width=$width: " +
        s"missing ${(want -- got).take(3)}, spurious ${(got -- want).take(3)}")

      // teeth: the aligned plants were really cut; the misaligned one survived
      val plantSeg = plant.mkString(" ")
      val byId = got.map(r => r._1 -> r).toMap
      for (id <- 0L to 2L)
        assert(!byId(id)._5.contains(plantSeg) && byId(id)._3 >= 1,
          s"seed=$seed width=$width: aligned plant not cut from doc $id")
      assert(segsPerDoc.toMap.apply(3L).count(_ == plantSeg) == 0,
        s"seed=$seed width=$width: misaligned plant accidentally grid-aligned — weak corpus")
    }
  }

  test("BPE trainer stops gracefully when the vocabulary runs out of pairs") {
    import graft.queries.Curation
    import spark.implicits._
    // two 2-symbol words: exactly two merges exist; a 5-round budget must
    // return the 2 completed rounds, not throw on the missing round-3 argmax
    val vocab = Seq(("a b", 3L), ("c d", 2L)).toDF("sym", "wfreq")
    val out = Curation.bpeTrainRounds(vocab, rounds = 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.nonEmpty && out.map(_._1).max == 2L,
      s"expected exactly 2 completed rounds, got ${out.toSeq}")
    assert(out.filter(_._1 == 1L).map(_._2).contains("a b"))
    // and a vocabulary that is ALL single symbols: zero rounds, empty result
    val singles = Seq(("a", 3L), ("b", 2L)).toDF("sym", "wfreq")
    val empty = Curation.bpeTrainRounds(singles, rounds = 3)
    assert(empty.columns.toSeq == Seq("round", "pair", "pair_count"))
    assert(empty.count() == 0L)
  }
}
