package graft

import graft.streaming.Sessions
import graft.streaming.Sessions.{Event, Session}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Randomized-epoch law for streaming sessionization.
  *
  * StreamingSpec feeds each operator ONE micro-batch, so session state
  * never survives an epoch boundary — but state carried across batches is
  * precisely what a production stream exercises on every trigger. Here a
  * random event sequence is split at random epoch boundaries (1..5
  * micro-batches, watermark advancing between them; global timestamps
  * strictly increasing so nothing is late-dropped), and:
  *
  *  - the native session_window aggregation over the stream must equal its
  *    own batch form on the full data, whatever the split;
  *  - the custom flatMapGroupsWithState sessionizer must equal a direct
  *    Scala transcription of its contract (sort per user, close when the
  *    gap strictly exceeds 30 min, duration = last − first) — sessions
  *    split across epochs must merge through the carried state, and
  *    sessions closed by the event-time timeout must equal gap-closed
  *    ones.
  */
class StreamingLawsSpec extends SparkSpec {

  private def ts(minutes: Long): java.sql.Timestamp =
    new java.sql.Timestamp((minutes + 600) * 60 * 1000)

  private val GapUs = 30L * 60 * 1000000

  private def refSessions(evts: Seq[Event]): Set[(Long, Long, Long, Long)] =
    evts.groupBy(_.user_id).toSeq.flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e.ts.getTime, e.event_id))
      val sessions = sorted.foldLeft(List.empty[List[Event]]) {
        case (Nil, e) => List(List(e))
        case (cur :: done, e) =>
          if ((e.ts.getTime - cur.head.ts.getTime) * 1000 <= GapUs) (e :: cur) :: done
          else List(e) :: cur :: done
      }
      sessions.map { s =>
        val first = s.last; val last = s.head // lists are built reversed
        (u, first.ts.getTime, s.size.toLong, (last.ts.getTime - first.ts.getTime) * 1000)
      }
    }.toSet

  test("random epoch splits: streaming dedup keeps exactly the global first occurrences") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    for (seed <- Seq(7L, 301L)) {
      val rng = new scala.util.Random(seed)
      val pool = (0 until 15).map(i =>
        Seq.fill(4)(s"w${rng.nextInt(30)}").mkString(" ")).distinct
      // strictly increasing minute steps keep every duplicate well inside
      // the 1-hour watermark horizon (state never evicts mid-corpus) and
      // nothing late
      val docs = (0 until 50).map(i =>
        (i.toLong, pool(rng.nextInt(pool.size)), ts(i.toLong)))
      val cuts = Seq.fill(rng.nextInt(4))(1 + rng.nextInt(docs.size - 1)).distinct.sorted
      val bounds = (0 +: cuts) :+ docs.size
      val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
      val q = Sessions
        .streamingDedup(mem.toDF().toDF("doc_id", "text", "ts"), "doc_id", "text", "ts")
        .writeStream.format("memory").queryName(s"law_dedup_$seed")
        .outputMode(OutputMode.Append()).start()
      bounds.zip(bounds.tail).foreach { case (a, b) =>
        mem.addData(docs.slice(a, b): _*); q.processAllAvailable()
      }
      q.stop()
      val got = spark.table(s"law_dedup_$seed")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val want = docs.groupBy(_._2).values.map(_.map(_._1).min).toSet
      assert(got == want, s"seed=$seed: kept $got want $want")
    }
  }

  test("random epoch splits: streaming anomalies equal the single-pass transcription") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    for (seed <- Seq(19L, 407L)) {
      val rng = new scala.util.Random(seed)
      // values mostly small with occasional spikes so anomalies genuinely
      // fire once the per-user history passes minHist
      val events = (0 until 80).map { i =>
        val v = if (rng.nextInt(6) == 0) 40.0 + rng.nextInt(50) else 1.0 + rng.nextInt(5)
        Event(1L + rng.nextInt(3), i.toLong, ts(i.toLong), v)
      }
      val cuts = Seq.fill(rng.nextInt(4))(1 + rng.nextInt(events.size - 1)).distinct.sorted
      val bounds = (0 +: cuts) :+ events.size
      val mem = MemoryStream[Event]
      val q = Sessions.streamingAnomalies(mem.toDS())
        .writeStream.format("memory").queryName(s"law_anom_$seed")
        .outputMode(OutputMode.Append()).start()
      bounds.zip(bounds.tail).foreach { case (a, b) =>
        mem.addData(events.slice(a, b): _*); q.processAllAvailable()
      }
      q.stop()
      val got = spark.table(s"law_anom_$seed").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4))).toSet
      // transcription: per user in (ts, event_id) order, running (n, cents)
      val want = events.groupBy(_.user_id).toSeq.flatMap { case (u, es) =>
        var n = 0L; var sum = 0L
        es.sortBy(e => (e.ts.getTime, e.event_id)).flatMap { e =>
          val cents = math.round(e.value * 100)
          val hit = if (n >= 5 && cents * n > 3 * sum)
            Some((u, e.event_id, n, sum / math.max(n, 1L))) else None
          n += 1; sum += cents
          hit
        }
      }.toSet
      assert(got == want, s"seed=$seed: missing ${(want -- got).take(3)}, spurious ${(got -- want).take(3)}")
    }
  }

  test("random epoch splits: incremental CDC apply equals the global latest-per-key") {
    // CdcApply.applyBatch's correctness across triggers is the fold lemma
    // latest(latest(A) ∪ B) == latest(A ∪ B) — true only because the order
    // is TOTAL (the contract tells callers to add tiebreakers). Random
    // change logs with deliberately DUPLICATED seq numbers per key (the
    // unique change id breaks the tie) are folded over random micro-batch
    // splits and compared row-for-row against the one-shot reference.
    import spark.implicits._
    for (seed <- Seq(13L, 89L, 211L)) {
      val rng = new scala.util.Random(seed)
      val ops = Seq("I", "U", "D")
      val changes = (0 until 60).map { cid =>
        (rng.nextInt(10).toLong, rng.nextInt(8).toLong, cid.toLong,
          ops(rng.nextInt(3)), rng.nextInt(1000).toLong)
      }
      val cuts = Seq.fill(rng.nextInt(4))(1 + rng.nextInt(changes.size - 1)).distinct.sorted
      val bounds = (0 +: cuts) :+ changes.size
      val order = Seq("seq" -> false, "cid" -> false)
      val state = bounds.zip(bounds.tail).foldLeft(Option.empty[org.apache.spark.sql.DataFrame]) {
        case (st, (a, b)) =>
          Some(graft.streaming.CdcApply.applyBatch(st,
            changes.slice(a, b).toDF("k", "seq", "cid", "op", "payload"),
            Seq("k"), order))
      }.get
      val got = state.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4))).toSet
      val want = changes.groupBy(_._1).values
        .map(_.maxBy { case (_, seq, cid, _, _) => (seq, cid) }).toSet
      assert(got == want, s"seed=$seed epochs=${bounds.size - 1}: " +
        s"missing ${(want -- got).take(3)}, spurious ${(got -- want).take(3)}")
    }
  }

  test("random epoch splits: stream-stream interval join equals batch and the pair reference") {
    // Matches can span epochs (a click in a later micro-batch joining an
    // impression buffered in join state from an earlier one) — the case the
    // single-batch spec never exercises. Globally increasing timestamps
    // keep every valid match inside the 30-min watermark horizon by
    // construction (a click at t only matches impressions ≥ t−15min, and
    // the watermark trails max-event-time by 30min).
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    var anyCross = false
    for (seed <- Seq(11L, 203L)) {
      val rng = new scala.util.Random(seed)
      val evts = (0 until 50).map { i =>
        (1L + rng.nextInt(3), 100L + i, ts(i.toLong * 2), rng.nextBoolean())
      } // (user, id, ts, isClick)
      val cuts = Seq.fill(rng.nextInt(4))(1 + rng.nextInt(evts.size - 1)).distinct.sorted
      val bounds = (0 +: cuts) :+ evts.size
      val memL = MemoryStream[(Long, Long, java.sql.Timestamp)]
      val memR = MemoryStream[(Long, Long, java.sql.Timestamp)]
      val q = Sessions.intervalJoin(
          memL.toDF().toDF("user_id", "imp_id", "ts"),
          memR.toDF().toDF("user_id", "click_id", "click_ts"),
          keys = Seq("user_id"), leftTs = "ts", rightTs = "click_ts")
        .select(col("imp_id"), col("click_id"))
        .writeStream.format("memory").queryName(s"law_ivj_$seed")
        .outputMode(OutputMode.Append()).start()
      bounds.zip(bounds.tail).foreach { case (a, b) =>
        val slice = evts.slice(a, b)
        memL.addData(slice.collect { case (u, id, t, false) => (u, id, t) }: _*)
        memR.addData(slice.collect { case (u, id, t, true) => (u, id, t) }: _*)
        q.processAllAvailable()
      }
      q.stop()
      val got = spark.table(s"law_ivj_$seed")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        (u1, imp, t1, f1) <- evts if !f1
        (u2, click, t2, f2) <- evts if f2
        if u1 == u2 && t2.getTime >= t1.getTime && t2.getTime <= t1.getTime + 15 * 60 * 1000
      } yield (imp, click)).toSet
      assert(got == want, s"seed=$seed epochs=${bounds.size - 1}: " +
        s"missing ${(want -- got).take(5)}, spurious ${(got -- want).take(5)}")
      // teeth bookkeeping: a match crossing an epoch boundary is the case
      // the single-batch spec never exercises
      val epochOf = evts.zipWithIndex.map { case (e, i) =>
        e._2 -> bounds.tail.indexWhere(i < _)
      }.toMap
      anyCross ||= (for {
        (u1, imp, t1, f1) <- evts if !f1
        (u2, click, t2, f2) <- evts if f2
        if u1 == u2 && t2.getTime >= t1.getTime &&
          t2.getTime <= t1.getTime + 15 * 60 * 1000 && epochOf(imp) != epochOf(click)
      } yield (imp, click)).nonEmpty
    }
    assert(anyCross, "no seed produced a cross-epoch match; corpus drifted")
  }

  test("random epoch splits: watermarked windowed aggregation equals the reference") {
    // Window state accumulates across micro-batches until the watermark
    // closes the window; integer-valued doubles make the per-window average
    // order-independent (exact sum), so stream == batch == reference
    // exactly, whatever the split.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    for (seed <- Seq(17L, 401L)) {
      val rng = new scala.util.Random(seed)
      val types = Seq("view", "click", "buy")
      val rows = (0 until 60).map { i =>
        (ts(i.toLong * 7), types(rng.nextInt(3)), rng.nextInt(10).toDouble)
      }
      val cuts = Seq.fill(rng.nextInt(4))(1 + rng.nextInt(rows.size - 1)).distinct.sorted
      val bounds = (0 +: cuts) :+ rows.size
      val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
      val q = Sessions.windowedTypeCounts(mem.toDF().toDF("ts", "event_type", "value"))
        .writeStream.format("memory").queryName(s"law_wagg_$seed")
        .outputMode(OutputMode.Append()).start()
      bounds.zip(bounds.tail).foreach { case (a, b) =>
        mem.addData(rows.slice(a, b): _*); q.processAllAvailable()
      }
      mem.addData((ts(1000000L), "sentinel", 0.0)); q.processAllAvailable() // flush all windows
      q.stop()
      val got = spark.table(s"law_wagg_$seed").filter(col("event_type") =!= "sentinel")
        .collect().map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val hourMs = 3600L * 1000
      val want = rows.groupBy { case (t, typ, _) => (t.getTime / hourMs * hourMs, typ) }
        .map { case ((w, typ), xs) =>
          val n = xs.size.toLong
          (w, typ, n, new java.math.BigDecimal(java.lang.Double.toString(
            xs.map(_._3).sum / n)).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue())
        }.toSet
      assert(got == want, s"seed=$seed epochs=${bounds.size - 1}: " +
        s"missing ${(want -- got).take(5)}, spurious ${(got -- want).take(5)}")
    }
  }

  test("random epoch splits: both sessionizers match batch/reference semantics") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    for (seed <- Seq(43L, 911L)) {
      val rng = new scala.util.Random(seed)
      // strictly increasing global minutes: an event equal to the advanced
      // watermark would be late-dropped, which batch mode never does
      val minutes = rng.shuffle((0 until 2000).toList).take(60).sorted
      val events = minutes.zipWithIndex.map { case (m, i) =>
        Event(1L + rng.nextInt(4), i.toLong, ts(m.toLong), rng.nextInt(10).toDouble)
      }
      val cuts = Seq.fill(rng.nextInt(4))(1 + rng.nextInt(events.size - 1)).distinct.sorted
      val bounds = (0 +: cuts) :+ events.size
      val chunks = bounds.zip(bounds.tail).map { case (a, b) => events.slice(a, b) }

      val memW = MemoryStream[Event]
      val qw = Sessions.sessionWindowAgg(memW.toDF(), watermark = Some("0 seconds"))
        .writeStream.format("memory").queryName(s"law_winagg_$seed")
        .outputMode(OutputMode.Append()).start()
      val memS = MemoryStream[Event]
      val qs = Sessions.sessionizeStateful(memS.toDS())
        .writeStream.format("memory").queryName(s"law_stateful_$seed")
        .outputMode(OutputMode.Append()).start()

      chunks.foreach { c =>
        memW.addData(c: _*); memS.addData(c: _*)
        qw.processAllAvailable(); qs.processAllAvailable()
      }
      // sentinel advances the watermark past every open session
      val sentinel = Event(99L, 9999L, ts(100000), 0.0)
      memW.addData(sentinel); memS.addData(sentinel)
      qw.processAllAvailable(); qs.processAllAvailable()
      qw.stop(); qs.stop()

      val streamedW = spark.table(s"law_winagg_$seed").filter(col("user_id") < 99)
        .select("user_id", "session_start", "n_events", "duration_us")
      val batchW = Sessions.sessionWindowAgg(events.toDF())
        .select("user_id", "session_start", "n_events", "duration_us")
      assert(streamedW.exceptAll(batchW).isEmpty && batchW.exceptAll(streamedW).isEmpty,
        s"seed=$seed epochs=${chunks.map(_.size)}: session_window stream != batch")

      val gotS = spark.table(s"law_stateful_$seed").as[Session].collect()
        .filter(_.user_id < 99)
        .map(s => (s.user_id, s.session_start.getTime, s.n_events, s.duration_us)).toSet
      val want = refSessions(events)
      assert(gotS == want, s"seed=$seed epochs=${chunks.map(_.size)}: stateful " +
        s"missing ${(want -- gotS).take(3)}, spurious ${(gotS -- want).take(3)}")
    }
  }
}
