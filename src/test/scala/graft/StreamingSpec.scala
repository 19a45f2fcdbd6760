package graft

import graft.streaming.Sessions
import graft.streaming.Sessions.{Event, Session}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Structured Streaming: sessionization + windowed aggregation over a
  * MemoryStream, checked against the equivalent batch computation. */
class StreamingSpec extends SparkSpec {

  // offset from epoch so no event sits at the initial watermark (ts <=
  // watermark counts as late and is dropped by stateful operators)
  private def ts(minutes: Long): java.sql.Timestamp =
    new java.sql.Timestamp((minutes + 600) * 60 * 1000)

  private val eventData = Seq(
    // user 1: two sessions (gap > 30 min between minute 40 and 100)
    Event(1L, 1L, ts(0), 1.0), Event(1L, 2L, ts(10), 2.0), Event(1L, 3L, ts(40), 3.0),
    Event(1L, 4L, ts(100), 4.0), Event(1L, 5L, ts(110), 5.0),
    // user 2: one session
    Event(2L, 6L, ts(5), 1.5), Event(2L, 7L, ts(20), 2.5))

  test("session_window agg on a stream matches the batch result") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(eventData: _*)

    val q = Sessions.sessionWindowAgg(mem.toDF(), watermark = Some("0 seconds"))
      .writeStream.format("memory").queryName("sessions_stream")
      .outputMode(OutputMode.Append()).start()
    // watermark only advances on a subsequent batch; push a late sentinel
    mem.addData(Event(99L, 999L, ts(100000), 0.0))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("sessions_stream")
      .filter(col("user_id") < 99)
      .select("user_id", "session_start", "n_events", "duration_us")
    val batch = Sessions.sessionWindowAgg(eventData.toDF())
      .select("user_id", "session_start", "n_events", "duration_us")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    assert(batch.count() == 3)
  }

  test("stateful sessionization emits gap-closed and timeout-closed sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(eventData: _*)

    val q = Sessions.sessionizeStateful(mem.toDS())
      .writeStream.format("memory").queryName("stateful_sessions")
      .outputMode(OutputMode.Append()).start()
    mem.addData(Event(99L, 999L, ts(100000), 0.0)) // advance watermark
    q.processAllAvailable()
    q.stop()

    val got = spark.table("stateful_sessions").as[Session].collect()
      .filter(_.user_id < 99).sortBy(s => (s.user_id, s.session_start.getTime))
    assert(got.map(s => (s.user_id, s.n_events, s.duration_us)).toSeq == Seq(
      (1L, 3L, 40L * 60 * 1000000),
      (1L, 2L, 10L * 60 * 1000000),
      (2L, 2L, 15L * 60 * 1000000)))
  }

  test("streaming dedup keeps one row per content hash within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    mem.addData(
      (1L, "the same text", ts(1)),
      (2L, "the same text", ts(2)),   // dup of 1 (same normalized hash)
      (3L, "different text", ts(3)))

    val q = graft.streaming.Sessions
      .streamingDedup(mem.toDF().toDF("doc_id", "text", "ts"), "doc_id", "text", "ts")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    q.stop()

    val got = spark.table("dedup_stream").select("doc_id")
      .as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 3L))
  }

  test("stream-stream interval join matches the batch join and drops out-of-window rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // impressions on user 1 and 2; clicks within/outside the 15-minute bound
    val impressions = Seq(
      Event(1L, 100L, ts(0), 0.0), Event(2L, 200L, ts(5), 0.0))
    val clicks = Seq(
      Event(1L, 101L, ts(10), 1.0),  // within 15 min of impression 100 -> joins
      Event(1L, 102L, ts(30), 1.0),  // 30 min after -> outside bound
      Event(2L, 201L, ts(4), 1.0))   // before the impression -> no join
    val memL = MemoryStream[Event]; memL.addData(impressions: _*)
    val memR = MemoryStream[Event]; memR.addData(clicks: _*)

    val q = Sessions.intervalJoin(
        memL.toDF().select(col("user_id"), col("event_id").as("imp_id"), col("ts")),
        memR.toDF().select(col("user_id"), col("event_id").as("click_id"),
          col("ts").as("click_ts")),
        keys = Seq("user_id"), leftTs = "ts", rightTs = "click_ts")
      .select(col("imp_id"), col("click_id"))
      .writeStream.format("memory").queryName("sj_stream")
      .outputMode(OutputMode.Append()).start()
    memL.addData(Event(99L, 999L, ts(100000), 0.0))
    memR.addData(Event(99L, 998L, ts(100000), 0.0))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("sj_stream").filter(col("imp_id") < 999)
      .select("imp_id", "click_id").as[(Long, Long)].collect().toSet
    assert(streamed === Set((100L, 101L)))
    // batch parity: same operator over static frames
    val batch = Sessions.intervalJoin(
        impressions.toDF().select(col("user_id"), col("event_id").as("imp_id"), col("ts")),
        clicks.toDF().select(col("user_id"), col("event_id").as("click_id"),
          col("ts").as("click_ts")),
        keys = Seq("user_id"), leftTs = "ts", rightTs = "click_ts")
      .select("imp_id", "click_id").as[(Long, Long)].collect().toSet
    assert(batch === streamed)
  }

  test("watermarked windowed aggregation over a stream matches batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val toDf = (df: org.apache.spark.sql.DataFrame) =>
      df.toDF("ts", "event_type", "value")
    val rows = Seq(
      (ts(1), "click", 1.0), (ts(2), "view", 2.0), (ts(30), "click", 3.0),
      (ts(61), "view", 4.0), (ts(62), "click", 5.0))
    mem.addData(rows: _*)

    val q = Sessions.windowedTypeCounts(toDf(mem.toDF()))
      .writeStream.format("memory").queryName("win_stream")
      .outputMode(OutputMode.Append()).start()
    mem.addData((ts(100000), "late", 0.0))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("win_stream").filter(col("event_type") =!= "late")
    val batch = Sessions.windowedTypeCounts(toDf(rows.toDF()))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    assert(batch.count() == 4) // (h0: click x2, view x1... h1: view, click) => 4 groups
  }

  test("stream-static join enriches a stream against a dimension table") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the canonical dimension-enrichment shape: the static side is planned
    // per micro-batch (broadcast under AQE for a dim this small), the stream
    // side never buffers state — no watermark needed for stream-static
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val mem = MemoryStream[Event]
    mem.addData(eventData: _*)
    val q = mem.toDF().join(dim, Seq("user_id"))
      .select(col("user_id"), col("event_id"), col("tier"))
      .writeStream.format("memory").queryName("enrich_stream")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("enrich_stream")
      .as[(Long, Long, String)].collect().toSet
    val batch = eventData.toDF().join(dim, Seq("user_id"))
      .select(col("user_id"), col("event_id"), col("tier"))
      .as[(Long, Long, String)].collect().toSet
    assert(streamed === batch && streamed.size == 7)
  }

  test("windowed term counts over a document stream match batch") {
    import Sessions.TimedDoc
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      TimedDoc(1L, ts(1), "the quick fox"),
      TimedDoc(2L, ts(20), "the lazy dog"),
      TimedDoc(3L, ts(70), "the fox again")) // second hour window
    val mem = MemoryStream[TimedDoc]
    mem.addData(docs: _*)

    val q = Sessions.windowedTermCounts(mem.toDF())
      .writeStream.format("memory").queryName("terms_stream")
      .outputMode(OutputMode.Append()).start()
    mem.addData(TimedDoc(99L, ts(100000), "late"))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("terms_stream").filter(col("term") =!= "late")
    val batch = Sessions.windowedTermCounts(docs.toDF())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    // "the" counts twice in window 0, once in window 1
    val the = batch.filter(col("term") === "the")
      .select(col("n")).as[Long].collect().sorted.toSeq
    assert(the === Seq(1L, 2L))
  }

  test("CDC apply maintains latest-per-key state across incremental batches") {
    import graft.streaming.CdcApply
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val statePath =
      java.nio.file.Files.createTempDirectory("graft_cdc").resolve("state").toString
    val keys = Seq("id")
    val order = Seq("seq" -> false) // highest seq wins

    val mem = MemoryStream[(Long, Long, String)]
    def changes = mem.toDF().toDF("id", "seq", "value")

    // batch 1: initial upserts, including an in-batch supersede for id=1
    mem.addData((1L, 1L, "a"), (2L, 1L, "b"), (1L, 2L, "c"))
    CdcApply.start(changes, statePath, keys, order).awaitTermination()
    val s1 = CdcApply.currentState(spark, statePath).get
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(s1 == Seq((1L, 2L, "c"), (2L, 1L, "b")))

    // batch 2 (restart from checkpoint): update id=2, insert id=3
    mem.addData((2L, 2L, "d"), (3L, 1L, "e"))
    CdcApply.start(changes, statePath, keys, order).awaitTermination()
    val s2 = CdcApply.currentState(spark, statePath).get
    val expected = CdcApply.latestPerKey(
      Seq((1L, 1L, "a"), (2L, 1L, "b"), (1L, 2L, "c"), (2L, 2L, "d"), (3L, 1L, "e"))
        .toDF("id", "seq", "value"), keys, order)
    assert(s2.exceptAll(expected).isEmpty && expected.exceptAll(s2).isEmpty)
    assert(s2.count() == 3)
  }

  test("streaming anomaly detection matches the sequential batch replay across microbatches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // user 1 establishes a mean around 2 then spikes; user 2 never spikes
    val b1 = Seq(
      Event(1L, 1L, ts(0), 2.0), Event(1L, 2L, ts(1), 2.2), Event(1L, 3L, ts(2), 1.8),
      Event(1L, 4L, ts(3), 2.1), Event(1L, 5L, ts(4), 1.9),
      Event(2L, 11L, ts(0), 5.0), Event(2L, 12L, ts(1), 5.5))
    val b2 = Seq(
      Event(1L, 6L, ts(5), 50.0),  // 25x the running mean → anomaly
      Event(1L, 7L, ts(6), 2.0),   // back to normal (mean moved only slightly)
      Event(2L, 13L, ts(2), 6.0),  // within 3x → quiet
      Event(2L, 14L, ts(3), 5.2), Event(2L, 15L, ts(4), 4.8),
      Event(2L, 16L, ts(5), 5.1))
    val mem = MemoryStream[Event]
    mem.addData(b1: _*)
    val q = Sessions.streamingAnomalies(mem.toDS())
      .writeStream.format("memory").queryName("anomalies_stream")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    mem.addData(b2: _*) // state must carry across microbatches
    q.processAllAvailable()
    q.stop()
    val got = spark.table("anomalies_stream")
      .select("user_id", "event_id", "n_hist").as[(Long, Long, Long)]
      .collect().toSet
    // sequential replay: only user 1's spike (event 6) fires, with 5 rows of history
    assert(got === Set((1L, 6L, 5L)))
  }
}
