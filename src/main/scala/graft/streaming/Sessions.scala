package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming operators for event pipelines.
  *
  * The reference is batch-only (SURVEY.md §2.11) — this module is the
  * beyond-parity streaming surface a training-data pipeline needs, built on
  * Structured Streaming so the same code runs incrementally at cluster
  * scale: state is partitioned by group key, watermarks bound state size,
  * and every transform here also executes as a plain batch plan (the specs
  * assert streaming output == the batch equivalent).
  */
object Sessions {

  /** Input event shape (ts = event-time timestamp). */
  case class Event(user_id: Long, event_id: Long, ts: java.sql.Timestamp, value: Double)

  /** Finalized session. */
  case class Session(user_id: Long, session_start: java.sql.Timestamp,
                     n_events: Long, duration_us: Long)

  /** Per-user open-session state (public: encoder codegen constructs it). */
  case class SessionState(startUs: Long, lastUs: Long, n: Long)

  /** Gap-based sessionization with Spark's native session window — the
    * idiomatic formulation; works identically over batch and streams (with
    * the watermark bounding open-session state in streaming mode). */
  def sessionWindowAgg(events: DataFrame, gap: String = "30 minutes",
                       watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(w => events.withWatermark("ts", w))
    src.groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"),
        (unix_micros(max(col("ts"))) - unix_micros(min(col("ts")))).as("duration_us"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"), col("duration_us"))
  }

  /** Custom-state sessionization via flatMapGroupsWithState (the
    * KeyValueGroupedDataset path for semantics session_window can't
    * express). Emits a session when a new event arrives more than `gapUs`
    * after the previous one, or when the event-time watermark passes the
    * open session (timeout). State per user is O(1). */
  def sessionizeStateful(events: Dataset[Event], gapUs: Long = 30L * 60 * 1000000,
                         watermark: String = "0 seconds"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._

    def tsUs(t: java.sql.Timestamp): Long = t.getTime * 1000

    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(userId, new java.sql.Timestamp(s.startUs / 1000),
              s.n, s.lastUs - s.startUs))
          } else {
            // Events within a micro-batch may arrive unordered; sort by time.
            val sorted = rows.toSeq.sortBy(e => (tsUs(e.ts), e.event_id))
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val us = tsUs(e.ts)
              cur match {
                case Some(s) if us - s.lastUs <= gapUs =>
                  cur = Some(s.copy(lastUs = us, n = s.n + 1))
                case Some(s) =>
                  closed ::= Session(userId, new java.sql.Timestamp(s.startUs / 1000),
                    s.n, s.lastUs - s.startUs)
                  cur = Some(SessionState(us, us, 1))
                case None =>
                  cur = Some(SessionState(us, us, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // Close the open session once the watermark passes last + gap.
              state.setTimeoutTimestamp((s.lastUs + gapUs) / 1000 + 1)
            }
            closed.reverseIterator
          }
      }
  }

  /** Streaming exact dedup: first occurrence of each content hash wins,
    * with the watermark bounding the dedup state (duplicates arriving
    * within the watermark horizon are dropped; later state is evicted) —
    * the streaming form of Dedup.exact for continuous ingestion. */
  def streamingDedup(docs: DataFrame, idCol: String, textCol: String,
                     tsCol: String, watermark: String = "1 hour"): DataFrame =
    docs.withColumn("content_hash",
      md5(graft.functions.TextFunctions.normalize(col(textCol))
        .cast(org.apache.spark.sql.types.BinaryType)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Watermarked tumbling-window aggregation: events per type per window.
    * The canonical readStream → agg → writeStream shape. */
  def windowedTypeCounts(events: DataFrame, window_ : String = "1 hour",
                         watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(avg(col("value")), 6).as("avg_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n_events"), col("avg_value"))

  /** Watermarked windowed term counts over a document stream — the streaming
    * form of the corpus term statistic behind `txt_topterms`/
    * `txt_heavyhitters` (per-window vocabulary counts for drift monitoring).
    * State is one counter per (window, term), evicted when the watermark
    * passes the window end; identical code path runs in batch
    * (spec-asserted stream == batch). */
  def windowedTermCounts(docs: DataFrame, window_ : String = "1 hour",
                         watermark: String = "10 minutes"): DataFrame = {
    import graft.functions.TextFunctions
    val in = if (docs.isStreaming) docs.withWatermark("ts", watermark) else docs
    in.select(col("ts"),
        explode(TextFunctions.tokens(TextFunctions.normalize(col("text")))).as("term"))
      .groupBy(window(col("ts"), window_), col("term"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("term"), col("n"))
  }

  /** Document-stream row for the streaming term-count spec. */
  case class TimedDoc(doc_id: Long, ts: java.sql.Timestamp, text: String)

  /** Running-stats state for streaming anomaly detection (exact cents). */
  case class AnomState(n: Long, sumCents: Long)
  /** An emitted anomaly: the event plus the history it deviated from. */
  case class Anomaly(user_id: Long, event_id: Long, value: Double,
                     n_hist: Long, mean_x100: Long)

  /** Streaming threshold-anomaly detection via mapGroupsWithState-style
    * custom state: per key a running (n, Σ cents) pair — O(1) state, exact
    * integer arithmetic — and any event whose value exceeds `factor`× the
    * running mean of its predecessors is emitted with the history snapshot.
    * The deviation test value·n > factor·Σ is cleared of the division, so
    * stream and batch replays agree bit-for-bit (spec-asserted). The
    * continuous form of the batch evt_anomaly screen for live ingest. */
  def streamingAnomalies(events: Dataset[Event], factor: Long = 3,
                         minHist: Long = 5): Dataset[Anomaly] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[AnomState, Anomaly](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[AnomState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var s = state.getOption.getOrElse(AnomState(0L, 0L))
          val out = scala.collection.mutable.ListBuffer.empty[Anomaly]
          sorted.foreach { e =>
            val cents = math.round(e.value * 100)
            // value/1 > factor · (sum/n)  ⇔  cents · n > factor · sumCents
            if (s.n >= minHist && cents * s.n > factor * s.sumCents)
              out += Anomaly(userId, e.event_id, e.value, s.n,
                s.sumCents / math.max(s.n, 1L))
            s = AnomState(s.n + 1, s.sumCents + cents)
          }
          state.update(s)
          out.iterator
      }
  }

  /** Watermarked stream-stream interval join: each left row pairs with the
    * right rows sharing its keys whose timestamp lands in
    * [left ts, left ts + within]. The watermark plus the time-range
    * condition bound BOTH sides' join state (Spark evicts a buffered row
    * once no future input can match it), so state is O(rate × horizon) per
    * key — the shape that survives unbounded streams. Executes identically
    * as a batch interval join when both inputs are static (spec-asserted). */
  def intervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String,
                   within: String = "15 minutes",
                   watermark: String = "30 minutes"): DataFrame = {
    val l = if (left.isStreaming) left.withWatermark(leftTs, watermark) else left
    val r = if (right.isStreaming) right.withWatermark(rightTs, watermark) else right
    val cond = keys.map(k => l(k) === r(k)).reduce(_ && _) &&
      r(rightTs) >= l(leftTs) &&
      r(rightTs) <= l(leftTs) + expr(s"INTERVAL $within")
    l.join(r, cond)
  }
}
