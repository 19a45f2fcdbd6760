package graft

import graft.streaming.{CdcApply, Sessions}
import graft.streaming.Sessions.{Event, Session}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQueryException}

import java.nio.file.Files

/** Checkpoint-recovery laws (round 12): StreamingLawsSpec proves
  * epoch-split equivalence, but a split is not a CRASH — these laws stop a
  * running query mid-stream, restart a NEW query from the same checkpoint,
  * and assert the combined output is identical to the uninterrupted run.
  * That is the streaming analog of the reference's executor-loss handling
  * (reference: ballista/scheduler/src/state/execution_graph.rs re-resolves
  * failed stages from persisted state): session state, dedup state and the
  * CDC pointer must all survive the process's "death" via what the
  * checkpoint persisted, not via anything in memory.
  *
  * One law per stateful family:
  *   - sessions (flatMapGroupsWithState state + event-time timeouts),
  *   - dedup (dropDuplicatesWithinWatermark state),
  *   - CDC apply (foreachBatch + the _CURRENT pointer — including a
  *     deliberately FAILED batch whose replay the scaladoc promises:
  *     the pointer must be untouched by the failed attempt and the batch
  *     re-applied on restart).
  * Each law plants state that SPANS the restart boundary (a session with
  * events on both sides, a duplicate whose first occurrence is before the
  * stop, a key updated in both segments), so recovery of the state itself
  * — not just source offsets — is what makes the assert pass.
  */
class StreamingRecoverySpec extends SparkSpec {

  private def ts(minutes: Long): java.sql.Timestamp =
    new java.sql.Timestamp((minutes + 600) * 60 * 1000)

  private def ckptDir(tag: String): String =
    Files.createTempDirectory(s"graft_recovery_$tag").toString

  // ---- sessions ---------------------------------------------------------

  test("stateful sessionization: kill + checkpoint restart equals the uninterrupted run") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // user 1's middle session SPANS the restart (events at minutes 40/100 on
    // one side, 110 on the other — within gap); user 2 entirely in part 1.
    val part1 = Seq(
      Event(1L, 1L, ts(0), 1.0), Event(1L, 2L, ts(10), 2.0),
      Event(2L, 6L, ts(5), 1.5), Event(2L, 7L, ts(20), 2.5),
      Event(1L, 3L, ts(100), 3.0))
    val part2 = Seq(
      Event(1L, 4L, ts(110), 4.0), Event(1L, 5L, ts(120), 5.0),
      Event(2L, 8L, ts(125), 3.5))
    val sentinel = Event(99L, 999L, ts(100000), 0.0)
    // parquet file sink: the memory sink refuses checkpoint recovery; the
    // file sink's _spark_metadata log is the exactly-once contract, so the
    // recovered run writing to the SAME dir must yield the same committed
    // row multiset with no replay duplicates
    def run(mem: MemoryStream[Event], out: String, ckpt: String) =
      Sessions.sessionizeStateful(mem.toDS())
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append()).start()
    def rows(out: String): Seq[(Long, Long, Long, Long)] =
      spark.read.parquet(out).as[Session].collect().filter(_.user_id < 99)
        .map(s => (s.user_id, s.session_start.getTime, s.n_events, s.duration_us))
        .toSeq.sorted

    // uninterrupted reference
    val memA = MemoryStream[Event]
    val outA = ckptDir("sess_ref_out")
    val qA = run(memA, outA, ckptDir("sess_ref"))
    memA.addData(part1 ++ part2: _*); memA.addData(sentinel)
    qA.processAllAvailable(); qA.stop()

    // killed + restarted
    val ckpt = ckptDir("sess")
    val outB = ckptDir("sess_out")
    val memB = MemoryStream[Event]
    val q1 = run(memB, outB, ckpt)
    memB.addData(part1: _*)
    q1.processAllAvailable()
    val afterKill = rows(outB)
    q1.stop() // the "crash": open sessions for users 1 and 2 live ONLY in the state store
    val q2 = run(memB, outB, ckpt)
    memB.addData(part2: _*); memB.addData(sentinel)
    q2.processAllAvailable(); q2.stop()

    val got = rows(outB)
    val want = rows(outA)
    assert(got == want, s"recovered=$got uninterrupted=$want")
    // teeth: the boundary-spanning session (user 1, start minute 100, 3
    // events) must exist and must have been emitted AFTER the restart
    val spanning = (1L, ts(100).getTime, 3L, 20L * 60 * 1000000)
    assert(want.contains(spanning))
    assert(!afterKill.contains(spanning) && got.contains(spanning),
      "the cross-restart session was not rebuilt from checkpointed state")
  }

  // ---- dedup ------------------------------------------------------------

  test("streaming dedup: kill + checkpoint restart equals the uninterrupted run") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Seq(
      (0L, "alpha beta gamma", ts(0)), (1L, "delta epsilon zeta", ts(1)),
      (2L, "alpha beta gamma", ts(2)), // dup within part 1
      (3L, "eta theta iota", ts(3)))
    val docs2 = Seq(
      (4L, "alpha beta gamma", ts(4)), // dup of a PART-1 doc — needs recovered state
      (5L, "delta epsilon zeta", ts(5)),
      (6L, "kappa lambda mu", ts(6)))
    def run(mem: MemoryStream[(Long, String, java.sql.Timestamp)], out: String, ckpt: String) =
      Sessions.streamingDedup(mem.toDF().toDF("doc_id", "text", "ts"), "doc_id", "text", "ts")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append()).start()
    def kept(out: String): Set[Long] =
      spark.read.parquet(out).select("doc_id").collect().map(_.getLong(0)).toSet

    val memA = MemoryStream[(Long, String, java.sql.Timestamp)]
    val outA = ckptDir("dedup_ref_out")
    val qA = run(memA, outA, ckptDir("dedup_ref"))
    memA.addData(docs ++ docs2: _*); qA.processAllAvailable(); qA.stop()

    val ckpt = ckptDir("dedup")
    val outB = ckptDir("dedup_out")
    val memB = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q1 = run(memB, outB, ckpt)
    memB.addData(docs: _*); q1.processAllAvailable()
    q1.stop()
    val q2 = run(memB, outB, ckpt)
    memB.addData(docs2: _*); q2.processAllAvailable(); q2.stop()

    val got = kept(outB)
    val want = kept(outA)
    assert(got == want && want == Set(0L, 1L, 3L, 6L), s"recovered=$got uninterrupted=$want")
    // teeth: doc 4 (post-restart dup of doc 0) was dropped ONLY because the
    // content-hash state survived the restart
    assert(!got.contains(4L),
      "post-restart duplicate of a pre-restart doc was re-emitted — dedup state lost")
  }

  // ---- CDC apply --------------------------------------------------------

  test("CDC apply: availability restarts AND a failed batch replay converge to the one-shot state") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val order = Seq("seq" -> false, "cid" -> false)
    // (key, seq, cid, value); keys 1 and 2 updated in BOTH segments
    val part1 = Seq((1L, 1L, 0L, 10L), (2L, 1L, 1L, 20L), (3L, 1L, 2L, 30L),
      (1L, 2L, 3L, 11L))
    val part2 = Seq((2L, 2L, 4L, 21L), (1L, 3L, 5L, 12L), (4L, 1L, 6L, 40L))
    val statePath = ckptDir("cdc")

    val mem = MemoryStream[(Long, Long, Long, Long)]
    val probed = mem.toDF().toDF("key", "seq", "cid", "value")
      .withColumn("value", RecoveryProbe.failWhenArmed(col("value")))

    // segment 1 (probe disarmed)
    RecoveryProbe.armed = false
    mem.addData(part1: _*)
    val q1 = CdcApply.start(probed, statePath, Seq("key"), order)
    q1.awaitTermination(120000); assert(!q1.isActive)
    val afterPart1 = CdcApply.currentState(spark, statePath).get
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    // segment 2, first attempt FAILS mid-batch: the version write dies, so
    // the _CURRENT pointer must still name the segment-1 state
    RecoveryProbe.armed = true
    mem.addData(part2: _*)
    val q2 = CdcApply.start(probed, statePath, Seq("key"), order)
    intercept[StreamingQueryException] { q2.awaitTermination(120000); assert(false, "expected failure") }
    val afterFailure = CdcApply.currentState(spark, statePath).get
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(afterFailure == afterPart1,
      "a FAILED batch moved the _CURRENT pointer — readers could observe uncommitted state")

    // restart: the checkpoint replays the failed batch
    RecoveryProbe.armed = false
    val q3 = CdcApply.start(probed, statePath, Seq("key"), order)
    q3.awaitTermination(120000); assert(!q3.isActive)
    val got = CdcApply.currentState(spark, statePath).get
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    // one-shot reference over the full change log
    val all = (part1 ++ part2).toDF("key", "seq", "cid", "value")
    val want = CdcApply.latestPerKey(all, Seq("key"), order)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want, s"recovered=$got one-shot=$want")
    assert(want.map(_._1) == Set(1L, 2L, 3L, 4L))
    // teeth: keys 1/2 end on their SEGMENT-2 values — the replayed batch
    // really merged against the recovered segment-1 state
    assert(got.contains((1L, 3L, 5L, 12L)) && got.contains((2L, 2L, 4L, 21L)))
  }
}

/** JVM-global arm flag for the CDC failed-batch law: while armed, every
  * task attempt evaluating the probe throws, so the micro-batch (and the
  * query) fails deterministically; disarming lets the checkpoint replay
  * the same batch cleanly. Executors share this JVM under local[4,2]. */
object RecoveryProbe extends Serializable {
  @volatile var armed = false
  val failWhenArmed: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((x: Long) => {
      if (armed)
        throw new RuntimeException("graft recovery law: injected batch failure")
      x
    })
}
