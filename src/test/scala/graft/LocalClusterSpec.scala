package graft

import graft.operators.TopK
import graft.streaming.Sessions
import graft.streaming.Sessions.{Event, Session}
import org.apache.spark.TaskContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import scala.util.{Failure, Success, Try}

/** Multi-JVM determinism sweep (round 12) — the one Spark deployment axis no
  * other suite exercises.
  *
  * The reference executes every test through a real scheduler→executor
  * process boundary with serialized plans (reference:
  * ballista/executor/src/execution_loop.rs:148-283 — the executor is a
  * separate process that deserializes each task plan before running it).
  * Spark's analog is `local-cluster[2,2,1536]`: a standalone master and two
  * workers run inside this JVM, but the EXECUTORS are two separate JVM
  * processes — so task binaries, broadcast blocks, custom Catalyst
  * expressions, sketch UDAF buffers (Udafs.scala), TopKPerKey runtime state,
  * generator expressions and the MediaCodecs closures all round-trip through
  * real Java serialization, a socket, and a fresh classloader, none of which
  * `local[*]` ever leaves the driver JVM for.
  *
  * Protocol: snapshot a representative subset of the gated surface on the
  * standard single-JVM session, tear it down (one SparkContext per JVM),
  * bring up the local-cluster context, snapshot again, and assert
  * byte-identical rendered rows per query. The subset covers every
  * custom-code family: custom expressions/vector ops, every sketch UDAF,
  * TopKPerKey, generators, media codecs, the dedup/ANN/graph/stream tiers,
  * DSv2 + scheme-registered sources, sinks, and DDL. `GRAFT_LC_FULL=1`
  * widens it to the whole registry (minus fn_nondet, nondeterministic by
  * definition). On top of the batch sweep: a stateful-streaming law and a
  * task-retry law run ON the cluster, and a process-identity probe proves
  * tasks really execute in non-driver JVMs.
  *
  * Round 13 adds a third phase: the same names plus the streaming and
  * retry laws on a SECOND cluster with
  * `spark.serializer=KryoSerializer` — the common production override the
  * Java-serialization phases never exercise.
  *
  * The spec restores the standard `local[4,2]` session on exit; suites run
  * sequentially in the forked test JVM and `SparkSpec.session` re-resolves
  * per suite, so the suites that follow are unaffected.
  */
class LocalClusterSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private val fullSweep = sys.env.get("GRAFT_LC_FULL").contains("1")
  private val excluded: Map[String, String] = Map(
    "fn_nondet" -> "uuid()/rand()/now() — nondeterministic by definition; driver-gated rows-only")

  /** Default subset: every family with custom serialized state, plus a
    * cross-section of the plain-Catalyst surface (shared via [[TestTier]]
    * with ConfigInvarianceSpec since round 14). */
  private val subset: Seq[String] = TestTier.subset

  private def names: Seq[String] =
    if (fullSweep) SparkEntry.queries.keys.toSeq.filterNot(excluded.contains).sorted
    else subset

  // results computed once in beforeAll, asserted by the registered tests
  private var localSnaps: Map[String, Either[String, Seq[String]]] = Map.empty
  private var clusterSnaps: Map[String, Either[String, Seq[String]]] = Map.empty
  private var kryoSnaps: Map[String, Either[String, Seq[String]]] = Map.empty
  private var kryoStreamingResult: Try[Seq[(Long, Long, Long)]] = Failure(new IllegalStateException("not run"))
  private var kryoRetryResult: Try[(Set[(Int, Int, Long)], Set[(Int, Int, Long)], Int)] =
    Failure(new IllegalStateException("not run"))
  private var executorJvms: Set[String] = Set.empty
  private var driverJvm: String = ""
  private var streamingResult: Try[Seq[(Long, Long, Long)]] = Failure(new IllegalStateException("not run"))
  private var retryResult: Try[(Set[(Int, Int, Long)], Set[(Int, Int, Long)], Int)] =
    Failure(new IllegalStateException("not run"))
  private var executorLossResult: Try[(Map[Long, Long], Map[Long, Long], Boolean, Boolean, Boolean)] =
    Failure(new IllegalStateException("not run"))

  private def snap(spark: SparkSession, name: String): Either[String, Seq[String]] =
    Try(RowRender.snapshot(SparkEntry.queries(name)(spark, sfDir))) match {
      case Success(rows) => Right(rows)
      case Failure(e)    => Left(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(400)}")
    }

  /** The standard product session config on a multi-process master. The
    * executor classpath is this JVM's classpath (graft classes + Spark jars
    * + test deps); SparkContext supplements the JDK-17 module options into
    * the executor launch command itself.
    *
    * `kryo=true` (round 13) swaps `spark.serializer` to KryoSerializer —
    * the production default on most real clusters. Shuffled SQL data is
    * UnsafeRow bytes either way, but broadcast blocks, task results (every
    * collect), RDD-cached blocks and any non-Unsafe value crossing the
    * wire ride the configured serializer, so the Java-serialization proof
    * alone leaves a one-config-key gap. registrationRequired stays false
    * (the deployment default): graft ships no Kryo registrator, so every
    * custom class that travels — TopKPerKey rows, sketch UDAF buffers,
    * MediaCodecs structs — must round-trip through Kryo's generic path. */
  private def clusterSession(kryo: Boolean = false): SparkSession = {
    val b = GraftSession.builder("local-cluster[2,2,1536]", 4)
      .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      .config("spark.executor.extraJavaOptions", "-Duser.timezone=UTC")
    val bk = if (kryo)
      b.config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
    else b
    val s = bk.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    functions.GraftFunctions.registerAll(s)
    s
  }

  /** Standalone jobs start as soon as ONE executor registers; on a slow
    * host an early probe can then run entirely on the first executor and
    * any size==2 assert flakes. Wait until both have registered
    * (getExecutorMemoryStatus counts the driver too → 3 entries). */
  private def awaitBothExecutors(spark: SparkSession): Unit = {
    var waitMs = 0
    while (spark.sparkContext.getExecutorMemoryStatus.size < 3 && waitMs < 60000) {
      Thread.sleep(250); waitMs += 250
    }
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    // Phase 1: baseline rows on the standard single-JVM session.
    val local = GraftSession.getOrCreate("local[4,2]", 4)
    localSnaps = names.map(n => n -> snap(local, n)).toMap
    // Phase 2: one SparkContext per JVM — stop it, bring up the cluster.
    local.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val cluster = clusterSession()
      try {
        driverJvm = java.lang.management.ManagementFactory.getRuntimeMXBean.getName
        import cluster.implicits._
        awaitBothExecutors(cluster)
        executorJvms = cluster.sparkContext
          .parallelize(1 to 64, 8)
          .mapPartitions(_ => Iterator(java.lang.management.ManagementFactory.getRuntimeMXBean.getName))
          .collect().toSet
        clusterSnaps = names.map(n => n -> snap(cluster, n)).toMap
        streamingResult = Try(runStreamingOnCluster(cluster))
        retryResult = Try(runRetryOnCluster(cluster))
        executorLossResult = Try(runExecutorLossOnCluster(cluster))
      } finally {
        cluster.stop()
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
      }
      // Phase 3 (round 13): the same boundary under the Kryo serializer.
      // FULL tier only (round 14) — a second full cluster boot + subset
      // sweep is several minutes; its tests register only under GRAFT_FULL.
      if (TestTier.full) {
        val kryoCluster = clusterSession(kryo = true)
        try {
          // Same slow-registration guard as phase 2 (ADVICE r13): without it
          // the Kryo snaps/streaming/retry laws can start with only one
          // executor up, weakening the cross-JVM Kryo coverage.
          awaitBothExecutors(kryoCluster)
          assert(kryoCluster.sparkContext.getConf
            .get("spark.serializer", "").contains("KryoSerializer"))
          kryoSnaps = names.map(n => n -> snap(kryoCluster, n)).toMap
          kryoStreamingResult = Try(runStreamingOnCluster(kryoCluster, "lc_kryo_sessions"))
          kryoRetryResult = Try(runRetryOnCluster(kryoCluster))
        } finally {
          kryoCluster.stop()
          SparkSession.clearActiveSession()
          SparkSession.clearDefaultSession()
        }
      }
    } finally {
      // Leave the standard fixture up for the suites that follow.
      GraftSession.getOrCreate("local[4,2]", 4)
    }
  }

  // ---- laws run while the cluster is up --------------------------------

  private def ts(minutes: Long): java.sql.Timestamp =
    new java.sql.Timestamp((minutes + 600) * 60 * 1000)

  /** Stateful sessionization (flatMapGroupsWithState): encoder + state-store
    * round-trips through executor JVMs; same scenario StreamingSpec pins
    * single-JVM. */
  private def runStreamingOnCluster(spark: SparkSession,
      queryName: String = "lc_stateful_sessions"): Seq[(Long, Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1L, 1L, ts(0), 1.0), Event(1L, 2L, ts(10), 2.0), Event(1L, 3L, ts(40), 3.0),
      Event(1L, 4L, ts(100), 4.0), Event(1L, 5L, ts(110), 5.0),
      Event(2L, 6L, ts(5), 1.5), Event(2L, 7L, ts(20), 2.5))
    val q = Sessions.sessionizeStateful(mem.toDS())
      .writeStream.format("memory").queryName(queryName)
      .outputMode(OutputMode.Append()).start()
    mem.addData(Event(99L, 999L, ts(100000), 0.0)) // advance the watermark
    q.processAllAvailable()
    q.stop()
    spark.table(queryName).as[Session].collect()
      .filter(_.user_id < 99).sortBy(s => (s.user_id, s.session_start.getTime))
      .map(s => (s.user_id, s.n_events, s.duration_us)).toSeq
  }

  /** First-attempt task failure on a REMOTE executor: the retried attempt
    * (standalone default maxFailures=4) must reproduce identical TopKPerKey
    * results. Returns (clean rows, injected rows, observed task failures).
    * Unlike RetryLawsSpec's JVM-local AtomicInteger probe (which only works
    * when executors share the driver JVM), injection evidence here is the
    * scheduler's own ExceptionFailure carrying the injected message. */
  private def runRetryOnCluster(spark: SparkSession): (Set[(Int, Int, Long)], Set[(Int, Int, Long)], Int) = {
    val observed = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = te.reason match {
        case ef: org.apache.spark.ExceptionFailure
          if ef.description != null && ef.description.contains("graft lc retry") =>
          observed.incrementAndGet()
        case _ => ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val rng = new scala.util.Random(7)
      val rows = (0 until 2000).map(i => (rng.nextInt(10), rng.nextInt(40), i.toLong))
      val clean = spark.createDataFrame(rows).toDF("key", "score", "id").repartition(6)
      def topk(df: DataFrame): Set[(Int, Int, Long)] =
        TopK.perKey(df, Seq("key"), Seq("score" -> true, "id" -> true), 4)
          .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
      val want = topk(clean)
      val failInt = udf((x: Int) => {
        val tc = TaskContext.get()
        if (tc != null && tc.attemptNumber() == 0 && tc.partitionId() == 0)
          throw new RuntimeException("graft lc retry: injected first-attempt failure")
        x
      })
      val got = topk(clean.withColumn("score", failInt(col("score"))))
      var waited = 0
      while (observed.get() == 0 && waited < 10000) { Thread.sleep(50); waited += 50 }
      (want, got, observed.get())
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  /** Executor LOSS mid-shuffle — the axis past task retry: kill -9 one
    * executor JVM while the reduce stage of a wide job is consuming the
    * map outputs it hosted. The scheduler must observe the loss, refetch /
    * recompute the lost shuffle blocks (FetchFailed → map-stage
    * resubmission), and the job must finish with the exact answer. This is
    * the direct analog of the reference's executor-lost transitions
    * (reference: ballista/scheduler/src/state/execution_graph.rs exercises
    * failed-task and executor-lost state machines; planner.rs:260-283
    * rolls back resolved shuffles). Returns (got, want, executorRemoved,
    * recomputed, killedWasExecutor). */
  private def runExecutorLossOnCluster(spark: SparkSession): (Map[Long, Long], Map[Long, Long], Boolean, Boolean, Boolean) = {
    import org.apache.spark.scheduler.{SparkListenerExecutorRemoved, SparkListenerStageCompleted, SparkListenerStageSubmitted}
    val prevConfs = Seq("spark.sql.shuffle.partitions",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> spark.conf.getOption(k))
    // 16 NON-coalesced reduce partitions over 4 total cores = 4 waves: the
    // later waves fetch their shuffle blocks AFTER the kill, so the
    // victim's lost map outputs are guaranteed to be demanded again (the
    // first draft let AQE coalesce the reduce below the core count — the
    // whole wave could land on the survivor, fetch everything before the
    // kill, and the law flaked with "recomputed was false").
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    val self = java.lang.management.ManagementFactory.getRuntimeMXBean.getName
      .split("@")(0)
    // executor pids via a trivial job — run ONLY while no other job holds
    // the cores (a probe queued behind the sleeping reduce wave would
    // delay the kill past the window)
    def currentPids(): Set[String] = spark.sparkContext
      .parallelize(1 to 64, 8)
      .mapPartitions(_ => Iterator(
        java.lang.management.ManagementFactory.getRuntimeMXBean.getName))
      .collect().toSet.map((s: String) => s.split("@")(0)).filter(_ != self)

    def attempt(): (Map[Long, Long], Map[Long, Long], Boolean, Boolean, Boolean) = {
      // fresh pids each attempt — a prior attempt's victim is dead and its
      // replacement (worker relaunch) carries a new pid; wait for two live
      // executors so the kill leaves a survivor
      var pids = currentPids()
      var waitMs = 0
      while (pids.size < 2 && waitMs < 30000) {
        Thread.sleep(1000); waitMs += 1000; pids = currentPids()
      }
      // per-attempt listener state (a shared latch would leak the previous
      // attempt's signals into the retry)
      val mapDone = new java.util.concurrent.CountDownLatch(1)
      val removed = new java.util.concurrent.atomic.AtomicBoolean(false)
      val resubmitted = new java.util.concurrent.atomic.AtomicBoolean(false)
      val fetchFailed = new java.util.concurrent.atomic.AtomicBoolean(false)
      // The latch must fire on the TARGET job's map stage only — a
      // bus-delayed completion event from the just-finished currentPids()
      // probe job would otherwise trip it before the real map stage
      // finishes and fire the kill early. The job group id travels in the
      // job-start properties; collect the job's stage ids from there.
      val jobGroup = "graft-lc-loss"
      val targetStages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
      val listener = new SparkListener {
        override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          if (js.properties != null &&
              jobGroup == js.properties.getProperty("spark.jobGroup.id"))
            js.stageInfos.foreach(si => targetStages.add(si.stageId))
        override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
          if (targetStages.contains(sc.stageInfo.stageId)) mapDone.countDown()
        override def onExecutorRemoved(er: SparkListenerExecutorRemoved): Unit =
          removed.set(true)
        override def onStageSubmitted(ss: SparkListenerStageSubmitted): Unit =
          if (ss.stageInfo.attemptNumber() > 0) resubmitted.set(true)
        override def onTaskEnd(te: SparkListenerTaskEnd): Unit = te.reason match {
          case _: org.apache.spark.FetchFailed => fetchFailed.set(true)
          case _                               => ()
        }
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        val n = 1000000L
        val keys = 32L
        // per-row sleep in the REDUCE stage (the UDF consumes the shuffled
        // aggregate) keeps that stage alive long enough to kill under it
        val slow = udf((k: Long) => { Thread.sleep(300); k })
        val grouped = spark.range(0, n, 1, 16)
          .groupBy((col("id") % keys).as("k"))
          .agg(sum(col("id")).as("s"))
          .withColumn("k2", slow(col("k")))
        val fut = scala.concurrent.Future {
          // job group is thread-local to the submitting thread
          spark.sparkContext.setJobGroup(jobGroup, "executor-loss law", false)
          try grouped.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
          finally spark.sparkContext.clearJobGroup()
        }(scala.concurrent.ExecutionContext.global)
        assert(mapDone.await(60, java.util.concurrent.TimeUnit.SECONDS),
          "map stage never completed")
        Thread.sleep(700) // let the first reduce wave start sleeping in the UDF
        val killedOk = pids.headOption.exists { pid =>
          new ProcessBuilder("kill", "-9", pid).start().waitFor() == 0
        }
        val got = scala.concurrent.Await.result(fut, scala.concurrent.duration.Duration(180, "s"))
        val want = (0L until keys).map { k =>
          val c = (n - k + keys - 1) / keys // count of ids ≡ k (mod keys) below n
          k -> (c * k + keys * c * (c - 1) / 2)
        }.toMap
        var waited = 0
        while (!removed.get() && waited < 10000) { Thread.sleep(50); waited += 50 }
        (got, want, removed.get(), resubmitted.get() || fetchFailed.get(), killedOk)
      } finally spark.sparkContext.removeSparkListener(listener)
    }

    try {
      // The kill-vs-fetch interleaving is a real race on a real scheduler;
      // one retry keeps the law stable against freak scheduling without
      // masking product behavior — a correctness drift fails BOTH attempts.
      val first = attempt()
      if (first._3 && first._4 && first._5) first else attempt()
    } finally prevConfs.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  // ---- assertions -------------------------------------------------------

  test("subset stays inside the registry") {
    assert(subset.toSet.subsetOf(SparkEntry.queries.keySet),
      s"unknown names: ${subset.filterNot(SparkEntry.queries.keySet)}")
    assert(subset.distinct.sizeIs == subset.size, "duplicate subset entries")
  }

  test("tasks executed in separate executor JVM processes (not the driver)") {
    assert(executorJvms.nonEmpty)
    assert(!executorJvms.contains(driverJvm),
      s"tasks ran in the driver JVM $driverJvm — no process boundary was exercised")
    assert(executorJvms.size == 2,
      s"expected 2 executor JVMs from local-cluster[2,2,1536], saw: $executorJvms")
  }

  names.foreach { name =>
    test(s"$name: local-cluster rows byte-identical to local[*]") {
      (localSnaps(name), clusterSnaps(name)) match {
        case (Right(l), Right(c)) =>
          if (l != c) {
            val onlyCluster = c.diff(l).take(3)
            val onlyLocal = l.diff(c).take(3)
            fail(s"$name differs across the JVM boundary; " +
              s"sample rows only-cluster=$onlyCluster only-local=$onlyLocal")
          }
        case (Left(e), _) => fail(s"$name failed on local[*]: $e")
        case (_, Left(e)) => fail(s"$name failed on local-cluster (serialization/classpath suspect): $e")
      }
    }
  }

  // Kryo-phase tests register only on the full tier (GRAFT_FULL=1) —
  // zero canceled tests on the default suite by the TestTier convention.
  if (TestTier.full) {
    names.foreach { name =>
      test(s"$name: Kryo-serializer local-cluster rows byte-identical to local[*]") {
        (localSnaps(name), kryoSnaps(name)) match {
          case (Right(l), Right(c)) =>
            if (l != c) {
              val onlyCluster = c.diff(l).take(3)
              val onlyLocal = l.diff(c).take(3)
              fail(s"$name differs under Kryo across the JVM boundary; " +
                s"sample rows only-kryo=$onlyCluster only-local=$onlyLocal")
            }
          case (Left(e), _) => fail(s"$name failed on local[*]: $e")
          case (_, Left(e)) => fail(s"$name failed on the Kryo local-cluster (Kryo round-trip suspect): $e")
        }
      }
    }

    test("stateful streaming sessionization is correct across executor JVMs under Kryo") {
      assert(kryoStreamingResult.get == Seq(
        (1L, 3L, 40L * 60 * 1000000),
        (1L, 2L, 10L * 60 * 1000000),
        (2L, 2L, 15L * 60 * 1000000)))
    }

    test("TopKPerKey survives a remote first-attempt task failure under Kryo") {
      val (want, got, observedFailures) = kryoRetryResult.get
      assert(observedFailures > 0,
        "scheduler never reported the injected ExceptionFailure from the executor (Kryo)")
      assert(got == want && want.nonEmpty)
    }
  }

  test("stateful streaming sessionization is correct across executor JVMs") {
    assert(streamingResult.get == Seq(
      (1L, 3L, 40L * 60 * 1000000),
      (1L, 2L, 10L * 60 * 1000000),
      (2L, 2L, 15L * 60 * 1000000)))
  }

  test("TopKPerKey survives a remote first-attempt task failure bit-identically") {
    val (want, got, observedFailures) = retryResult.get
    assert(observedFailures > 0,
      "scheduler never reported the injected ExceptionFailure from the executor")
    assert(got == want && want.nonEmpty)
  }

  test("executor killed -9 mid-shuffle: lost map outputs recomputed, exact result") {
    val (got, want, removed, recomputed, killedOk) = executorLossResult.get
    assert(killedOk, "could not kill an executor process")
    assert(removed, "scheduler never observed the executor loss")
    assert(recomputed,
      "no FetchFailed / stage resubmission observed — the kill landed after the job no longer needed the lost executor's shuffle blocks")
    assert(got == want, s"result drifted after executor loss: got=${got.toSeq.sorted.take(5)}...")
  }
}
