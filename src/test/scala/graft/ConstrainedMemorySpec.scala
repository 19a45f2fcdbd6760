package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.util.concurrent.atomic.AtomicLong

/** Constrained-memory pass (round 12): the spill paths exist (TopKPerKey's
  * sort fallback, Spark's sort/aggregate/join spills) but the default suite
  * only ever forces TopKPerKey's. This spec runs the heavy tier under a
  * deliberately STARVED unified-memory pool (`spark.memory.fraction` down to
  * a twentieth of the usual execution+storage budget) and asserts (a) every query
  * still completes with correct-looking output (rows > 0 — correctness
  * proper is the oracle gate's job), and (b) the starved run actually
  * spilled where the plan has sort/aggregation state, proving the
  * pipelines degrade to disk instead of OOMing — the 100-TB contract.
  *
  * ENV-GATED: set `GRAFT_SPILL=1` (and optionally `GRAFT_SPILL_SF` to a
  * data dir, default /tmp/sf1) — the run needs its own SparkContext
  * (memory.fraction is read at context startup) and several minutes at
  * sf1, so it is skipped in the default suite; evidence from the committed
  * run lives in BASELINE.md's "Forced-spill pass" note.
  */
class ConstrainedMemorySpec extends AnyFunSuite with BeforeAndAfterAll {

  private val enabled = sys.env.get("GRAFT_SPILL").contains("1")
  private val dataDir = sys.env.getOrElse("GRAFT_SPILL_SF", "/tmp/sf1")
  // ~0.05 × (8g − 300m) ≈ 390 MB unified pool over 8 concurrent tasks
  // ≈ 49 MB execution memory per task — roughly the per-task budget of a
  // busy 1000-executor cluster under memory oversubscription
  private val fraction = sys.env.getOrElse("GRAFT_SPILL_FRACTION", "0.05")
  private val cpus = sys.env.getOrElse("GRAFT_SPILL_CPUS", "8")

  /** Heavy tier: the families whose state grows with data (dedup candidate
    * generation, graph fixpoints, CDC latest-per-key, windowed stats) plus
    * the explicit TopK fallback consumer. `GRAFT_SPILL_ONLY=a,b` restricts
    * the run (used for the sf10 pass, where the graph fixpoints — already
    * proven to spill at sf1 — would dominate the wall-clock). */
  private val heavy = {
    val all = Seq(
      "ded_minhash", "ded_ngram", "ded_prefix", "ded_contain", "ded_winnow",
      "ded_simhash", "ded_cluster", "graph_components", "graph_bfs",
      "graph_pagerank", "cdc_apply", "win_mad", "topk_group", "agg_wpercentile",
      "txt_topterms", "evt_sessionize")
    sys.env.get("GRAFT_SPILL_ONLY") match {
      case Some(list) =>
        val only = list.split(',').map(_.trim).filter(_.nonEmpty).toSet
        all.filter(only)
      case None => all
    }
  }

  private val spilledMem = new AtomicLong(0)
  private val spilledDisk = new AtomicLong(0)
  private val listener = new SparkListener {
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        spilledMem.addAndGet(m.memoryBytesSpilled)
        spilledDisk.addAndGet(m.diskBytesSpilled)
      }
    }
  }

  private var starved: SparkSession = _
  private var results: Map[String, (Long, Long, Long)] = Map.empty // rows, memSpill, diskSpill

  override def beforeAll(): Unit = {
    super.beforeAll()
    if (enabled) {
      // memory.fraction is a startup conf — needs a fresh context
      val prev = SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      prev.foreach(_.stop())
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      starved = GraftSession.builder(s"local[$cpus]", 32)
        .config("spark.memory.fraction", fraction)
        .getOrCreate()
      starved.sparkContext.setLogLevel("WARN")
      functions.GraftFunctions.registerAll(starved)
      starved.sparkContext.addSparkListener(listener)
      try {
        results = heavy.map { name =>
          val m0 = spilledMem.get(); val d0 = spilledDisk.get()
          val rows = SparkEntry.queries(name)(starved, dataDir).count()
          // listener bus is async — wait for the spill counters to settle
          var last = -1L; var settled = 0
          while (settled < 3) {
            Thread.sleep(300)
            val cur = spilledMem.get() + spilledDisk.get()
            if (cur == last) settled += 1 else { settled = 0; last = cur }
          }
          name -> ((rows, spilledMem.get() - m0, spilledDisk.get() - d0))
        }.toMap
      } finally {
        starved.sparkContext.removeSparkListener(listener)
        starved.stop()
        SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
        GraftSession.getOrCreate("local[4,2]", 4)
      }
      // machine-readable evidence for the BASELINE.md note
      val js = results.toSeq.sortBy(_._1).map { case (n, (r, ms, ds)) =>
        s"""\"$n\":{\"rows\":$r,\"mem_spill\":$ms,\"disk_spill\":$ds}"""
      }.mkString("{", ",", "}")
      java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/graft_spill_evidence.json"),
        js.getBytes("UTF-8"))
    }
  }

  test("heavy tier completes under the starved memory budget") {
    assume(enabled, "set GRAFT_SPILL=1 to run the constrained-memory pass")
    // Completion (the count() above threw on any task failure) is the
    // assertion; row counts ride in the evidence JSON. rows==0 can be the
    // query's own semantics, not a failure — ded_winnow at /tmp/sf10 has
    // ZERO pairs because every fingerprint's csize-weighted df (100
    // verbatim copies per content under ScaleUp) exceeds its dfCap=50:
    // the boilerplate cap working as specified (verified against a
    // full-memory run; memory pressure cannot change a deterministic
    // query's output — that is ConfigInvarianceSpec's contract).
    assert(results.size == heavy.size)
    val empty = results.collect { case (n, (rows, _, _)) if rows == 0 => n }
    if (empty.nonEmpty) info(s"zero-output queries (verify against a full-memory run): $empty")
  }

  test("the starved run actually spilled (sort/agg state went to disk, not OOM)") {
    assume(enabled, "set GRAFT_SPILL=1 to run the constrained-memory pass")
    val spillers = results.collect { case (n, (_, ms, ds)) if ms + ds > 0 => n }.toSeq.sorted
    info(s"spilling queries: ${spillers.mkString(", ")}")
    results.toSeq.sortBy(_._1).foreach { case (n, (r, ms, ds)) =>
      info(f"$n%-18s rows=$r%-8d memSpill=${ms / 1e6}%.1fMB diskSpill=${ds / 1e6}%.1fMB")
    }
    assert(spillers.nonEmpty,
      "no query spilled — either the budget is not actually constrained or the listener missed metrics")
  }
}
