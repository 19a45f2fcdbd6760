package graft

/** Config-invariance sweep over the WHOLE gated surface (round 11).
  *
  * Every registered query must produce byte-identical rows when the session
  * is re-configured the way a different cluster (or a different day on the
  * same cluster) would configure it:
  *
  *   - `spark.sql.adaptive.enabled=false` — AQE re-plans exchanges at
  *     runtime; results must not depend on whether it did.
  *   - `spark.sql.autoBroadcastJoinThreshold=-1` — every broadcast join
  *     becomes a shuffled join; join strategy must never change results.
  *   - `spark.sql.shuffle.partitions=7` — co-prime with the default (4 in
  *     tests, 32 in prod), so every hash-partitioned boundary reshapes and
  *     every fold order changes.
  *   - `spark.sql.codegen.wholeStage=false` +
  *     `spark.sql.codegen.factoryMode=NO_CODEGEN` — all expressions run
  *     INTERPRETED, so every custom Expression's `eval` path is asserted
  *     against the codegen path the default run used (an eval/doGenCode
  *     divergence in a custom expression is invisible to every other suite,
  *     which only ever executes the codegen side).
  *
  * This is the session-config mirror of the partitioning-determinism story
  * (DeterminismSpec pins 8 float-sensitive queries under a co-prime shuffle
  * layout; RetryLawsSpec pins re-execution): the reference hard-codes one
  * engine configuration per release (ballista/core/src/config.rs:182-187),
  * while a Spark library inherits whatever the hosting cluster sets — so
  * "same answer under any config" is a contract, not a nicety. All five
  * knobs are applied AT ONCE (one adversarial re-run per query keeps the
  * sweep ~2x QueriesSpec, not 6x); on a mismatch the failure message
  * re-runs each knob individually and names the minimal culprits.
  */
class ConfigInvarianceSpec extends SparkSpec {

  private val adversarial: Seq[(String, String)] = Seq(
    "spark.sql.adaptive.enabled" -> "false",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.shuffle.partitions" -> "7",
    "spark.sql.codegen.wholeStage" -> "false",
    "spark.sql.codegen.factoryMode" -> "NO_CODEGEN")

  private def withConfs[A](confs: Seq[(String, String)])(body: => A): A = {
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** Canonical multiset snapshot via the shared [[RowRender]]. */
  private def snapshot(name: String): Seq[String] =
    RowRender.snapshot(SparkEntry.queries(name)(spark, sfDir))

  /** Queries whose output is not a pure function of the input data, each
    * with the reason it cannot be config-invariant. Kept deliberately
    * tiny — a layout-dependent result is a reproducibility bug unless the
    * operator's definition involves the layout. */
  private val excluded: Map[String, String] = Map(
    "fn_nondet" -> "uuid()/rand()/now() — nondeterministic by definition; driver-gated rows-only")

  test("exclusion list stays a subset of the registry") {
    assert(excluded.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  // Round 14 fast/full split: the whole-registry sweep is ~2x a full
  // QueriesSpec run and runs on the FULL tier (GRAFT_FULL=1, per-round
  // committed log); the default suite sweeps the representative subset —
  // every custom-expression/UDAF/operator family stays covered on both
  // the codegen and interpreted paths every run.
  private val sweepNames: Seq[String] =
    (if (TestTier.full) SparkEntry.queries.keys.toSeq.sorted
     else TestTier.subset.sorted).filterNot(excluded.contains)

  test("sweep names stay inside the registry") {
    assert(sweepNames.toSet.subsetOf(SparkEntry.queries.keySet),
      s"unknown names: ${sweepNames.filterNot(SparkEntry.queries.keySet)}")
  }

  sweepNames.foreach { name =>
    test(s"$name: identical rows under AQE-off / no-broadcast / 7-partition / interpreted config") {
      val base = snapshot(name)
      val adv = withConfs(adversarial)(snapshot(name))
      if (base != adv) {
        // Failure-path-only diagnosis: the per-knob isolation re-executes
        // the query up to once per knob. For STATEFUL queries (DDL /
        // scratch-writing) those extra snapshots can themselves mutate
        // session state, so the culprit list below is a heuristic — trust
        // the top-level base-vs-adversarial diff, re-verify culprits in a
        // fresh session.
        val culprits = adversarial.filter { c =>
          withConfs(Seq(c))(snapshot(name)) != base
        }.map(_._1)
        val diff = adv.diff(base).take(3)
        val miss = base.diff(adv).take(3)
        fail(s"$name differs under the adversarial config; minimal culprit knob(s) " +
          s"(heuristic — each isolation re-runs the query, which can mutate state for " +
          s"DDL/scratch queries; re-verify in a fresh session): " +
          s"${if (culprits.isEmpty) "only the combination" else culprits.mkString(", ")}; " +
          s"sample rows only-adversarial=$diff only-default=$miss")
      }
    }
  }
}
