package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.optimizer.BuildLeft
import org.apache.spark.sql.execution.{ColumnarToRowExec, InputAdapter, LocalTableScanExec, ProjectExec, RangeExec, SortExec, SparkPlan, TakeOrderedAndProjectExec, WholeStageCodegenExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
import org.apache.spark.sql.execution.GlobalLimitExec

/** Structural scale lint over a physical plan: flags the plan shapes that
  * are size-INDEPENDENT scale-killers — the ones that stay wrong however
  * the data grows, as opposed to size-dependent choices (broadcast vs
  * shuffle join) that AQE re-makes from runtime statistics.
  *
  * The reference engine refuses some of these outright at planning time
  * (ballista rejects distributed window sorts, planner.rs:151-156); on
  * Spark they plan fine and run fine at test scale, which is exactly the
  * trap — a `Window.orderBy` without `partitionBy` moves EVERY row to one
  * partition, and nothing in a green sf0.01 test says so. Linting the
  * physical plan makes the claim "this query survives 100 TB" checkable
  * per query instead of per code review, and the gate suite asserts it for
  * every registered query (QueriesSpec), with the handful of semantically
  * justified exceptions declared query-by-query.
  *
  * Rules:
  *  - `cartesian` — [[CartesianProductExec]]: Θ(|L|·|R|) pair generation
  *    with both sides unbounded.
  *  - `nested-loop-join` — [[BroadcastNestedLoopJoinExec]] whose broadcast
  *    side is not provably bounded (no aggregate / limit / local relation /
  *    small range beneath it): a keyless join whose build side grows with
  *    the data is a broadcast OOM at scale.
  *  - `global-window` — [[WindowExec]] / [[WindowGroupLimitExec]] with an
  *    empty partition spec over an UNAGGREGATED input: every row shuffles
  *    to a single partition, the exact shape Spark's own "No Partition
  *    Defined for Window operation" warning exists for. A global window
  *    whose input has already been reduced by an aggregate (the
  *    value-domain pattern — rank/cumulate per distinct value, weight by
  *    counts) is the scalable formulation of the same semantics and is
  *    not flagged.
  *  - `interior-global-sort` — a total-order [[SortExec]] that is NOT the
  *    query's root ordering. A root `orderBy` is presentation semantics
  *    (range-partitioned, spillable, and cheap relative to the work below
  *    it); a global sort feeding further computation serializes the plan
  *    at one range boundary per partition and is almost always a mistake
  *    (a per-key window or a `sortWithinPartitions` is the scalable form).
  *
  * Linting runs on `queryExecution.sparkPlan` — the pre-AQE physical plan —
  * so results are deterministic for a given query and do not depend on
  * runtime statistics; the flagged shapes are structural, which is what
  * makes them lintable at any test scale.
  */
object ScaleLint {

  final case class Finding(rule: String, node: String) {
    override def toString: String = s"$rule at $node"
  }

  def lint(df: DataFrame): Seq[Finding] = lintPlan(df.queryExecution.sparkPlan)

  def lintPlan(plan: SparkPlan): Seq[Finding] = {
    val rootSorts = spineSorts(plan)
    plan.collectWithSubqueries {
      case c: CartesianProductExec =>
        Seq(Finding("cartesian", c.simpleStringWithNodeId()))
      case j: BroadcastNestedLoopJoinExec if !bounded(buildSideOf(j)) =>
        Seq(Finding("nested-loop-join", j.simpleStringWithNodeId()))
      case w: WindowExec if w.partitionSpec.isEmpty && !bounded(w.child) =>
        Seq(Finding("global-window", w.simpleStringWithNodeId()))
      case w: WindowGroupLimitExec if w.partitionSpec.isEmpty && !bounded(w.child) =>
        Seq(Finding("global-window", w.simpleStringWithNodeId()))
      case s: SortExec if s.global && !rootSorts.contains(s) =>
        Seq(Finding("interior-global-sort", s.simpleStringWithNodeId()))
    }.flatten
  }

  private def buildSideOf(j: BroadcastNestedLoopJoinExec): SparkPlan =
    if (j.buildSide == BuildLeft) j.left else j.right

  /** A broadcast side is bounded when its row count is capped independently
    * of input size. The judgment is STRUCTURAL, not an `exists` over the
    * subtree: `join(unboundedScan, aggregate)` contains an aggregate yet its
    * output grows with the scan — a subtree-exists test classifies it
    * bounded (false negative) and lets an unbounded broadcast lint clean.
    * So: a node is bounded when it itself caps rows (aggregate — rows ≤
    * group-key cardinality; limit / top-k; literal local relation; generated
    * range), or when every row-producing child is bounded (a join or union
    * of bounded inputs yields at most a product/sum of caps — still
    * input-size-independent; filters/projects/exchanges pass through).
    * A leaf that caps nothing (a file scan) is unbounded. */
  private def bounded(side: SparkPlan): Boolean = side match {
    case _: BaseAggregateExec | _: LocalTableScanExec | _: GlobalLimitExec |
         _: TakeOrderedAndProjectExec | _: RangeExec => true
    case p => p.children.nonEmpty && p.children.forall(bounded)
  }

  /** The global sorts that express the query's ROOT ordering: the maximal
    * chain of pass-through nodes from the root, stopping at (and keeping)
    * the first sort. Everything deeper re-sorts work that something above
    * will reorder or repartition anyway. */
  private def spineSorts(p: SparkPlan): Set[SparkPlan] = p match {
    case w: WholeStageCodegenExec => spineSorts(w.child)
    case i: InputAdapter          => spineSorts(i.child)
    case pr: ProjectExec          => spineSorts(pr.child)
    case c: ColumnarToRowExec     => spineSorts(c.child)
    case s: SortExec              => Set(s)
    case _                        => Set.empty
  }
}
