package graft

import graft.plans.ScaleLint
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ScaleLint's rules must demonstrably FIRE — a lint that never triggers
  * reads as "fleet is clean" when it is actually blind. Each rule gets a
  * plan built to violate it and a minimally-different plan built to pass
  * it (the bounded/value-domain/root-ordering counterparts QueriesSpec's
  * allowlist reasoning relies on).
  */
class ScaleLintSpec extends SparkSpec {

  private def rules(df: org.apache.spark.sql.DataFrame): Set[String] =
    ScaleLint.lint(df).map(_.rule).toSet

  test("cartesian: fires on a keyless join of two large sides") {
    // both sides' stats exceed the broadcast threshold, so planning picks
    // CartesianProductExec rather than a broadcast nested loop
    val big1 = spark.range(3000000).select(col("id").as("a"))
    val big2 = spark.range(3000000).select(col("id").as("b"))
    assert(rules(big1.crossJoin(big2)).contains("cartesian"))
  }

  // a parquet scan grows with the data — the shape whose boundedness the
  // lint must refuse to assume (spark.range frames are parameter-bounded
  // by construction and correctly pass)
  private lazy val scanned = spark.read
    .parquet(s"$sfDir/documents.parquet")
    .select(col("doc_id"), (col("doc_id") % 7).as("k"), (col("doc_id") % 13).as("v"))

  test("nested-loop-join: fires when the broadcast side is unbounded, quiet when agg-bounded") {
    val big = scanned.select(col("doc_id").as("a"))
    // a filter of a scan is NOT structurally bounded
    val unbounded = scanned.select(col("doc_id").as("b")).filter(col("b") < 10)
    val flagged = big.crossJoin(broadcast(unbounded))
    assert(rules(flagged).contains("nested-loop-join"),
      s"expected nested-loop-join, got ${ScaleLint.lint(flagged)}")
    // the same shape with an aggregate beneath the broadcast side is the
    // parameter-bounded pattern and must pass
    val bounded = big.crossJoin(broadcast(
      scanned.select(col("doc_id").as("b")).groupBy(col("b")).agg(count(lit(1)).as("n")).limit(5)))
    assert(!rules(bounded).contains("nested-loop-join"))
    // Range sources are bounded by construction
    assert(!rules(big.crossJoin(broadcast(
      spark.range(100).select(col("id").as("b"))))).contains("nested-loop-join"))
  }

  test("nested-loop-join: boundedness is structural, not a subtree-exists") {
    // join(unboundedScan, aggregate) CONTAINS an aggregate but its output
    // grows with the scan — a subtree-exists judgment classifies it bounded
    // and lets the unbounded broadcast lint clean (the false negative).
    val big = scanned.select(col("doc_id").as("a"))
    val aggSide = scanned.groupBy(col("k")).agg(count(lit(1)).as("n"))
    val growsWithScan = scanned.select(col("doc_id").as("b"), (col("doc_id") % 7).as("k"))
      .join(aggSide, "k")
    val flagged = big.crossJoin(broadcast(growsWithScan))
    assert(rules(flagged).contains("nested-loop-join"),
      s"join(scan, agg) must read unbounded, got ${ScaleLint.lint(flagged)}")
    // whereas a join of two BOUNDED inputs is at most a product of caps —
    // still input-size-independent, and must keep passing
    val capped = aggSide.join(
      scanned.groupBy(col("v")).agg(count(lit(1)).as("m")).withColumnRenamed("v", "k"), "k")
    assert(!rules(big.crossJoin(broadcast(capped))).contains("nested-loop-join"))
  }

  test("global-window: fires over raw input, quiet over aggregated input and keyed windows") {
    val df = scanned
    val raw = df.withColumn("rn", row_number().over(Window.orderBy(col("v"), col("doc_id"))))
    assert(rules(raw).contains("global-window"))
    // value-domain form: the window input is already reduced by an aggregate
    val valueDomain = df.groupBy(col("v")).agg(count(lit(1)).as("c"))
      .withColumn("rk", row_number().over(Window.orderBy(col("v"))))
    assert(!rules(valueDomain).contains("global-window"))
    // keyed window partitions; never flagged
    val keyed = df.withColumn("rn",
      row_number().over(Window.partitionBy(col("k")).orderBy(col("v"), col("doc_id"))))
    assert(!rules(keyed).contains("global-window"))
  }

  test("interior-global-sort: root ordering is allowed; the rule exists as a net") {
    // a root orderBy (presentation semantics) must pass, including under a
    // trailing projection
    val df = spark.range(1000).select(col("id"), (col("id") % 7).as("k"))
    assert(!rules(df.orderBy(col("k"))).contains("interior-global-sort"))
    assert(!rules(df.orderBy(col("k")).select(col("k"))).contains("interior-global-sort"))
    // Catalyst's EliminateSorts removes most interior global sorts before
    // the physical plan (orderBy under agg/join never survives), which is
    // exactly why the gated surface shows zero hits; the rule stays as the
    // net for plans that preserve one (e.g. order-dependent expressions)
    val kept = df.orderBy(col("k")).withColumn("seq", monotonically_increasing_id())
    val fs = rules(kept)
    // whether the optimizer preserves this sort is version-dependent; the
    // assertion is only that linting such a plan never crashes and any
    // finding it produces is the interior-global-sort rule
    assert(fs.subsetOf(Set("interior-global-sort")), s"unexpected findings $fs")
  }
}
