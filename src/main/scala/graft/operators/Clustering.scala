package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph clustering over candidate-pair output — the step that turns
  * near-duplicate PAIRS (Dedup.minhashPairs / simhashPairs / ngramJaccardPairs)
  * into duplicate CLUSTERS with one canonical keeper each, which is what a
  * training-data pipeline actually acts on (keep one doc per cluster).
  *
  * Reference scope note: the reference engine has no graph operators — this is
  * part of the beyond-reference training-data surface (brief §extensions), like
  * the pair generators it consumes.
  */
object Clustering {

  /** Connected components by iterative min-label propagation.
    *
    * Each iteration is one keyed shuffle (join edges with current labels on
    * the source endpoint, then a min-aggregate per node) — never an n² step —
    * and converges in O(component diameter) iterations. Near-duplicate
    * clusters are dense (every member collides with the keeper through shared
    * bands/chunks), so diameters are tiny in practice; for adversarial
    * long-chain graphs the alternating large-star/small-star variant
    * (Kiveris et al., "Connected Components in MapReduce", SoCC'14) bounds
    * rounds at O(log n) with the same per-round shuffle shape — the loop
    * below is the standard production form for dedup workloads.
    *
    * Lineage is truncated via [[Lineage.truncate]] every iteration so the plan
    * stays O(1) deep regardless of iteration count (without it, each round
    * re-plans all prior rounds and the driver OOMs on plan depth long before
    * data size matters). The convergence probe (`isEmpty` on changed labels)
    * is one cheap distributed action per round — the standard driver-side
    * control loop for iterative algorithms (same shape GraphX uses); no row
    * data ever reaches the driver.
    *
    * @param pairs undirected candidate edges, one row per pair
    * @return (node, label) — label is the minimum node id in the component
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 25): DataFrame = {
    // both edge directions from ONE evaluation of the (possibly expensive)
    // pair-generation subtree — a union of two selects over `pairs` would
    // recompute it per branch
    val edges = Lineage.truncate(pairs.select(explode(array(
        struct(col(aCol).as("a"), col(bCol).as("b")),
        struct(col(bCol).as("a"), col(aCol).as("b")))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .distinct())
    var labels = Lineage.truncate(edges.select(col("a").as("node")).distinct()
      .select(col("node"), col("node").as("label")))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val propagated = edges.join(labels.withColumnRenamed("node", "a"), Seq("a"))
        .select(col("b").as("node"), col("label"), lit(0).as("own"))
      // the node's previous label rides through the min-aggregate (own=1 rows
      // are exactly the old assignment, unique per node), so convergence is a
      // filter over the already-materialized result — not a join job
      // Round-14 note: a pointer-jump variant (v also receives
      // label(label(v)) via a self-join of the checkpointed labels) was
      // measured here in three formulations: it does cut rounds 10 -> 6 on
      // the sf0.1 rep graph, but each round gains the jump join's stages
      // and the measured wall/job-count was flat to worse (71-76 jobs,
      // 4.8-5.0 s -> 89 jobs, 5.5 s) — at this scale the loop is bounded
      // by per-stage scheduling, not by round count. Kept as the simple
      // O(diameter) form; the alternating large/small-star operator remains
      // the adversarial-diameter escape hatch.
      val next = Lineage.truncate(
        labels.select(col("node"), col("label"), lit(1).as("own"))
          .unionByName(propagated)
          .groupBy(col("node"))
          .agg(min(col("label")).as("label"),
            min(when(col("own") === 1, col("label"))).as("prev")))
      converged = next.filter(col("label") =!= col("prev")).isEmpty
      labels = next.select(col("node"), col("label"))
      iter += 1
    }
    require(converged, s"connectedComponents: no fixpoint after $maxIter iterations")
    labels
  }

  /** Connected components by alternating large-star / small-star rounds
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14) — O(log n) rounds regardless of component diameter, where
    * [[connectedComponents]]' min-label propagation needs O(diameter)
    * rounds. Use this variant when components can be long chains (e.g.
    * transitively-linked near-dups across shingled revisions); the dense
    * star-shaped clusters dedup normally produces converge in 2-3 rounds
    * under either algorithm.
    *
    * Each round is two keyed aggregate+join passes over the edge list:
    *  - large-star: every node points its LARGER neighbors at the minimum
    *    of its neighborhood (long tails fold toward minima in parallel),
    *  - small-star: every node folds its smaller-or-equal neighbors onto
    *    that minimum, producing star edges.
    * The edge list only shrinks toward the final star forest (one edge per
    * non-root node), so per-round cost is bounded by the input edge count.
    *
    * @return (node, label) with label = component minimum, identical to
    *         [[connectedComponents]] (spec-asserted on random graphs)
    */
  def connectedComponentsAlternating(pairs: DataFrame, aCol: String, bCol: String,
                                     maxRounds: Int = 20): DataFrame = {
    // canonical undirected form (lo, hi), self-loops dropped
    var edges = Lineage.truncate(pairs
      .select(least(col(aCol), col(bCol)).as("lo"), greatest(col(aCol), col(bCol)).as("hi"))
      .filter(col("lo") =!= col("hi"))
      .distinct())
    val allNodes = Lineage.truncate(edges.select(col("lo").as("node"))
      .unionByName(edges.select(col("hi").as("node")))
      .distinct())

    // Round 15 (second pass): each star phase computes its neighborhood
    // minimum with a WINDOW over one keyed exchange instead of a
    // groupBy-then-join — the join form shuffled the directed edge list
    // TWICE per phase (partial-agg exchange for m, raw-row exchange for the
    // join) where the window needs it once (guide §2.4: a window keyed like
    // the aggregation shares its shuffle). largeStar's intermediate
    // distinct is also dropped: its pre-distinct output is exactly one row
    // per input edge (only the v > u direction survives), smallStar's min
    // is duplicate-insensitive, and the round's final distinct subsumes it.
    // Net per round: 6 exchanges -> 3. The sf0.1 loop spent more driver
    // time scheduling its ~44 AQE-stage jobs than executing them (profiled
    // 2.2 s of gaps vs 1.4 s of loop job time); at cluster scale the same
    // change halves the shuffled bytes per round.

    def largeStar(e: DataFrame): DataFrame = {
      // neighborhoods over both directions; m(u) = min(Γ(u) ∪ {u}); both
      // directions from ONE evaluation of e via the two-struct explode
      val dir = e.select(explode(array(
          struct(col("lo").as("u"), col("hi").as("v")),
          struct(col("hi").as("u"), col("lo").as("v")))).as("d"))
        .select(col("d.u").as("u"), col("d.v").as("v"))
      val wu = Window.partitionBy(col("u"))
      dir.withColumn("m", least(min(col("v")).over(wu), col("u")))
        .filter(col("v") > col("u")) // larger neighbors re-point at the min
        // m ≤ u < v here, so (m, v) is canonical and never a self-loop
        .select(col("m").as("lo"), col("v").as("hi"))
    }

    def smallStar(e: DataFrame): DataFrame = {
      // orient toward the larger endpoint: u = hi, Γ⁻(u) = smaller neighbors
      val dir = e.select(col("hi").as("u"), col("lo").as("v"))
      val wu = Window.partitionBy(col("u"))
      // both output branches — smaller neighbors attach to the min, and u
      // itself attaches to the min — from ONE evaluation via a two-struct
      // explode; the final distinct is the round's only pair-level dedup
      dir.withColumn("m", min(col("v")).over(wu)) // all v < u
        .select(explode(array(
          struct(least(col("v"), col("m")).as("lo"), greatest(col("v"), col("m")).as("hi"),
            (col("v") =!= col("m")).as("keep")),
          struct(col("m").as("lo"), col("u").as("hi"), lit(true).as("keep")))).as("r"))
        .filter(col("r.keep"))
        .select(col("r.lo").as("lo"), col("r.hi").as("hi"))
        .filter(col("lo") =!= col("hi"))
        .distinct()
    }

    // Convergence probe (round 14): the loop's fixpoint is exactly a STAR
    // FOREST — every edge (lo, hi) is root→leaf, i.e. no node has two
    // parents (hi appearing twice) and no node is both child and parent
    // (hi also appearing as lo). A star forest is a fixpoint of
    // largeStar∘smallStar (roots are local minima since lo < hi per edge),
    // and Kiveris et al. §3 show the fixpoint edge set is always a star
    // forest — so probing the property BEFORE the round is equivalent to
    // the old next==edges comparison, but costs ONE aggregation job over
    // the checkpointed edges instead of two exceptAll set-differences plus
    // a full extra large/small-star round that computes no change.
    def isStarForest(e: DataFrame): Boolean =
      e.select(explode(array(
          struct(col("lo").as("node"), lit(0).as("child")),
          struct(col("hi").as("node"), lit(1).as("child")))).as("r"))
        .groupBy(col("r.node"))
        .agg(sum(col("r.child")).as("nc"), count(lit(1)).as("n"))
        // two parents, or child-and-parent (a chain) — either breaks a star
        .filter(col("nc") > 1 || (col("nc") === 1 && col("n") > 1))
        .isEmpty
    var converged = isStarForest(edges)
    var round = 0
    while (!converged && round < maxRounds) {
      edges = Lineage.truncate(smallStar(largeStar(edges)))
      round += 1
      converged = isStarForest(edges)
    }
    require(converged, s"connectedComponentsAlternating: no fixpoint after $maxRounds rounds")
    // fixpoint is a star forest: every non-root edge is (root, node)
    allNodes.join(edges.select(col("lo").as("label"), col("hi").as("node")), Seq("node"), "left")
      .select(col("node"), coalesce(col("label"), col("node")).as("label"))
  }

  /** Assign every document a duplicate-cluster id (min member id; docs in no
    * pair are their own singleton cluster) plus the cluster size and a keeper
    * flag — the canonical-selection step of a dedup pipeline. Two keyed
    * shuffles beyond the component loop. */
  def assignClusters(docs: DataFrame, idCol: String, pairs: DataFrame,
                     aCol: String, bCol: String): DataFrame =
    sizeAndFlag(docs.select(col(idCol).as("doc_id"))
      .join(connectedComponents(pairs, aCol, bCol).withColumnRenamed("node", "doc_id"),
        Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("label"), col("doc_id")).as("cluster_id")))

  /** SimHash near-dup clusters with the component loop run on
    * REPRESENTATIVE-level pairs (one node per distinct content) instead of
    * member-level pairs: a d-copy duplicate group contributes d² expanded
    * edges but zero extra connectivity, so at corpus scale — where duplicate
    * clusters dominate — the collapsed graph is orders of magnitude smaller.
    * Result is provably identical to clustering the expanded pairs: every
    * member connects to its representative (hamming 0 ≤ max), and each
    * representative is its group's minimum id, so the component minimum over
    * reps IS the minimum over all members. */
  def assignClustersSimhash(docs: DataFrame, idCol: String, textCol: String,
                            maxHamming: Int): DataFrame = {
    val (repPairs, memb, _) = Dedup.simhashRepPairs(docs, idCol, textCol, maxHamming)
    // Round 15: alternating star-contraction instead of min-label
    // propagation — the sf0.1 rep graph needed ~10 propagation rounds
    // (chained near-dups), and each round costs a fixed planning/scheduling
    // floor locally and a full |edges| join at scale; the alternating form
    // is O(log n) rounds with identical labels (component minimum,
    // spec-asserted equal on random graphs).
    val labels = connectedComponentsAlternating(repPairs, "rep_a", "rep_b")
    sizeAndFlag(memb
      .join(labels.withColumnRenamed("node", "rep_id"), Seq("rep_id"), "left")
      .select(col("member_id").as("doc_id"),
        coalesce(col("label"), col("rep_id")).as("cluster_id")))
  }

  private def sizeAndFlag(assigned: DataFrame): DataFrame = {
    val sizes = assigned.groupBy(col("cluster_id")).agg(count(lit(1)).as("cluster_size"))
    assigned.join(sizes, Seq("cluster_id"))
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
        (col("doc_id") === col("cluster_id")).as("is_keeper"))
  }
}
