package graft

import org.apache.spark.sql.expressions.Aggregator
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Udafs

/** Property laws for the mergeable sketch aggregators.
  *
  * The `agg_kll` / `txt_heavyhitters` / `agg_wpercentile_udaf` gates verify
  * each sketch's invariant end-to-end on ONE dataset under Spark's actual
  * partitioning; what they cannot vary is the partitioning itself. At
  * cluster scale that is exactly what varies — partial buffers arrive in
  * whatever order and grouping the shuffle produces, and a sketch whose
  * invariant silently depends on chunk boundaries or merge-tree shape
  * produces wrong answers only at scale, where no oracle is watching.
  * These properties re-state each gate's invariant over randomized inputs,
  * randomized chunk boundaries, and both left-fold and balanced merge
  * trees (the two shapes a two-phase aggregate actually produces: the
  * reduce-side fold and AQE's partial-merge combines).
  *
  * No SparkSession: Aggregator reduce/merge/finish are plain JVM calls, so
  * hundreds of randomized cases run in milliseconds.
  */
class SketchLawsSpec extends AnyFunSuite {

  private def check(name: String, prop: Prop, n: Int = 300): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, s"$name: $res")
  }

  /** Split `xs` at positions derived from `cuts`, reduce each chunk from
    * zero, then merge the partials — left fold or balanced tree. This is
    * the shape of a two-phase aggregate with arbitrary partition
    * boundaries. */
  private def viaPartials[I, B](agg: Aggregator[I, B, _], xs: List[I],
      cuts: List[Int], balanced: Boolean): B = {
    val pos = cuts.map(c => math.abs(c % (xs.size + 1)))
      .filter(p => p > 0 && p < xs.size).distinct.sorted
    val bounds = (0 +: pos) :+ xs.size
    val partials = bounds.zip(bounds.tail).map { case (a, b) =>
      xs.slice(a, b).foldLeft(agg.zero)(agg.reduce)
    }
    def tree(ps: Seq[B]): B = ps match {
      case Seq(one) => one
      case _ =>
        val (l, r) = ps.splitAt(ps.length / 2)
        agg.merge(tree(l), tree(r))
    }
    if (partials.isEmpty) agg.zero
    else if (balanced) tree(partials)
    else partials.reduceLeft(agg.merge)
  }

  private val cutsGen = Gen.listOf(Gen.choose(0, 1 << 20))

  // ---- Misra-Gries ---------------------------------------------------------

  // skewed term stream: term i drawn with weight 31-i over a 30-term domain,
  // so a few heavy hitters dominate and the K=8 summary genuinely decrements
  private val termGen: Gen[String] =
    Gen.frequency((1 to 30).map(i => (31 - i, Gen.const(s"t$i"))): _*)

  test("Misra-Gries: estimate and coverage bounds hold under any partitioning") {
    val gen = for {
      n <- Gen.choose(0, 800)
      xs <- Gen.listOfN(n, termGen)
      cuts <- cutsGen
      balanced <- Gen.oneOf(true, false)
    } yield (xs, cuts, balanced)
    check("misra-gries", Prop.forAll(gen) { case (xs, cuts, balanced) =>
      val buf = viaPartials(Udafs.MisraGries, xs, cuts, balanced)
      val truth = xs.groupBy(identity).map { case (t, g) => t -> g.size.toLong }
      val sizeOk = buf.counts.size <= Udafs.MisraGries.K
      // never overcount, and the undercount is bounded by the tracked err
      val boundsOk = buf.counts.forall { case (t, c) =>
        c >= 1 && c <= truth(t) && truth(t) - c <= buf.err
      }
      // anything the summary dropped had true count <= err, so every item
      // with true > err is guaranteed present
      val coverOk = truth.forall { case (t, n) =>
        buf.counts.contains(t) || n <= buf.err
      }
      (sizeOk :| s"size ${buf.counts.size}") &&
        (boundsOk :| s"bounds: $buf vs $truth") &&
        (coverOk :| s"coverage: $buf vs $truth")
    })
  }

  // ---- KLL quantile sketch -------------------------------------------------

  private val kllValueGen: Gen[Double] =
    Gen.oneOf(Gen.choose(0, 50).map(_.toDouble), Gen.choose(0.0, 1.0))

  test("KLL: weight conservation and the gate's rank invariant hold under any partitioning") {
    val gen = for {
      n <- Gen.choose(0, 1500)
      xs <- Gen.listOfN(n, kllValueGen)
      cuts <- cutsGen
      balanced <- Gen.oneOf(true, false)
    } yield (xs, cuts, balanced)
    check("kll", Prop.forAll(gen) { case (xs, cuts, balanced) =>
      val b = viaPartials(Udafs.KllSketch, xs, cuts, balanced)
      val weight = b.levels.zipWithIndex
        .map { case (l, i) => l.size.toLong << i }.sum
      val weightOk = (weight == b.n && b.n == xs.size) :|
        s"weight $weight != n ${b.n} (input ${xs.size})"
      if (xs.isEmpty) weightOk
      else {
        // the agg_kll gate's invariant, verbatim: for t = max(1, ceil(q*n)),
        // count(x <= est) >= t - err and count(x < est) <= t - 1 + err
        val rankOk = Seq(0.05, 0.25, 0.5, 0.75, 0.95).map { q =>
          val t = math.max(1L, math.ceil(q * b.n).toLong)
          val est = Udafs.kllValueAtRank(b.levels, t)
          val nLe = xs.count(_ <= est).toLong
          val nLt = xs.count(_ < est).toLong
          (nLe >= t - b.err && nLt <= t - 1 + b.err) :|
            s"q=$q t=$t est=$est nLe=$nLe nLt=$nLt err=${b.err} n=${b.n}"
        }.reduce(_ && _)
        weightOk && rankOk
      }
    })
  }

  test("KLL: err stays zero (sketch exact) while inputs fit one level") {
    val gen = for {
      n <- Gen.choose(1, Udafs.KllSketch.K) // never exceeds level 0
      xs <- Gen.listOfN(n, kllValueGen)
      cuts <- cutsGen
    } yield (xs, cuts)
    check("kll-exact", Prop.forAll(gen) { case (xs, cuts) =>
      val b = viaPartials(Udafs.KllSketch, xs, cuts, balanced = false)
      // below capacity nothing compacts...

      // ...unless a merge momentarily exceeds K; chunks of a K-sized input
      // can do that, so only the single-chunk case is guaranteed exact
      val single = viaPartials(Udafs.KllSketch, xs, Nil, balanced = false)
      (single.err == 0L) :| s"uncompacted sketch has err ${single.err}" &&
        (b.n == xs.size) :| "n conserved"
    })
  }

  // ---- weighted percentile -------------------------------------------------

  test("weighted percentile: exact below the compaction cap for any partitioning") {
    val gen = for {
      n <- Gen.choose(1, 400)
      // <= 60 distinct values (far under Cap) and integer weights: weight
      // sums are FP-exact, so every chunking produces identical cumulative
      // weights and the result must be bit-identical to the single-pass one
      xs <- Gen.listOfN(n, Gen.zip(
        Gen.choose(0, 59).map(_.toDouble), Gen.choose(1, 10).map(_.toDouble)))
      q <- Gen.choose(1, 99).map(_ / 100.0)
      cuts <- cutsGen
      balanced <- Gen.oneOf(true, false)
    } yield (xs, q, cuts, balanced)
    check("weighted-percentile", Prop.forAll(gen) { case (xs, q, cuts, balanced) =>
      val rows = xs.map { case (v, w) => (v, w, q) }
      val got = Udafs.WeightedPercentile.finish(
        viaPartials(Udafs.WeightedPercentile, rows, cuts, balanced))
      // reference: smallest value whose cumulative weight reaches q of total
      val byValue = xs.groupBy(_._1).view
        .mapValues(_.map(_._2).sum).toArray.sortBy(_._1)
      val tot = byValue.map(_._2).sum
      val want = byValue.find {
        var cum = 0.0
        p => { cum += p._2; cum >= q * tot }
      }.map(_._1).getOrElse(byValue.last._1)
      (got == want) :| s"got $got want $want (q=$q)"
    })
  }

  test("sum-of-squares: partition-invariant and equal to the direct sum") {
    val gen = for {
      xs <- Gen.listOf(Gen.choose(-1000L, 1000L))
      cuts <- cutsGen
      balanced <- Gen.oneOf(true, false)
    } yield (xs, cuts, balanced)
    check("sum-squares", Prop.forAll(gen) { case (xs, cuts, balanced) =>
      val got = viaPartials(Udafs.SumSquares, xs, cuts, balanced)
      val want = xs.map(x => x * x).sum
      (got == want) :| s"got $got want $want"
    })
  }
}
