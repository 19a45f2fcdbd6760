package graft

import graft.cache.{EvictReason, LruLoadingCache}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean
import org.scalatest.funsuite.AnyFunSuite

/** Differential test of [[LruLoadingCache]] against an independent model of
  * its documented semantics, over random operation sequences.
  *
  * CacheSpec pins the individual behaviors (single-flight, TTL expiry,
  * weighted eviction) with curated scenarios; what scenarios can't cover is
  * the interaction space — an expiry observed mid-get, followed by an
  * eviction triggered by the reload, followed by an invalidateAll whose
  * iteration order depends on every recency touch so far. The model here is
  * a ~40-line re-statement of the scaladoc contract (LRU order as an
  * explicit list, eviction as "drop LRU-first while over budget, never the
  * fresh insert"), built without looking at the implementation's data
  * structures, so agreement on keys-in-LRU-order + full stats after every
  * operation means the documented semantics and the code agree everywhere
  * the random walk reaches.
  */
class CacheLawsSpec extends AnyFunSuite {

  private sealed trait Op
  private case class GetOp(k: Int) extends Op
  private case class GetIfPresentOp(k: Int) extends Op
  private case class PutOp(k: Int) extends Op
  private case class InvalidateOp(k: Int) extends Op
  private case object InvalidateAllOp extends Op
  private case class Advance(d: Long) extends Op

  private val MaxWeight = 100L
  private val Ttl = 100L
  private def weight(k: Int): Long = (k % 4 + 1) * 10L

  /** The scaladoc contract as executable state. */
  private final class Model {
    var loadedAt = Map.empty[Int, Long]
    var lru = Vector.empty[Int] // LRU-first
    var now = 0L
    var hits, misses, loads, evictions, expirations, invalidations = 0L

    private def weightUsed: Long = lru.map(weight).sum
    private def touch(k: Int): Unit = lru = lru.filterNot(_ == k) :+ k
    private def drop(k: Int, expired: Boolean): Unit = {
      lru = lru.filterNot(_ == k)
      loadedAt -= k
      if (expired) expirations += 1
    }
    private def insert(k: Int): Unit = {
      lru = lru.filterNot(_ == k) :+ k
      loadedAt += k -> now
      while (weightUsed > MaxWeight && lru.exists(_ != k)) {
        val victim = lru.find(_ != k).get
        drop(victim, expired = false)
        evictions += 1
      }
    }
    private def fresh(k: Int): Boolean =
      loadedAt.get(k).exists(t => now - t <= Ttl)

    def get(k: Int): Unit =
      if (fresh(k)) { hits += 1; touch(k) }
      else {
        if (loadedAt.contains(k)) drop(k, expired = true)
        misses += 1; loads += 1; insert(k)
      }
    def getIfPresent(k: Int): Unit =
      if (fresh(k)) { hits += 1; touch(k) }
      else if (loadedAt.contains(k)) drop(k, expired = true)
    def put(k: Int): Unit = { if (loadedAt.contains(k)) drop(k, expired = false); insert(k) }
    def invalidate(k: Int): Unit =
      if (loadedAt.contains(k)) { drop(k, expired = false); invalidations += 1 }
    def invalidateAll(): Unit = { invalidations += lru.size; lru = Vector.empty; loadedAt = Map.empty }
    def weightNow: Long = weightUsed
  }

  private val opGen: Gen[Op] = {
    val key = Gen.choose(0, 5)
    Gen.frequency(
      8 -> key.map(GetOp),
      2 -> key.map(GetIfPresentOp),
      2 -> key.map(PutOp),
      2 -> key.map(InvalidateOp),
      1 -> Gen.const(InvalidateAllOp),
      3 -> Gen.choose(1L, 60L).map(Advance),
      1 -> Gen.choose(90L, 150L).map(Advance))
  }

  test("random op sequences: cache agrees with the documented-semantics model") {
    val prop = Prop.forAll(Gen.listOfN(300, opGen)) { ops =>
      var now = 0L
      val cache = new LruLoadingCache[Int, String, Unit](
        loader = (k, _) => k.toString,
        maxWeight = MaxWeight,
        weigher = (k, _) => weight(k),
        ttlNanos = Ttl,
        clock = () => now)
      val model = new Model

      ops.zipWithIndex.map { case (op, i) =>
        op match {
          case GetOp(k)          => cache.get(k, ()); model.get(k)
          case GetIfPresentOp(k) => cache.getIfPresent(k); model.getIfPresent(k)
          case PutOp(k)          => cache.put(k, k.toString); model.put(k)
          case InvalidateOp(k)   => cache.invalidate(k); model.invalidate(k)
          case InvalidateAllOp   => cache.invalidateAll(); model.invalidateAll()
          case Advance(d)        => now += d; model.now = now
        }
        val s = cache.stats
        val sameOrder = (cache.keys == model.lru) :|
          s"step $i $op: keys ${cache.keys} vs model ${model.lru}"
        val sameStats = (s.hits == model.hits && s.misses == model.misses &&
          s.loads == model.loads && s.evictions == model.evictions &&
          s.expirations == model.expirations &&
          s.invalidations == model.invalidations) :|
          s"step $i $op: stats $s vs model hits=${model.hits} misses=${model.misses} loads=${model.loads} ev=${model.evictions} exp=${model.expirations} inv=${model.invalidations}"
        val sameWeight = (s.weightUsed == model.weightNow && s.entries == model.lru.size) :|
          s"step $i $op: weight ${s.weightUsed}/${s.entries} vs model ${model.weightNow}/${model.lru.size}"
        sameOrder && sameStats && sameWeight
      }.foldLeft(Prop.passed: Prop)(_ && _)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, s"cache-model: $res")
  }
}
