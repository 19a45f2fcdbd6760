package graft.cache

import java.util.concurrent.CountDownLatch

/** Why an entry left the cache — mirrors the removal causes the reference's
  * cache-policy listener distinguishes (ballista/cache/src/listener/
  * cache_policy.rs: evict vs invalidate vs replace on put).
  */
sealed trait EvictReason
object EvictReason {
  /** LRU eviction to fit the weight budget (reference `put_lru` making room,
    * backend/policy/lru/mod.rs:36-44). */
  case object Capacity extends EvictReason
  /** TTL expiry observed on access. */
  case object Expired extends EvictReason
  /** Explicit `invalidate`/`invalidateAll`. */
  case object Invalidated extends EvictReason
  /** A `put` replaced an existing value for the key. */
  case object Replaced extends EvictReason
}

/** Point-in-time counters — the analog of the reference's loading-cache
  * metrics listener (ballista/cache/src/metrics/loading_cache.rs): hits,
  * misses, loader runs, and removals by cause, plus current residency.
  */
final case class CacheStats(
    hits: Long,
    misses: Long,
    loads: Long,
    loadFailures: Long,
    evictions: Long,
    expirations: Long,
    invalidations: Long,
    weightUsed: Long,
    entries: Int)

/** Single-flight loading cache with weighted-LRU eviction and TTL expiry.
  *
  * This is the policy machinery of the reference's `ballista-cache` crate
  * re-expressed as one small synchronous component (the reference splits it
  * into loading_cache/driver.rs + backend/policy/lru/lru_cache.rs +
  * listener/metrics layers around a tokio runtime; on Spark the driver-side
  * cache registry is plain JVM code — no async runtime to manage, the
  * expensive work happens in executors):
  *
  *  - '''Single-flight''': concurrent `get`s for the same key run the loader
  *    once; the other callers block until the value lands and then share it
  *    (the contract documented at loading_cache/mod.rs:33-37). If the loader
  *    throws, exactly one waiter is promoted to loader on retry — the others
  *    keep waiting on the new flight.
  *  - '''Weighted LRU''': each entry has a caller-supplied weight (measured
  *    bytes, not guesses — see [[DatasetCache]]); inserting evicts
  *    least-recently-used entries until the budget holds (the reference's
  *    `ResourceCounter` + `put_lru`). A single entry heavier than the whole
  *    budget is admitted transiently and evicted on the next insert, so one
  *    oversized dataset cannot wedge the cache.
  *  - '''TTL''': entries older than `ttlNanos` are treated as absent on
  *    access (evicted with [[EvictReason.Expired]], then reloaded). The clock
  *    is injectable so tests control time deterministically.
  *  - '''GetExtra''': the loader receives an `extra` argument supplied at
  *    `get` time that is not part of the key — the reference's `GetExtra`
  *    (loading_cache/mod.rs:52) — which is how [[DatasetCache]] passes the
  *    dataset-building thunk without making it part of cache identity.
  *
  * All state transitions run under one lock; loader invocations run outside
  * it (a slow load never blocks hits on other keys).
  */
final class LruLoadingCache[K, V, E](
    loader: (K, E) => V,
    maxWeight: Long,
    weigher: (K, V) => Long,
    ttlNanos: Long = Long.MaxValue,
    clock: () => Long = () => System.nanoTime(),
    onEvict: (K, V, EvictReason) => Unit = (_: K, _: V, _: EvictReason) => ()) {
  require(maxWeight > 0, "maxWeight must be positive")

  private final class Entry(val value: V, val weight: Long, val loadedAt: Long)

  // accessOrder=true: iteration order is LRU-first, get() refreshes recency
  private val entries = new java.util.LinkedHashMap[K, Entry](16, 0.75f, true)
  private val inFlight = new java.util.HashMap[K, CountDownLatch]
  private val lock = new Object
  private var weightUsed = 0L
  private var hits, misses, loads, loadFailures, evictions, expirations,
    invalidations = 0L

  /** Get-or-load. Returns the cached value, or runs the loader (once across
    * concurrent callers) and caches its result.
    */
  def get(k: K, extra: E): V = {
    while (true) {
      var awaitOther: CountDownLatch = null
      var myLatch: CountDownLatch = null
      lock.synchronized {
        val e = entries.get(k)
        if (e != null) {
          if (clock() - e.loadedAt <= ttlNanos) {
            hits += 1
            return e.value
          }
          dropEntry(k, e, EvictReason.Expired)
        }
        awaitOther = inFlight.get(k)
        if (awaitOther == null) {
          myLatch = new CountDownLatch(1)
          inFlight.put(k, myLatch)
          misses += 1
        }
      }
      if (myLatch != null) {
        // we won the flight: load outside the lock
        var v: Option[V] = None
        try {
          v = Some(loader(k, extra))
        } finally {
          lock.synchronized {
            if (v.isDefined) { loads += 1; insert(k, v.get) }
            else loadFailures += 1
            inFlight.remove(k)
          }
          myLatch.countDown()
        }
        return v.get
      }
      awaitOther.await()
      // loop: normally a hit now; if the entry was already evicted or the
      // flight failed, the re-check promotes one waiter to loader
    }
    throw new IllegalStateException("unreachable")
  }

  /** Cached value if present and fresh; never triggers the loader (the
    * reference's `get_if_present`, loading_cache/mod.rs:55-58).
    */
  def getIfPresent(k: K): Option[V] = lock.synchronized {
    val e = entries.get(k)
    if (e == null) None
    else if (clock() - e.loadedAt <= ttlNanos) { hits += 1; Some(e.value) }
    else { dropEntry(k, e, EvictReason.Expired); None }
  }

  /** Side-load a value, replacing any existing entry for the key. */
  def put(k: K, v: V): Unit = lock.synchronized {
    val old = entries.get(k)
    if (old != null) dropEntry(k, old, EvictReason.Replaced)
    insert(k, v)
  }

  def invalidate(k: K): Unit = lock.synchronized {
    val e = entries.get(k)
    if (e != null) { dropEntry(k, e, EvictReason.Invalidated); invalidations += 1 }
  }

  def invalidateAll(): Unit = lock.synchronized {
    val it = new java.util.ArrayList(entries.keySet()).iterator()
    while (it.hasNext) {
      val k = it.next()
      dropEntry(k, entries.get(k), EvictReason.Invalidated)
      invalidations += 1
    }
  }

  def stats: CacheStats = lock.synchronized {
    CacheStats(hits, misses, loads, loadFailures, evictions, expirations,
      invalidations, weightUsed, entries.size)
  }

  def keys: Seq[K] = lock.synchronized {
    import scala.jdk.CollectionConverters._
    entries.keySet().asScala.toSeq
  }

  // ---- internals (all callers hold `lock`) ---------------------------------

  private def insert(k: K, v: V): Unit = {
    val old = entries.get(k) // a racing put between flight start and finish
    if (old != null) dropEntry(k, old, EvictReason.Replaced)
    val w = math.max(0L, weigher(k, v))
    entries.put(k, new Entry(v, w, clock()))
    weightUsed += w
    // evict LRU-first until the budget holds; the fresh insert is
    // most-recently-used so it goes last, and only if it alone overflows
    val it = entries.entrySet().iterator()
    while (weightUsed > maxWeight && it.hasNext) {
      val eldest = it.next()
      if (eldest.getKey != k) {
        weightUsed -= eldest.getValue.weight
        evictions += 1
        it.remove()
        onEvict(eldest.getKey, eldest.getValue.value, EvictReason.Capacity)
      }
    }
  }

  private def dropEntry(k: K, e: Entry, reason: EvictReason): Unit = {
    entries.remove(k)
    weightUsed -= e.weight
    reason match {
      case EvictReason.Expired  => expirations += 1
      case EvictReason.Capacity => evictions += 1
      case _                    => ()
    }
    onEvict(k, e.value, reason)
  }
}
