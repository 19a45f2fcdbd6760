package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import scala.concurrent.duration._

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.cache.{DatasetCache, EvictReason, LruLoadingCache, ClusterStatus}

/** The data-cache policy layer (reference ballista/cache: single-flight
  * loading cache, weighted LRU with a resource budget, TTL, metrics) —
  * policy machinery tested deterministically with an injected clock, then
  * the Spark integration tested against real persisted datasets.
  */
class CacheSpec extends SparkSpec {

  // ---- LruLoadingCache: pure policy machinery ------------------------------

  private def newCache(
      maxWeight: Long = 100L,
      ttlNanos: Long = Long.MaxValue,
      clock: () => Long = () => 0L,
      onEvict: (String, String, EvictReason) => Unit = (_, _, _) => ()) = {
    val loadCount = new AtomicInteger(0)
    val c = new LruLoadingCache[String, String, String](
      loader = (k, extra) => { loadCount.incrementAndGet(); s"$k-$extra" },
      maxWeight = maxWeight,
      weigher = (_, v) => v.length.toLong,
      ttlNanos = ttlNanos,
      clock = clock,
      onEvict = onEvict)
    (c, loadCount)
  }

  test("cache: hit/miss accounting and get_if_present never loads") {
    val (c, loads) = newCache()
    assert(c.getIfPresent("a").isEmpty)
    assert(loads.get() == 0)
    assert(c.get("a", "v1") == "a-v1")
    assert(c.get("a", "IGNORED") == "a-v1") // extra is not part of identity
    assert(c.getIfPresent("a").contains("a-v1"))
    val s = c.stats
    assert(s.misses == 1 && s.loads == 1 && s.hits == 2)
  }

  test("cache: weighted LRU evicts least-recently-used first, within budget") {
    val evicted = scala.collection.mutable.ArrayBuffer[(String, EvictReason)]()
    // weights: each value is "k-xxxx" = 6 chars; budget fits two entries
    val (c, _) = newCache(maxWeight = 13L,
      onEvict = (k, _, r) => evicted += ((k, r)))
    c.get("a", "xxxx"); c.get("b", "xxxx")
    c.get("a", "xxxx") // touch a: b becomes LRU
    c.get("c", "xxxx") // overflow: b must go, not a
    assert(evicted.toList == List(("b", EvictReason.Capacity)))
    assert(c.keys.toSet == Set("a", "c"))
    assert(c.stats.weightUsed == 12)
  }

  test("cache: an entry heavier than the whole budget is admitted transiently") {
    val (c, _) = newCache(maxWeight = 5L)
    assert(c.get("abcdefghij", "xxxx").nonEmpty) // weight 16 > budget 5
    assert(c.keys.size == 1) // admitted; evicted on the next insert
    c.get("b", "x")
    assert(c.keys == Seq("b"))
  }

  test("cache: TTL expiry reloads and counts, with a deterministic clock") {
    var now = 0L
    val (c, loads) = newCache(ttlNanos = 10L, clock = () => now)
    assert(c.get("a", "v1") == "a-v1")
    now = 5
    assert(c.get("a", "v2") == "a-v1") // fresh: still the first load
    now = 11
    assert(c.get("a", "v2") == "a-v2") // expired: reloaded with new extra
    assert(loads.get() == 2)
    val s = c.stats
    assert(s.expirations == 1 && s.loads == 2)
  }

  test("cache: concurrent gets for one key run the loader exactly once") {
    val started = new CountDownLatch(1)
    val loads = new AtomicInteger(0)
    val c = new LruLoadingCache[String, String, Unit](
      loader = (k, _) => {
        loads.incrementAndGet()
        started.await(5, TimeUnit.SECONDS) // hold the flight open
        k.toUpperCase
      },
      maxWeight = 100L,
      weigher = (_, _) => 1L)
    val pool = Executors.newFixedThreadPool(8)
    val results = (1 to 8).map(_ => pool.submit(
      new java.util.concurrent.Callable[String] {
        def call(): String = c.get("k", ())
      }))
    Thread.sleep(100) // let every thread reach the flight
    started.countDown()
    assert(results.map(_.get(5, TimeUnit.SECONDS)).toSet == Set("K"))
    pool.shutdown()
    assert(loads.get() == 1, "single-flight: one loader run for 8 callers")
    assert(c.stats.misses == 1 && c.stats.hits >= 0)
  }

  test("cache: a failed load propagates and a waiter retries the flight") {
    val attempts = new AtomicInteger(0)
    val c = new LruLoadingCache[String, String, Unit](
      loader = (k, _) => {
        if (attempts.incrementAndGet() == 1) sys.error("first load fails")
        k
      },
      maxWeight = 100L,
      weigher = (_, _) => 1L)
    intercept[RuntimeException] { c.get("k", ()) }
    assert(c.get("k", ()) == "k") // next caller retries and succeeds
    val s = c.stats
    assert(s.loadFailures == 1 && s.loads == 1)
  }

  test("cache: invalidate fires the evict listener with its reason") {
    val reasons = scala.collection.mutable.ArrayBuffer[EvictReason]()
    val (c, _) = newCache(onEvict = (_, _, r) => reasons += r)
    c.get("a", "v"); c.get("b", "v")
    c.invalidate("a")
    c.put("b", "replacement")
    c.invalidateAll()
    assert(reasons.toList == List(EvictReason.Invalidated,
      EvictReason.Replaced, EvictReason.Invalidated))
    assert(c.stats.entries == 0 && c.stats.weightUsed == 0)
  }

  // ---- DatasetCache: persist/unpersist lifecycle over real data ------------

  test("dataset cache: materializes once, reports measured bytes, unpersists on invalidate") {
    val cache = new DatasetCache(spark, maxBytes = 1L << 30)
    val builds = new AtomicInteger(0)
    def build() = {
      builds.incrementAndGet()
      spark.read.parquet(s"$sfDir/nation.parquet").select(col("n_nationkey"), col("n_name"))
    }
    val df1 = cache.getOrLoad("nation_slim")(build())
    val df2 = cache.getOrLoad("nation_slim")(build())
    assert(builds.get() == 1, "second get must be a hit, not a rebuild")
    assert(df1.storageLevel != StorageLevel.NONE, "must be persisted")
    assert(df2.count() == 25)
    val s = cache.stats
    assert(s.weightUsed > 0, "weight must be the measured materialized size")
    cache.invalidate("nation_slim")
    assert(df1.storageLevel == StorageLevel.NONE, "invalidate must unpersist")
    assert(cache.stats.entries == 0)
  }

  test("dataset cache: byte-budget LRU unpersists the cold dataset") {
    // learn one entry's real size, then set the budget to fit two
    val probe = new DatasetCache(spark, maxBytes = 1L << 30)
    probe.getOrLoad("p")(spark.read.parquet(s"$sfDir/region.parquet"))
    val one = probe.stats.weightUsed
    probe.invalidateAll()
    assert(one > 0)

    val cache = new DatasetCache(spark, maxBytes = one * 2 + one / 2)
    val a = cache.getOrLoad("a")(spark.read.parquet(s"$sfDir/region.parquet"))
    val b = cache.getOrLoad("b")(spark.read.parquet(s"$sfDir/region.parquet").filter(col("r_regionkey") >= 0))
    cache.getOrLoad("a")(sys.error("must be cached")) // touch a: b becomes LRU
    val c = cache.getOrLoad("c")(spark.read.parquet(s"$sfDir/region.parquet").filter(col("r_regionkey") >= -1))
    assert(cache.cachedKeys.toSet == Set("a", "c"))
    assert(b.storageLevel == StorageLevel.NONE, "evicted entry must unpersist")
    assert(a.storageLevel != StorageLevel.NONE)
    assert(c.storageLevel != StorageLevel.NONE)
    assert(cache.stats.evictions == 1)
    cache.invalidateAll()
  }

  test("dataset cache: TTL expiry with injected clock re-materializes") {
    var now = 0L
    val cache = new DatasetCache(spark, maxBytes = 1L << 30,
      ttl = 10.seconds, clock = () => now)
    val builds = new AtomicInteger(0)
    def build() = {
      builds.incrementAndGet()
      spark.read.parquet(s"$sfDir/region.parquet")
    }
    cache.getOrLoad("r")(build())
    now = 5.seconds.toNanos
    cache.getOrLoad("r")(build())
    assert(builds.get() == 1)
    now = 11.seconds.toNanos
    cache.getOrLoad("r")(build())
    assert(builds.get() == 2, "expired entry must re-materialize")
    assert(cache.stats.expirations == 1)
    cache.invalidateAll()
  }

  test("dataset cache: status relation carries the counters") {
    val cache = new DatasetCache(spark, maxBytes = 1L << 30)
    cache.getOrLoad("n")(spark.read.parquet(s"$sfDir/nation.parquet"))
    cache.getOrLoad("n")(sys.error("cached"))
    val row = cache.statusDf.collect()(0)
    assert(row.getAs[Long]("hits") == 1)
    assert(row.getAs[Long]("misses") == 1)
    assert(row.getAs[Long]("loads") == 1)
    assert(row.getAs[Long]("bytes_cached") > 0)
    assert(row.getAs[Long]("entries") == 1)
    cache.invalidateAll()
  }

  // ---- ClusterStatus: the scheduler status-API analog ----------------------

  test("cluster status: executors and jobs surface as relations") {
    // run something so the tracker has at least one job to report
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    val ex = ClusterStatus.executors(spark).collect()
    assert(ex.nonEmpty, "local mode reports the driver executor")
    assert(ex.head.getAs[Int]("running_tasks") >= 0)
    val jobs = ClusterStatus.jobs(spark)
    assert(jobs.columns.toSeq == Seq("job_id", "status", "n_stages"))
    assert(jobs.count() >= 0) // window may be empty under parallel suites; shape is the contract
  }
}
