package graft.cache

import scala.concurrent.duration.Duration

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Dataset-lifecycle cache: the Spark-first analog of the reference's
  * data-cache layer (ballista/core/src/cache_layer/policy/file.rs — an LRU
  * loading cache of whole objects from a slow source into a fast medium,
  * with measured sizes as the LRU weight and hit/miss metrics).
  *
  * Where the reference caches FILES (object-store path → local
  * memory/disk copy), the idiomatic Spark unit of caching is the
  * MATERIALIZED DATASET: `persist()` already gives a distributed,
  * spillable, columnar cache medium on the executors — what Spark does not
  * provide is the policy layer above it. Left alone, cached relations
  * accumulate until executors evict blocks at random under memory
  * pressure, which at 100 TB means the wrong thing silently gets slow.
  * This class adds the missing policy:
  *
  *  - '''Measured weights''': an entry's LRU weight is the byte size Spark
  *    reports for the materialized InMemoryRelation (post-`count()` plan
  *    statistics) — real bytes, not plan estimates, so a 100-TB deployment
  *    budget means what it says.
  *  - '''Byte-budget LRU + TTL''' via [[LruLoadingCache]]; eviction calls
  *    `unpersist` so executor storage memory is actually returned.
  *  - '''Single-flight materialization''': two queries racing to cache the
  *    same expensive intermediate materialize it once (the reference's
  *    loading-cache contract).
  *  - '''Metrics''' as a DataFrame ([[statusDf]]) so operational state is
  *    queryable through the same engine it describes (the reference exposes
  *    cache metrics through the scheduler; Spark-side the natural surface
  *    is a relation).
  *
  * Scale note: this registry is driver-side METADATA only (a name, a
  * DataFrame handle, a byte count per entry — bytes themselves live
  * distributed on the executors), so it scales with the number of cached
  * datasets, not data volume.
  */
final class DatasetCache(
    spark: SparkSession,
    maxBytes: Long,
    ttl: Duration = Duration.Inf,
    storageLevel: StorageLevel = StorageLevel.MEMORY_AND_DISK,
    clock: () => Long = () => System.nanoTime()) {

  private val ttlNanos =
    if (ttl.isFinite) ttl.toNanos else Long.MaxValue

  private val inner = new LruLoadingCache[String, DataFrame, () => DataFrame](
    loader = (_, build) => materialize(build()),
    maxWeight = maxBytes,
    weigher = (_, df) => materializedBytes(df),
    ttlNanos = ttlNanos,
    clock = clock,
    onEvict = (_, df, _) => df.unpersist(false))

  /** Get the cached materialization of `key`, building and persisting it on
    * first access (once, even under concurrent callers).
    */
  def getOrLoad(key: String)(build: => DataFrame): DataFrame =
    inner.get(key, () => build)

  /** Cached handle if present and fresh; never materializes. */
  def getIfPresent(key: String): Option[DataFrame] = inner.getIfPresent(key)

  /** Side-load an already-built DataFrame under `key` (it is persisted and
    * materialized here if it was not).
    */
  def put(key: String, df: DataFrame): Unit = inner.put(key, materialize(df))

  /** Drop one entry, returning its executor storage. */
  def invalidate(key: String): Unit = inner.invalidate(key)

  /** Drop everything, returning all executor storage. */
  def invalidateAll(): Unit = inner.invalidateAll()

  def stats: CacheStats = inner.stats

  def cachedKeys: Seq[String] = inner.keys

  /** Metrics snapshot as a relation (hit/miss/load/eviction counters plus
    * residency) — queryable alongside the data it manages.
    */
  def statusDf: DataFrame = {
    val s = stats
    import spark.implicits._
    Seq((s.hits, s.misses, s.loads, s.loadFailures, s.evictions,
      s.expirations, s.invalidations, s.weightUsed, s.entries.toLong))
      .toDF("hits", "misses", "loads", "load_failures", "evictions",
        "expirations", "invalidations", "bytes_cached", "entries")
  }

  private def materialize(df: DataFrame): DataFrame = {
    if (df.storageLevel == StorageLevel.NONE) df.persist(storageLevel)
    df.count() // force the InMemoryRelation to fill so sizes are measured
    df
  }

  /** Actual bytes of the materialized InMemoryRelation: re-planning the
    * logical plan substitutes the cached relation (QueryExecution's
    * withCachedData step), whose statistics after materialization come from
    * the accumulated batch sizes — measured storage, not estimates.
    */
  private def materializedBytes(df: DataFrame): Long = {
    val stats = spark.sessionState
      .executePlan(df.queryExecution.logical)
      .optimizedPlan
      .stats
    stats.sizeInBytes.min(BigInt(Long.MaxValue)).toLong
  }
}

/** Cluster/status surface: the analog of the reference scheduler's REST
  * status API (scheduler/src/api/handlers.rs exposes executors + job
  * state over HTTP; Spark's native story is the UI/REST server, and the
  * programmatic face of the same data is `SparkStatusTracker`). These
  * helpers expose it as relations so the `graft` entry points can serve
  * "what is the cluster doing" queries without leaving SQL.
  */
object ClusterStatus {

  /** One row per executor: endpoint, storage in use, active task count. */
  def executors(spark: SparkSession): DataFrame = {
    val t = spark.sparkContext.statusTracker
    val rows = t.getExecutorInfos.toSeq.map { e =>
      (e.host(), e.port(), e.cacheSize(), e.numRunningTasks())
    }
    import spark.implicits._
    rows.toDF("host", "port", "cached_bytes", "running_tasks")
  }

  /** One row per known job (grouped and ungrouped): id, status, stage
    * count. The tracker keeps a bounded recent window — this is a status
    * surface, not an event log (Spark's event log is the durable story).
    */
  def jobs(spark: SparkSession): DataFrame = {
    val t = spark.sparkContext.statusTracker
    val ids = (t.getJobIdsForGroup(null) ++ t.getActiveJobIds()).distinct
    jobRows(spark, ids)
  }

  /** The Spark jobs belonging to one submitted graft job (the per-job half
    * of the reference's status API: `get_job_status`, queried by the job
    * list handler with per-job completion state).
    */
  def jobsForGroup(spark: SparkSession, groupId: String): DataFrame =
    jobRows(spark, spark.sparkContext.statusTracker.getJobIdsForGroup(groupId))

  private def jobRows(spark: SparkSession, ids: Array[Int]): DataFrame = {
    val t = spark.sparkContext.statusTracker
    val rows = ids.toSeq.sorted.flatMap { id =>
      t.getJobInfo(id).map(j => (id, j.status().toString, j.stageIds().length))
    }
    import spark.implicits._
    rows.toDF("job_id", "status", "n_stages")
  }
}
