package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The `BallistaContext`-shaped entry point (reference:
  * ballista/client/src/context.rs:62-471 — `standalone`/`remote`
  * constructors, `read_json/avro/parquet/csv`, `register_*`, `sql`,
  * `context`), re-expressed over a `SparkSession`.
  *
  * Spark-first consequences: `remote` takes any Spark master URL because
  * cluster execution is native (the reference's scheduler/executor split is
  * Spark's driver/executor split); `standalone` is `local[*]`. All reads
  * return lazy DataFrames — Catalyst handles projection/predicate pushdown
  * that the reference gets from DataFusion.
  */
class GraftContext(val spark: SparkSession) {

  /** The underlying session (reference: `context()`, context.rs:348). */
  def session: SparkSession = spark

  /** Effective config surface (reference: `config()`, context.rs:75). */
  def config: Map[String, String] =
    GraftSession.configMapping.flatMap { case (ballistaKey, sparkKey) =>
      spark.conf.getOption(sparkKey).map(ballistaKey -> _)
    }

  // ---- reads (reference: context.rs:214-251) ----------------------------

  def readParquet(path: String): DataFrame = spark.read.parquet(path)

  def readCsv(path: String, hasHeader: Boolean = true,
              delimiter: String = ","): DataFrame =
    spark.read.option("header", hasHeader.toString)
      .option("delimiter", delimiter).option("inferSchema", "true").csv(path)

  def readJson(path: String): DataFrame = spark.read.json(path)

  /** Avro scan (reference: read_avro, context.rs:224-231). The packaged
    * Spark mapping is `spark.read.format("avro")` (spark-avro module); when
    * that module is absent — as in this build environment — the bridge over
    * Spark's bundled avro-mapred jars serves the same container files. */
  def readAvro(path: String): DataFrame = spark.read.format("avro").load(path)

  /** Avro scan via the bundled-jar bridge; `schema` states the Spark-side
    * column types, like `spark.read.schema(...)`. */
  def readAvro(path: String, schema: org.apache.spark.sql.types.StructType): DataFrame =
    graft.sources.AvroIo.read(spark, path, schema)

  /** Avro sink via the bundled-jar bridge (one container file per partition,
    * standard Hadoop commit protocol). */
  def writeAvro(df: DataFrame, path: String): Unit =
    graft.sources.AvroIo.write(df, path)

  /** Read from a runtime custom table provider (reference:
    * CustomTableScanNode registration, context.rs:254-262): any DataSource
    * V2 `TableProvider` by class name or DataSourceRegister short name. */
  def readTable(provider: String, options: Map[String, String] = Map.empty): DataFrame =
    options.foldLeft(spark.read.format(provider)) {
      case (r, (k, v)) => r.option(k, v)
    }.load()

  // ---- registration (reference: context.rs:254-315) ---------------------

  def registerTable(name: String, df: DataFrame): Unit =
    df.createOrReplaceTempView(name)

  def registerParquet(name: String, path: String): Unit =
    registerTable(name, readParquet(path))

  def registerCsv(name: String, path: String, hasHeader: Boolean = true,
                  delimiter: String = ","): Unit =
    registerTable(name, readCsv(path, hasHeader, delimiter))

  /** Avro registration (reference: register_avro, context.rs:303-315). */
  def registerAvro(name: String, path: String): Unit =
    registerTable(name, readAvro(path))

  def registerAvro(name: String, path: String,
                   schema: org.apache.spark.sql.types.StructType): Unit =
    registerTable(name, readAvro(path, schema))

  // ---- SQL (reference: context.rs:356-468, incl. SHOW handling gated on
  // with_information_schema — Spark serves SHOW/DESCRIBE natively) --------

  def sql(sqlText: String): DataFrame = spark.sql(sqlText)

  def sql(sqlText: String, args: Map[String, Any]): DataFrame =
    spark.sql(sqlText, args)

  /** Plan-level entry (reference: execute_logical_plan, context.rs:471):
    * materialize a hand-built Catalyst logical plan as a DataFrame — the
    * route custom operators (e.g. plans.TopKPerKey) take into the engine. */
  def executeLogicalPlan(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    org.apache.spark.sql.graft.ColumnBridge.ofRows(spark, plan)

  // ---- data-cache policy layer (reference: ballista/cache crate wired
  // through core/src/cache_layer — single-flight loading cache, byte-budget
  // LRU, metrics). Spark-first: the cache medium is persist()'s distributed
  // columnar storage; this adds the policy + metrics layer above it. ------

  /** Policy-managed dataset cache. Lazily constructed on first use with
    * `graft.cache.maxBytes` / `graft.cache.ttlSeconds` from the session conf
    * (defaults: 4 GiB, no TTL) — the reference sizes its file cache the same
    * way (executor config, executor.rs cache_capacity).
    */
  lazy val datasetCache: graft.cache.DatasetCache = {
    val maxBytes = spark.conf.getOption("graft.cache.maxBytes")
      .map(_.toLong).getOrElse(4L << 30)
    val ttl = spark.conf.getOption("graft.cache.ttlSeconds")
      .map(s => scala.concurrent.duration.Duration(s.toLong, "s"))
      .getOrElse(scala.concurrent.duration.Duration.Inf)
    new graft.cache.DatasetCache(spark, maxBytes, ttl)
  }

  /** Cache metrics as a relation (reference: cache metrics surfaced through
    * the scheduler; here they are queryable in the engine itself). */
  def cacheStatus: DataFrame = datasetCache.statusDf

  // ---- cluster status (reference: scheduler REST status API,
  // scheduler/src/api/handlers.rs — Spark-side the same data comes from
  // SparkStatusTracker, exposed here as relations) ------------------------

  def executorStatus: DataFrame = graft.cache.ClusterStatus.executors(spark)

  def jobStatus: DataFrame = graft.cache.ClusterStatus.jobs(spark)

  // ---- async job lifecycle (reference: submit → poll → cancel — REST
  // cancel_job, scheduler/src/api/handlers.rs:163-183 (404 on unknown id,
  // `cancelled: true` reply); gRPC cancel_job, scheduler_server/grpc.rs:
  // 588-611, fanning out to executor cancel_tasks, executor_server.rs:723).
  // Spark-first: a submitted job is the set of Spark jobs running under its
  // job group, and cancellation is Spark's native cooperative kill path
  // (cancelJobGroup with interruptOnCancel — codegen'd operators poll the
  // interrupt flag per row batch), so "cancel" reclaims executor slots
  // mid-stage without tearing anything down — on a 1000-executor cluster
  // that is the difference between killing a runaway 100-TB scan and
  // waiting it out. -------------------------------------------------------

  private val activeJobs =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]

  private lazy val submitEc =
    scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newCachedThreadPool { r =>
        val t = new Thread(r, "graft-submit")
        t.setDaemon(true)
        t
      })

  /** Run `body`'s Spark jobs asynchronously under job group `jobId`. The
    * returned future completes with the result, or fails with Spark's
    * cancellation error if [[cancel]] kills it first. Ids must be unique
    * among ACTIVE jobs (the reference's task manager keys running jobs the
    * same way).
    */
  def submit[T](jobId: String)(body: SparkSession => T): scala.concurrent.Future[T] = {
    require(activeJobs.putIfAbsent(jobId, java.lang.Boolean.TRUE) == null,
      s"job '$jobId' is already active")
    scala.concurrent.Future {
      spark.sparkContext.setJobGroup(jobId, s"graft job $jobId",
        interruptOnCancel = true)
      try body(spark)
      finally {
        spark.sparkContext.clearJobGroup()
        activeJobs.remove(jobId)
      }
    }(submitEc)
  }

  /** Cancel a submitted job: true if `jobId` was active and its Spark jobs
    * were told to die; false for an unknown/finished id (the handler's 404
    * case).
    */
  def cancel(jobId: String): Boolean =
    if (!activeJobs.containsKey(jobId)) false
    else {
      spark.sparkContext.cancelJobGroup(jobId)
      true
    }

  /** Per-job status relation: the Spark jobs that ran under `jobId`'s group
    * (the reference's get_job_status surface). Named distinctly from the
    * all-jobs [[jobStatus]] relation — `jobStatus(id)` would be ambiguous
    * with `DataFrame.apply(colName)` on it. */
  def jobStatusFor(jobId: String): DataFrame =
    graft.cache.ClusterStatus.jobsForGroup(spark, jobId)
}

object GraftContext {

  /** In-process context (reference: `standalone`, context.rs:144). */
  def standalone(shufflePartitions: Int = 32): GraftContext =
    new GraftContext(GraftSession.getOrCreate("local[*]", shufflePartitions))

  /** Cluster context (reference: `remote(host, port)`, context.rs:87) —
    * any Spark master URL (spark://, yarn, k8s://). */
  def remote(master: String, shufflePartitions: Int = 32): GraftContext =
    new GraftContext(GraftSession.getOrCreate(master, shufflePartitions))
}
