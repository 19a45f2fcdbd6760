package graft.sources

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.RawLocalFileSystem
import org.apache.spark.sql.SparkSession

/** Local-disk FileSystem that answers for an object-store scheme — the
  * offline stand-in that lets the scheme→FileSystem resolution path run
  * end-to-end (URL parse → registry lookup → FileSystem.initialize →
  * open/list/read) in an environment without the real connector jars or
  * network. Deployments point `fs.<scheme>.impl` at the real connector;
  * tests point it here and read authority-less URLs (`gs:///local/path`),
  * which resolve against local disk. Mirrors the reference's ability to
  * register a custom store per scheme (object_store_registry/mod.rs:27-60). */
class LocalStandInFs extends RawLocalFileSystem {
  private var standInUri: URI = _
  override def initialize(name: URI, conf: Configuration): Unit = {
    standInUri = URI.create(s"${name.getScheme}:///")
    super.initialize(name, conf)
  }
  // The superclass *constructor* already calls getUri (via
  // getInitialWorkingDirectory), before initialize() has run — fall back
  // to file:/// until the real scheme is known.
  override def getUri: URI =
    if (standInUri == null) URI.create("file:///") else standInUri
}

/** Object-store registry (reference: object_store_registry/mod.rs:27-60 —
  * URL scheme → store resolution for s3/gs/abfs/hdfs).
  *
  * Spark resolves schemes through Hadoop FileSystem implementations, so the
  * mapping here is scheme → connector class + credential configs on
  * `sparkContext.hadoopConfiguration`. The connector jars (hadoop-aws,
  * gcs-connector, hadoop-azure) are deployment-time classpath additions —
  * absent in this zero-egress sandbox, which ContextSpec pins: the scheme
  * routing and config keys are asserted directly, and a read attempt must
  * fail on the *missing connector class*, never on an unknown scheme.
  */
object ObjectStores {

  /** Scheme → Hadoop FileSystem implementation (the registry's resolution
    * table; reference mod.rs:34-49 matches on url.scheme()). */
  def connectorClass(scheme: String): String = scheme match {
    case "s3" | "s3a" | "s3n" => "org.apache.hadoop.fs.s3a.S3AFileSystem"
    case "gs" => "com.google.cloud.hadoop.fs.gcs.GoogleHadoopFileSystem"
    case "abfs" => "org.apache.hadoop.fs.azurebfs.AzureBlobFileSystem"
    case "abfss" => "org.apache.hadoop.fs.azurebfs.SecureAzureBlobFileSystem"
    case "wasb" => "org.apache.hadoop.fs.azure.NativeAzureFileSystem"
    case "hdfs" => "org.apache.hadoop.hdfs.DistributedFileSystem"
    case other => throw new IllegalArgumentException(
      s"no object-store registered for scheme '$other' " +
        "(supported: s3/s3a/s3n, gs, abfs/abfss, wasb, hdfs)")
  }

  /** Fail fast with the deployment fix if `scheme`'s connector jar is not
    * on the classpath (instead of a task-time ClassNotFoundException). */
  def requireConnector(scheme: String): Unit = {
    val cls = connectorClass(scheme)
    try Class.forName(cls)
    catch {
      case _: ClassNotFoundException => throw new IllegalStateException(
        s"scheme '$scheme' resolves to $cls, which is not on the classpath; " +
          "add the connector jar (hadoop-aws / gcs-connector / hadoop-azure) " +
          "to the Spark deployment")
    }
  }

  /** S3-compatible store credentials/endpoint (reference mod.rs: the
    * AmazonS3Builder path; also covers MinIO-style custom endpoints). */
  def configureS3(spark: SparkSession, accessKey: String, secretKey: String,
                  endpoint: Option[String] = None,
                  region: Option[String] = None): Unit = {
    val c = spark.sparkContext.hadoopConfiguration
    c.set("fs.s3a.access.key", accessKey)
    c.set("fs.s3a.secret.key", secretKey)
    endpoint.foreach(c.set("fs.s3a.endpoint", _))
    region.foreach(c.set("fs.s3a.endpoint.region", _))
  }

  /** GCS service-account credentials. */
  def configureGcs(spark: SparkSession, projectId: String,
                   keyFile: Option[String] = None): Unit = {
    val c = spark.sparkContext.hadoopConfiguration
    c.set("fs.gs.project.id", projectId)
    keyFile.foreach { kf =>
      c.set("google.cloud.auth.service.account.enable", "true")
      c.set("google.cloud.auth.service.account.json.keyfile", kf)
    }
  }

  /** Azure ADLS Gen2 shared-key auth for one storage account. */
  def configureAbfs(spark: SparkSession, account: String, accountKey: String): Unit =
    spark.sparkContext.hadoopConfiguration
      .set(s"fs.azure.account.key.$account.dfs.core.windows.net", accountKey)

  /** Bind `scheme` (which must be in the registry's resolution table) to
    * the local-disk stand-in so a read through that scheme exercises the
    * full resolution path offline. Cache disabled so the binding takes
    * effect immediately and `removeLocalStandIn` fully reverts it. */
  def installLocalStandIn(spark: SparkSession, scheme: String): Unit = {
    connectorClass(scheme) // reject unknown schemes like the registry does
    val c = spark.sparkContext.hadoopConfiguration
    c.set(s"fs.$scheme.impl", classOf[LocalStandInFs].getName)
    c.setBoolean(s"fs.$scheme.impl.disable.cache", true)
  }

  /** Scan-scoped form of [[installLocalStandIn]]: pass these as reader
    * options (`spark.read.options(standInOptions("gs")).parquet("gs://…")`)
    * and Spark folds them into THAT relation's Hadoop configuration only
    * (`newHadoopConfWithOptions`) — the session-wide conf never changes, so
    * nothing leaks to later queries and no revert is needed. Preferred over
    * install/remove for lazily-executed plans, where a try/finally revert
    * around DataFrame construction would unbind the scheme before the scan
    * ever runs. */
  def standInOptions(scheme: String): Map[String, String] = {
    connectorClass(scheme) // reject unknown schemes like the registry does
    Map(s"fs.$scheme.impl" -> classOf[LocalStandInFs].getName,
      s"fs.$scheme.impl.disable.cache" -> "true")
  }

  /** Revert [[installLocalStandIn]]: the scheme resolves to its real
    * connector class again (and fails on its absence, as in production). */
  def removeLocalStandIn(spark: SparkSession, scheme: String): Unit = {
    val c = spark.sparkContext.hadoopConfiguration
    c.unset(s"fs.$scheme.impl")
    c.unset(s"fs.$scheme.impl.disable.cache")
  }
}
