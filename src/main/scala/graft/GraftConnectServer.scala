package graft

import org.apache.spark.sql.SparkSession

/** In-process Spark Connect endpoint — this repo's analog of the
  * reference's Arrow Flight SQL service (reference:
  * ballista/scheduler/src/flight_sql.rs:80-1008): an Arrow-native gRPC
  * wire protocol through which external clients (JDBC driver, PySpark
  * `remote()`, the JVM/Go/Rust Connect clients) run SQL and catalog
  * operations against the engine and stream results back as Arrow
  * batches.
  *
  * The mapping is intentionally thin: the reference hand-implements
  * statement lifecycle (CreatePreparedStatement/DoGet/DoPut, flight_sql.rs
  * handlers) over tonic; Spark ships the equivalent as the Connect
  * service, so the engine's job is only to host it on the graft session's
  * context — every Connect client session then sees the shared catalog
  * (external tables, databases) and, because [[GraftSession]] sets
  * `spark.sql.extensions=graft.GraftExtensions` as a static conf, the
  * graft planner strategies (TopK) apply inside Connect sessions too.
  * ConnectSpec drives a real JDBC-over-Connect client (isolated
  * classloader, separate wire session) against this endpoint and asserts
  * result equality with in-process execution.
  */
object GraftConnectServer {

  private val svc = org.apache.spark.sql.connect.service.SparkConnectService

  // started()/localPort() are private[connect] in Scala but public in
  // bytecode (Scala qualified-private erases to public) — reflection is the
  // supported-ABI way to read service state without shimming a class into
  // Spark's package namespace.
  private def svcState[T](method: String): T =
    svc.getClass.getMethod(method).invoke(svc).asInstanceOf[T]

  def isStarted: Boolean = svcState[java.lang.Boolean]("started").booleanValue()

  /** Start (idempotently) the Connect gRPC endpoint on this session's
    * SparkContext and return the bound port. Port selection follows
    * `spark.connect.grpc.binding.port` (default 15002), set on the live
    * SparkConf before first start when `port` is given. */
  def start(spark: SparkSession, port: Option[Int] = None): Int = synchronized {
    if (!isStarted) {
      port.foreach(p => org.apache.spark.SparkEnv.get.conf
        .set("spark.connect.grpc.binding.port", p.toString))
      svc.start(spark.sparkContext)
    }
    svcState[java.lang.Integer]("localPort").intValue()
  }

  /** Stop the endpoint (no-op when not running). */
  def stop(): Unit = synchronized {
    if (isStarted) svc.stop(None, None)
  }
}
