package graft

import java.net.{URL, URLClassLoader}
import java.nio.file.{Files, Paths}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.functions._

/** Drives the Spark Connect endpoint ([[GraftConnectServer]], the
  * reference's Flight SQL analog — flight_sql.rs:80-1008) with a REAL
  * external client: the Connect JDBC driver, loaded in a child-first
  * classloader over the distribution's client jars so the client stack
  * (its own shaded gRPC/Arrow, its own Connect SparkSession) is exactly
  * what an out-of-process user would run — no class sharing with the
  * server-side Spark on the test classpath beyond the JDK.
  *
  * Asserts the three things a Flight SQL user needs: statement execution
  * with correct results (vs in-process execution of the same query),
  * catalog metadata visibility (shared catalog across the wire), and the
  * graft extension surface (TopK planner strategy from
  * `spark.sql.extensions`) resolving inside the isolated Connect session.
  */
class ConnectSpec extends SparkSpec {

  private val clientDir = "/opt/spark/jars/connect-repl"

  /** Child-first loader: client jars win over the test classpath so the
    * Connect client never sees server-side Spark classes; only the JDK
    * (platform loader) is shared, which is what makes the java.sql.Driver
    * interface usable across the boundary. */
  private final class ChildFirstLoader(urls: Array[URL], parent: ClassLoader)
      extends URLClassLoader(urls, parent) {
    override def loadClass(name: String, resolve: Boolean): Class[_] =
      getClassLoadingLock(name).synchronized {
        val loaded = findLoadedClass(name)
        val c =
          if (loaded != null) loaded
          else
            try findClass(name)
            catch { case _: ClassNotFoundException => super.loadClass(name, false) }
        if (resolve) resolveClass(c)
        c
      }
  }

  private def clientJars: Seq[java.nio.file.Path] = {
    val repl = Seq("spark-connect-client-jvm", "spark-connect-client-jdbc")
      .flatMap { prefix =>
        val d = Paths.get(clientDir)
        if (!Files.isDirectory(d)) Nil
        else {
          val it = Files.list(d).iterator()
          val hits = ArrayBuffer.empty[java.nio.file.Path]
          while (it.hasNext) {
            val p = it.next()
            if (p.getFileName.toString.startsWith(prefix)) hits += p
          }
          hits.toSeq
        }
      }
    val scalaLib = {
      val d = Paths.get("/opt/spark/jars")
      val it = Files.list(d).iterator()
      val hits = ArrayBuffer.empty[java.nio.file.Path]
      while (it.hasNext) {
        val p = it.next()
        val n = p.getFileName.toString
        // the client fat jar shades its gRPC/Arrow but expects the Spark
        // utility/api jars (the same set the distribution's connect-repl
        // launcher puts on a client-only classpath) plus their json/log deps
        if ((n.startsWith("scala-library") || n.startsWith("scala-reflect") ||
          n.startsWith("slf4j-api") || n.startsWith("spark-common-utils") ||
          n.startsWith("spark-sql-api") || n.startsWith("json4s-") ||
          n.startsWith("jackson-") || n.startsWith("paranamer") ||
          n.startsWith("commons-lang3") || n.startsWith("jul-to-slf4j") ||
          n.startsWith("scala-parser-combinators") || n.startsWith("log4j-") ||
          n.startsWith("spark-unsafe") || n.startsWith("icu4j") ||
          n.startsWith("kryo") || n.startsWith("minlog") || n.startsWith("objenesis") ||
          n.startsWith("scala-xml")) && n.endsWith(".jar")) hits += p
      }
      hits.toSeq
    }
    repl ++ scalaLib
  }

  private def haveClientJars: Boolean =
    clientJars.exists(_.getFileName.toString.startsWith("spark-connect-client-jdbc"))

  /** ONE loader + connection for the whole suite, closed in afterAll.
    * Per-test loaders are not an option: URLClassLoader instances share the
    * JVM-global JarFile cache, so closing one loader invalidates the cached
    * jar handles of every other loader over the same jar URLs (observed as
    * scala-library ClassNotFoundException in the NEXT test), and the
    * client's grpc worker threads outlive close() and die loading netty
    * callback classes. The driver class is instantiated reflectively
    * because it must come from the child loader, never the test
    * classpath. */
  private lazy val wire: java.sql.Connection = {
    val port = GraftConnectServer.start(spark, Some(15102))
    val loader = new ChildFirstLoader(
      clientJars.map(_.toUri.toURL).toArray, ClassLoader.getPlatformClassLoader)
    val drv = Class
      .forName("org.apache.spark.sql.connect.client.jdbc.NonRegisteringSparkConnectDriver",
        true, loader)
      .getDeclaredConstructor().newInstance().asInstanceOf[java.sql.Driver]
    val conn = drv.connect(s"jdbc:sc://localhost:$port", new java.util.Properties)
    assert(conn != null, "driver rejected the jdbc:sc:// URL")
    conn
  }

  override def afterAll(): Unit = {
    try if (haveClientJars) wire.close()
    finally super.afterAll()
  }

  private def withConnection(f: java.sql.Connection => Unit): Unit = {
    assume(haveClientJars, s"Connect client jars absent under $clientDir")
    f(wire)
  }

  /** Drain AND close: the client buffers results as Arrow batches and its
    * root allocator asserts zero outstanding buffers on connection close —
    * an unclosed ResultSet surfaces there as "Memory was leaked". */
  private def collectRows(rs: java.sql.ResultSet): Seq[Seq[Any]] =
    try {
      val n = rs.getMetaData.getColumnCount
      val out = ArrayBuffer.empty[Seq[Any]]
      while (rs.next()) out += (1 to n).map(rs.getObject)
      out.toSeq
    } finally rs.close()

  test("statement execution over the wire matches in-process results") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_connect")
    spark.sql("DROP TABLE IF EXISTS graft_connect.nation")
    spark.sql("CREATE TABLE graft_connect.nation USING parquet " +
      s"OPTIONS (path '$sfDir/nation.parquet')")
    val sql = """SELECT n_regionkey, COUNT(*) AS n, MIN(n_name) AS first_name
                |FROM graft_connect.nation
                |GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin
    val inProc = spark.sql(sql).collect()
      .map(r => Seq[Any](r.getInt(0), r.getLong(1), r.getString(2))).toSeq
    withConnection { conn =>
      val st = conn.createStatement()
      try {
        val wire = collectRows(st.executeQuery(sql))
          .map(r => Seq[Any](
            r(0).asInstanceOf[Number].intValue(),
            r(1).asInstanceOf[Number].longValue(), r(2)))
        assert(wire == inProc, s"wire=$wire inProc=$inProc")
      } finally st.close()
    }
  }

  test("catalog metadata is visible across the wire (shared catalog)") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_connect")
    spark.sql("DROP TABLE IF EXISTS graft_connect.nation")
    spark.sql("CREATE TABLE graft_connect.nation USING parquet " +
      s"OPTIONS (path '$sfDir/nation.parquet')")
    withConnection { conn =>
      val st = conn.createStatement()
      try {
        val tables = collectRows(st.executeQuery("SHOW TABLES IN graft_connect"))
        assert(tables.exists(_.exists(v => v != null && v.toString == "nation")),
          s"expected graft_connect.nation over the wire, got $tables")
      } finally st.close()
    }
  }

  test("schema + column metadata over the wire equal the in-process catalog") {
    // the Connect-side mirror of the reference's Flight SQL catalog
    // breadth (scheduler/src/flight_sql.rs:669-903 serves schemas and
    // column metadata, not just tables): SHOW SCHEMAS and DESCRIBE over
    // the wire must agree with the host session's catalog object-for-object
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_connect")
    spark.sql("DROP TABLE IF EXISTS graft_connect.nation")
    spark.sql("CREATE TABLE graft_connect.nation USING parquet " +
      s"OPTIONS (path '$sfDir/nation.parquet')")
    val inProcDbs = spark.catalog.listDatabases().collect().map(_.name).toSet
    val inProcCols = spark.sql("DESCRIBE TABLE graft_connect.nation").collect()
      .map(r => (r.getString(0), r.getString(1))).toList
    withConnection { conn =>
      val st = conn.createStatement()
      try {
        val wireDbs = collectRows(st.executeQuery("SHOW SCHEMAS"))
          .map(_.head.toString).toSet
        assert(inProcDbs.subsetOf(wireDbs),
          s"wire SHOW SCHEMAS missing ${inProcDbs.diff(wireDbs)} (wire: $wireDbs)")
        val wireCols = collectRows(st.executeQuery("DESCRIBE TABLE graft_connect.nation"))
          .map(r => (r(0).toString, r(1).toString)).toList
        assert(wireCols == inProcCols,
          s"wire DESCRIBE mismatch: wire=$wireCols inProc=$inProcCols")
      } finally st.close()
    }
  }

  test("graft TopK strategy applies inside the isolated Connect session") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_connect")
    spark.sql("DROP TABLE IF EXISTS graft_connect.orders")
    spark.sql("CREATE TABLE graft_connect.orders USING parquet " +
      s"OPTIONS (path '$sfDir/orders.parquet')")
    // the row_number()<=k idiom with the rank column discarded — the shape
    // TopKRewrite lowers to the bounded-heap physical operator. Running it
    // over the wire (and EXPLAINing it over the wire) proves the extension
    // (injected via static conf spark.sql.extensions) is live in the
    // Connect session, not just the host session
    val sql =
      """SELECT o_custkey, o_orderkey FROM (
        |  SELECT o_custkey, o_orderkey,
        |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM graft_connect.orders) WHERE rk <= 2
        |ORDER BY o_custkey, o_orderkey LIMIT 20""".stripMargin
    val inProc = spark.sql(sql).collect().map(_.toSeq).toSeq
    withConnection { conn =>
      val st = conn.createStatement()
      try {
        val plan = collectRows(st.executeQuery(s"EXPLAIN $sql"))
          .flatten.map(String.valueOf(_)).mkString("\n")
        assert(plan.contains("TopKPerKey"),
          s"TopK strategy absent from the Connect session's plan:\n$plan")
        val wire = collectRows(st.executeQuery(sql))
        assert(wire.length == inProc.length && wire.length > 0,
          s"wire rows ${wire.length} != in-process ${inProc.length}")
        // spot-check first row full equality modulo numeric boxing
        assert(wire.head.map(String.valueOf(_)) == inProc.head.map(String.valueOf(_)),
          s"first row differs: wire=${wire.head} inProc=${inProc.head}")
      } finally st.close()
    }
  }
}
