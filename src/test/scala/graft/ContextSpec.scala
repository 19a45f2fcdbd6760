package graft

import org.apache.spark.sql.functions._

/** GraftContext — the BallistaContext-shaped API shell. */
class ContextSpec extends SparkSpec {

  private lazy val ctx = new GraftContext(spark)

  test("read_parquet + register_table + sql round-trip") {
    ctx.registerParquet("ctx_nation", s"$sfDir/nation.parquet")
    val out = ctx.sql("SELECT COUNT(*) AS n FROM ctx_nation").collect()
    assert(out.head.getAs[Long]("n") == 25L)
  }

  test("read_csv honors header and delimiter") {
    val p = s"${sys.props("java.io.tmpdir")}/graft_ctx_csv"
    ctx.readParquet(s"$sfDir/region.parquet")
      .write.mode("overwrite").option("header", "true").option("delimiter", ";").csv(p)
    val back = ctx.readCsv(p, hasHeader = true, delimiter = ";")
    assert(back.count() == 5)
    assert(back.columns.toSet == Set("r_regionkey", "r_name"))
  }

  test("parameterized sql matches literal sql") {
    ctx.registerParquet("ctx_orders", s"$sfDir/orders.parquet")
    val a = ctx.sql("SELECT COUNT(*) AS n FROM ctx_orders WHERE o_totalprice > :p",
      Map("p" -> 200000)).collect().head.getLong(0)
    val b = ctx.sql("SELECT COUNT(*) AS n FROM ctx_orders WHERE o_totalprice > 200000")
      .collect().head.getLong(0)
    assert(a == b && a > 0)
  }

  test("config maps ballista keys onto live spark conf") {
    val cfg = ctx.config
    assert(cfg("ballista.shuffle.partitions") == spark.conf.get("spark.sql.shuffle.partitions"))
    assert(cfg("ballista.job.name") == spark.conf.get("spark.app.name"))
    assert(cfg("ballista.repartition.aggregations") ==
      spark.conf.get("spark.sql.adaptive.enabled"))
    assert(cfg("ballista.batch.size") ==
      spark.conf.get("spark.sql.parquet.columnarReaderBatchSize"))
  }

  test("context cache + status surfaces: managed dataset round-trips, metrics and executors query") {
    val df = ctx.datasetCache.getOrLoad("ctx_nation") {
      ctx.readParquet(s"$sfDir/nation.parquet")
    }
    assert(df.count() == 25)
    ctx.datasetCache.getOrLoad("ctx_nation")(sys.error("must be cached"))
    val st = ctx.cacheStatus.collect()(0)
    assert(st.getAs[Long]("hits") >= 1 && st.getAs[Long]("bytes_cached") > 0)
    assert(ctx.executorStatus.count() >= 1)
    assert(ctx.jobStatus.columns.toSeq == Seq("job_id", "status", "n_stages"))
    ctx.datasetCache.invalidateAll()
    assert(ctx.cacheStatus.collect()(0).getAs[Long]("entries") == 0)
  }

  // ---- EXPLAIN / ANALYZE (reference: ExplainNode/AnalyzeNode,
  // core/proto/datafusion.proto — EXPLAIN returns the plan as rows, ANALYZE
  // executes and reports; both are engine-specific text by design, so they
  // are pinned by spec rather than a DuckDB oracle row) ---------------------

  test("register_avro + execute_logical_plan close the client API surface") {
    val dir = java.nio.file.Files.createTempDirectory("ctx-avro").toFile
    dir.deleteOnExit()
    val nation = ctx.readParquet(s"$sfDir/nation.parquet")
    ctx.writeAvro(nation, s"$dir/nation_avro")
    ctx.registerAvro("ctx_nation_avro", s"$dir/nation_avro", nation.schema)
    assert(ctx.sql("SELECT COUNT(*) AS n FROM ctx_nation_avro")
      .collect()(0).getLong(0) == 25)
    // plan-level entry: the already-analyzed plan of a built DataFrame
    // re-enters through executeLogicalPlan and plans identically
    val plan = nation.filter(col("n_regionkey") === 1)
      .select(col("n_name")).queryExecution.logical
    val viaPlan = ctx.executeLogicalPlan(plan).collect().map(_.getString(0)).sorted
    val direct = nation.filter(col("n_regionkey") === 1)
      .select(col("n_name")).collect().map(_.getString(0)).sorted
    assert(viaPlan.sameElements(direct) && viaPlan.length == 5)
  }

  test("job lifecycle: submit runs async under its id, cancel kills it mid-stage") {
    import scala.concurrent.Await
    import scala.concurrent.duration._
    // a scan long enough to be mid-flight when the cancel lands: codegen'd
    // range+sum polls the task interrupt flag per row batch
    val fut = ctx.submit("ctx-cancel") { s =>
      s.range(1L << 42).selectExpr("sum(id) AS s").collect()
    }
    val tracker = spark.sparkContext.statusTracker
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (tracker.getJobIdsForGroup("ctx-cancel").isEmpty &&
           System.nanoTime() < deadline) Thread.sleep(20)
    assert(tracker.getJobIdsForGroup("ctx-cancel").nonEmpty, "job never started")
    // duplicate ACTIVE ids are rejected (task-manager keying)
    assertThrows[IllegalArgumentException] { ctx.submit("ctx-cancel")(_ => ()) }
    assert(ctx.cancel("ctx-cancel"), "active job reports cancelled: true")
    val err = intercept[Exception] { Await.result(fut, 60.seconds) }
    assert(err.getMessage.toLowerCase.contains("cancel"), s"got: ${err.getMessage}")
    // the per-job status relation saw the group's Spark jobs
    val statuses = ctx.jobStatusFor("ctx-cancel").collect().map(_.getString(1))
    assert(statuses.nonEmpty && statuses.forall(s => s == "FAILED" || s == "RUNNING"))
    // drained id now reports false — the REST handler's 404 case
    assert(!ctx.cancel("ctx-cancel"))
    assert(!ctx.cancel("never-submitted"))
    // the context stays fully usable after a cancellation
    val ok = ctx.submit("ctx-after") { s =>
      s.range(100).selectExpr("sum(id) AS s").collect()(0).getLong(0)
    }
    assert(Await.result(ok, 60.seconds) == 4950L)
  }

  test("EXPLAIN through SQL returns the physical plan with pushdown visible") {
    ctx.registerParquet("ctx_lineitem", s"$sfDir/lineitem.parquet")
    val rows = ctx.sql(
      "EXPLAIN FORMATTED SELECT l_orderkey FROM ctx_lineitem WHERE l_quantity > 10")
      .collect()
    assert(rows.nonEmpty)
    val text = rows.map(_.getString(0)).mkString("\n")
    assert(text.contains("Scan parquet"), text.take(500))
    assert(text.contains("PushedFilters") && text.contains("l_quantity"),
      "EXPLAIN output must show the filter pushed into the scan:\n" + text.take(800))
  }

  test("ANALYZE TABLE records size and row-count statistics in the catalog") {
    ctx.sql("DROP TABLE IF EXISTS ctx_supplier_stats")
    // the in-memory catalog forgets tables across sessions but the warehouse
    // dir survives — clear it so saveAsTable never trips LOCATION_ALREADY_EXISTS
    val loc = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"), "ctx_supplier_stats")
    org.apache.commons.io.FileUtils.deleteQuietly(loc)
    ctx.readParquet(s"$sfDir/supplier.parquet")
      .write.mode("overwrite").saveAsTable("ctx_supplier_stats")
    ctx.sql("ANALYZE TABLE ctx_supplier_stats COMPUTE STATISTICS")
    val stats = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier("ctx_supplier_stats"))
      .stats
    assert(stats.isDefined, "no stats recorded after ANALYZE")
    assert(stats.get.rowCount.exists(_.toLong > 0), s"rowCount missing: ${stats.get}")
    assert(stats.get.sizeInBytes > 0, s"sizeInBytes missing: ${stats.get}")
    ctx.sql("DROP TABLE ctx_supplier_stats")
  }

  // ---- dynamic UDF plugin (reference: core/src/plugin/udf.rs:29-53 —
  // UDFPlugin implementations loaded from a plugin dir register named UDFs).
  // Spark analog: a separate jar shipped via --jars/addJar, loaded
  // reflectively, registering through spark.udf — after which the function
  // resolves by name in SQL like a built-in.

  test("separate-artifact UDF plugin registers a function resolvable by name") {
    val dir = new java.io.File("plugin/target/scala-2.13")
    val jars = Option(dir.listFiles()).toSeq.flatten
      .filter(_.getName.endsWith(".jar"))
    assert(jars.nonEmpty, s"plugin jar not built under $dir (udfplugin/package)")
    val jar = jars.maxBy(_.lastModified)
    spark.sparkContext.addJar(jar.getAbsolutePath) // executor-side shipping
    val loader = new java.net.URLClassLoader(
      Array(jar.toURI.toURL), getClass.getClassLoader)
    val cls = loader.loadClass("graftplugin.GraftUdfPlugin$")
    val module = cls.getField("MODULE$").get(null)
    cls.getMethod("register", classOf[org.apache.spark.sql.SparkSession])
      .invoke(module, spark)
    val out = spark.sql(
      "SELECT graft_plugin_shout(r_name) AS s FROM parquet.`" + sfDir +
        "/region.parquet` ORDER BY s").collect().map(_.getString(0))
    assert(out.length == 5 && out.head == "AFRICA!" && out.forall(_.endsWith("!")))
  }

  // ---- object-store registry (reference: object_store_registry/mod.rs:
  // 27-60). The connector jars are deployment-time classpath additions —
  // absent here — so these pin what IS testable without egress: the
  // scheme→connector routing, the credential config keys, and that a read
  // attempt dies on the missing connector class, never an unknown scheme.

  test("object-store schemes resolve to the right connector classes") {
    import graft.sources.ObjectStores
    assert(ObjectStores.connectorClass("s3a") === "org.apache.hadoop.fs.s3a.S3AFileSystem")
    assert(ObjectStores.connectorClass("s3") === ObjectStores.connectorClass("s3n"))
    assert(ObjectStores.connectorClass("gs").contains("GoogleHadoopFileSystem"))
    assert(ObjectStores.connectorClass("abfss").contains("SecureAzureBlobFileSystem"))
    assert(ObjectStores.connectorClass("hdfs").contains("DistributedFileSystem"))
    val e = intercept[IllegalArgumentException](ObjectStores.connectorClass("ftp"))
    assert(e.getMessage.contains("no object-store registered"))
  }

  test("s3/gcs/abfs credentials land on the canonical hadoop config keys") {
    import graft.sources.ObjectStores
    ObjectStores.configureS3(spark, "AK", "SK",
      endpoint = Some("http://minio:9000"), region = Some("us-east-1"))
    ObjectStores.configureGcs(spark, "proj-1", keyFile = Some("/tmp/key.json"))
    ObjectStores.configureAbfs(spark, "acct", "b64key")
    val c = spark.sparkContext.hadoopConfiguration
    assert(c.get("fs.s3a.access.key") === "AK")
    assert(c.get("fs.s3a.secret.key") === "SK")
    assert(c.get("fs.s3a.endpoint") === "http://minio:9000")
    assert(c.get("fs.s3a.endpoint.region") === "us-east-1")
    assert(c.get("fs.gs.project.id") === "proj-1")
    assert(c.get("google.cloud.auth.service.account.json.keyfile") === "/tmp/key.json")
    assert(c.get("fs.azure.account.key.acct.dfs.core.windows.net") === "b64key")
  }

  // ---- JDBC entry point (reference: scheduler/src/flight_sql.rs:80-1008 —
  // the Flight SQL lifecycle: handshake, statement execution, catalog
  // metadata queries). Spark's analog is the Thrift/HiveServer2 endpoint:
  // start it on the live session, connect over JDBC, and assert both a
  // query and the catalog metadata round-trip match the in-process run.

  test("JDBC/Thrift entry point: query + catalog metadata match in-process") {
    import org.apache.spark.sql.hive.thriftserver.HiveThriftServer2
    // a cloned session isolates the server's conf side effects (it flips
    // spark.sql.datetime.java8API.enabled on the session it's handed,
    // which would leak into concurrently running suites)
    val serverSession = spark.newSession()
    Tables.registerAll(serverSession, sfDir) // temp views shared with the server
    val sock = new java.net.ServerSocket(0)
    val port = sock.getLocalPort
    sock.close()
    serverSession.sqlContext.setConf("hive.server2.thrift.port", port.toString)
    // GraftSession sets spark.sql.hive.thriftServer.singleSession=true
    // (static conf), so connections share the handed session's temp views
    val server = HiveThriftServer2.startWithContext(serverSession.sqlContext)
    try {
      Class.forName("org.apache.hive.jdbc.HiveDriver")
      val url = s"jdbc:hive2://localhost:$port/default"
      // the thrift endpoint comes up asynchronously — poll the handshake
      var conn: java.sql.Connection = null
      val deadline = System.nanoTime + 60L * 1000 * 1000 * 1000
      while (conn == null) {
        try conn = java.sql.DriverManager.getConnection(url, "anonymous", "")
        catch {
          case e: Throwable =>
            if (System.nanoTime > deadline) throw e
            Thread.sleep(250)
        }
      }
      try {
        val q = "SELECT n_regionkey, COUNT(*) AS n FROM nation " +
          "GROUP BY n_regionkey ORDER BY n_regionkey"
        val rs = conn.createStatement().executeQuery(q)
        val viaJdbc = Iterator.continually(rs).takeWhile(_.next())
          .map(r => (r.getInt("n_regionkey"), r.getLong("n"))).toList
        val inProc = serverSession.sql(q).collect()
          .map(r => (r.getInt(0), r.getLong(1))).toList
        assert(viaJdbc == inProc && viaJdbc.nonEmpty)
        // prepared-statement lifecycle over the same wire (flight_sql.rs
        // :885-903 create/execute/close prepared statements): typed
        // placeholder bound through java.sql.PreparedStatement
        val ps = conn.prepareStatement(
          "SELECT COUNT(*) AS n FROM orders WHERE o_totalprice > ?")
        ps.setDouble(1, 200000.0)
        val prs = ps.executeQuery()
        assert(prs.next())
        val viaPrepared = prs.getLong("n")
        val expected = serverSession
          .sql("SELECT COUNT(*) AS n FROM orders WHERE o_totalprice > 200000.0")
          .collect().head.getLong(0)
        assert(viaPrepared == expected && expected > 0)
        ps.close()
        // catalog metadata over the same wire (flight_sql.rs get_tables analog)
        val md = conn.getMetaData.getTables(null, null, "%", null)
        val tabs = Iterator.continually(md).takeWhile(_.next())
          .map(_.getString("TABLE_NAME")).toSet
        assert(Tables.names.forall(tabs.contains),
          s"JDBC metadata missing tables: ${Tables.names.filterNot(tabs.contains)}")
        // getSchemas (flight_sql.rs get_flight_info_schemas analog): the
        // wire's schema list must equal the in-process catalog's databases
        val srs = conn.getMetaData.getSchemas()
        val wireSchemas = Iterator.continually(srs).takeWhile(_.next())
          .map(_.getString("TABLE_SCHEM")).toSet
        val inProcDbs = serverSession.catalog.listDatabases().collect().map(_.name).toSet
        assert(inProcDbs.subsetOf(wireSchemas),
          s"JDBC getSchemas missing databases: ${inProcDbs.diff(wireSchemas)} (wire: $wireSchemas)")
        // getColumns (get_flight_info_columns analog) against a real catalog
        // table: names, order, and JDBC type mapping must match the
        // in-process schema
        serverSession.sql("DROP TABLE IF EXISTS graft_md_nation")
        serverSession.sql("CREATE TABLE graft_md_nation USING parquet " +
          s"OPTIONS (path '$sfDir/nation.parquet')")
        try {
          val crs = conn.getMetaData.getColumns(null, "default", "graft_md_nation", "%")
          val wireCols = Iterator.continually(crs).takeWhile(_.next())
            .map(r => (r.getInt("ORDINAL_POSITION"), r.getString("COLUMN_NAME"),
              r.getString("TYPE_NAME").toLowerCase)).toList.sortBy(_._1)
          val inProcCols = serverSession.table("graft_md_nation").schema.fields.toList
            .zipWithIndex.map { case (f, i) => (i + 1, f.name, f.dataType.simpleString) }
          // JDBC TYPE_NAME uses the SQL DDL spelling (INT/BIGINT/STRING) —
          // DataType.simpleString, not typeName ("integer")
          assert(wireCols == inProcCols,
            s"JDBC getColumns mismatch: wire=$wireCols inProc=$inProcCols")
        } finally serverSession.sql("DROP TABLE IF EXISTS graft_md_nation")
        // getTypeInfo (get_flight_info_sql_info's type table analog): the
        // server must advertise the engine's type system
        val trs = conn.getMetaData.getTypeInfo
        val wireTypes = Iterator.continually(trs).takeWhile(_.next())
          .map(_.getString("TYPE_NAME").toUpperCase).toSet
        val expectTypes = Set("BIGINT", "INT", "DOUBLE", "STRING", "TIMESTAMP",
          "DATE", "DECIMAL", "BOOLEAN", "BINARY", "ARRAY", "MAP", "STRUCT")
        assert(expectTypes.subsetOf(wireTypes),
          s"JDBC getTypeInfo missing types: ${expectTypes.diff(wireTypes)} (wire: $wireTypes)")
      } finally conn.close()
    } finally server.stop()
  }

  test("missing connector jar fails fast with the deployment fix, not an unknown scheme") {
    import graft.sources.ObjectStores
    val e = intercept[IllegalStateException](ObjectStores.requireConnector("s3a"))
    assert(e.getMessage.contains("S3AFileSystem") && e.getMessage.contains("hadoop-aws"))
    // and Spark itself routes the scheme (fails on the impl class, not the URL)
    val read = intercept[Throwable] {
      spark.read.parquet("s3a://no-such-bucket/x").collect()
    }
    val chain = Iterator.iterate(read)(_.getCause).takeWhile(_ != null)
      .map(_.toString).mkString(" | ")
    assert(chain.contains("S3AFileSystem") || chain.contains("s3a"),
      s"expected connector-class failure, got: $chain")
  }
}
