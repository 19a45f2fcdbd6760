package graft

import graft.queries.SourcesDdl

/** Law for the SHOW-TABLES-based information_schema shim (round 12; the
  * round-11 rewrite replaced `catalog.listTables()` — whose bean
  * deserializer dies under `spark.sql.codegen.factoryMode=NO_CODEGEN` —
  * with plain SHOW TABLES rows).
  *
  * The shim's contract: `information_schema.tables` / `.columns` reflect
  * the CURRENT database plus temp views, with the same names, ordinals,
  * types, nullability and temp-classification the session catalog reports.
  * This law asserts that equality across all three table origins (temp
  * view, permanent table in the default database, table in a named
  * database), under BOTH codegen modes, and that the shim's output is
  * byte-identical across modes — the exact axis the round-11 bug lived on.
  */
class InfoSchemaLawsSpec extends SparkSpec {

  private val noCodegen: Seq[(String, String)] = Seq(
    "spark.sql.codegen.wholeStage" -> "false",
    "spark.sql.codegen.factoryMode" -> "NO_CODEGEN")

  private def withConfs[A](confs: Seq[(String, String)])(body: => A): A = {
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def shimSnapshot(): (Set[(String, String, String)], Set[(String, String, Long, String, String)]) = {
    val tabs = spark.sql(
      "SELECT table_schema, table_name, table_type FROM information_schema.tables")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val cols = spark.sql(
      """SELECT table_name, column_name, ordinal_position, data_type, is_nullable
        |FROM information_schema.columns""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getString(3), r.getString(4))).toSet
    (tabs, cols)
  }

  test("shim equals catalog metadata for temp/permanent/database tables under both codegen modes") {
    val dir = sfDir
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_lawdb")
    spark.sql("DROP TABLE IF EXISTS graft_lawdb.law_nation")
    spark.sql(s"CREATE TABLE graft_lawdb.law_nation USING parquet OPTIONS (path '$dir/nation.parquet')")
    spark.sql("DROP TABLE IF EXISTS default.law_region")
    spark.sql(s"CREATE TABLE default.law_region USING parquet OPTIONS (path '$dir/region.parquet')")
    spark.read.parquet(s"$dir/supplier.parquet").createOrReplaceTempView("law_supp_tmp")
    val origDb = spark.catalog.currentDatabase
    try {
      for (db <- Seq("default", "graft_lawdb")) {
        spark.catalog.setCurrentDatabase(db)
        // expected metadata from the session catalog API, computed ONCE in
        // the default codegen mode (listTables' bean decoding is exactly
        // what NO_CODEGEN breaks — the shim must match it from SHOW TABLES)
        val catTables = spark.catalog.listTables(db).collect()
        val expTables = catTables.map { t =>
          (if (t.isTemporary) "session" else t.namespace.mkString("."),
            t.name, if (t.isTemporary) "VIEW" else "BASE TABLE")
        }.toSet
        val expCols = catTables.flatMap { t =>
          spark.table(t.name).schema.fields.zipWithIndex.map { case (f, i) =>
            (t.name, f.name, (i + 1).toLong, f.dataType.sql.toLowerCase,
              if (f.nullable) "YES" else "NO")
          }
        }.toSet
        val perMode = Seq("default" -> Seq.empty[(String, String)], "interpreted" -> noCodegen)
          .map { case (label, confs) =>
            withConfs(confs) {
              SourcesDdl.installInformationSchema(spark)
              label -> shimSnapshot()
            }
          }
        for ((label, (tabs, cols)) <- perMode) {
          assert(tabs == expTables,
            s"db=$db mode=$label tables: shim-only=${tabs -- expTables}, catalog-only=${expTables -- tabs}")
          assert(cols == expCols,
            s"db=$db mode=$label columns: shim-only=${(cols -- expCols).take(5)}, " +
              s"catalog-only=${(expCols -- cols).take(5)}")
        }
        assert(perMode.map(_._2).distinct.sizeIs == 1,
          s"db=$db: shim output differs across codegen modes")
        // teeth: all three origins must be visible in at least one pass
        if (db == "default") {
          assert(expTables.exists(_._3 == "VIEW"), "no temp view in the corpus")
          assert(expTables.contains(("default", "law_region", "BASE TABLE")))
        } else {
          assert(expTables.contains(("graft_lawdb", "law_nation", "BASE TABLE")))
          assert(expTables.exists(_._1 == "session"), "temp views must survive a database switch")
        }
      }
    } finally {
      spark.catalog.setCurrentDatabase(origDb)
      spark.catalog.dropTempView("law_supp_tmp")
      spark.sql("DROP TABLE IF EXISTS default.law_region")
      spark.sql("DROP TABLE IF EXISTS graft_lawdb.law_nation")
    }
  }
}
