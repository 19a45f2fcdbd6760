package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central registry of every implemented operator/query.
  *
  * Each entry pairs a Spark DataFrame program with (where SQL-expressible) an
  * ANSI-SQL oracle the driver runs in DuckDB over the same parquet tables.
  * Column names and row ordering are deterministic and identical on both
  * sides (see Dsl for the decimal-exact numeric strategy).
  */
object Registry {

  type QueryFn = (SparkSession, String) => DataFrame

  /** All suites, concatenated. Later suites may shadow earlier names (none do). */
  def entries: Seq[(String, (QueryFn, Option[String]))] =
    Tpch.all ++ Coverage.all ++ Pipeline.all ++ Curation.all ++ Enrich.all ++
      ModelPrep.all ++ Analytics.all ++ Quality.all ++ Graphs.all ++
      Evaluation.all ++ SourcesDdl.all

  def queries: Map[String, QueryFn] =
    entries.map { case (n, (fn, _)) => n -> fn }.toMap

  def oracleSql: Map[String, String] =
    entries.collect { case (n, (_, Some(sqlText))) => n -> sqlText }.toMap
}
