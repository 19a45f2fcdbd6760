package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Dsl._

/** TPC-H-derived query suite (reference: benchmarks/queries/q1..q22.sql),
  * adapted to the synthetic schema in TESTDATA.md (no partsupp table; slimmed
  * columns), expressed Spark-first with the DataFrame API so Catalyst handles
  * pushdown, join selection (broadcast for region/nation/supplier-sized dims)
  * and two-phase aggregation.
  *
  * Every query has a matching DuckDB oracle in [[Tpch.oracle]] with identical
  * column names and deterministic total ordering.
  */
object Tpch {

  /** q1 — pricing summary report (reference: benchmarks/queries/q1.sql).
    * scan → filter → two-phase hash agg → sort. Filter pushed to parquet;
    * aggregation is map-side partial then final (8 groups — trivially small
    * shuffle at any scale factor).
    */
  def q1(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val l = Tables.lineitem(spark, dir)
    val disc = oneMinus($"l_discount")
    val tax = onePlus($"l_tax")
    l.filter($"l_shipdate" <= ts("1998-09-02"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        d(sum(dec($"l_quantity"))).as("sum_qty"),
        d(sum(dec($"l_extendedprice"))).as("sum_base_price"),
        d(sum(dec($"l_extendedprice") * disc)).as("sum_disc_price"),
        d(sum(dec($"l_extendedprice") * disc * tax)).as("sum_charge"),
        (d(sum(dec($"l_quantity"))) / count(lit(1))).as("avg_qty"),
        (d(sum(dec($"l_extendedprice"))) / count(lit(1))).as("avg_price"),
        (d(sum(dec($"l_discount", 4, 2))) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q1Oracle: String = {
    import sql._
    s"""SELECT l_returnflag, l_linestatus,
       |  ${dsum(dec("l_quantity"))} AS sum_qty,
       |  ${dsum(dec("l_extendedprice"))} AS sum_base_price,
       |  ${dsum(revenueTerm("l_extendedprice", "l_discount"))} AS sum_disc_price,
       |  ${dsum(s"${revenueTerm("l_extendedprice", "l_discount")} * ${onePlus("l_tax")}")} AS sum_charge,
       |  ${dsum(dec("l_quantity"))} / COUNT(*) AS avg_qty,
       |  ${dsum(dec("l_extendedprice"))} / COUNT(*) AS avg_price,
       |  ${dsum(dec("l_discount", 4, 2))} / COUNT(*) AS avg_disc,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin
  }

  /** name → (query fn, oracle SQL). */
  def all: Seq[(String, ((SparkSession, String) => DataFrame, Option[String]))] = Seq(
    "q1" -> ((q1 _, Some(q1Oracle)))
  )
}
