package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the private[sql] Column↔Expression converters (Spark 4 moved
  * the Expression-based Column constructor behind the classic module).
  * Lives in an org.apache.spark.sql subpackage solely to satisfy the
  * private[sql] scope; no Spark internals are modified.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a (resolved) logical plan as a DataFrame — how a library hands a
    * custom LogicalPlan node to the session for optimization + planning. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
  : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Register a SQL-callable function backed by an expression builder —
    * the codegen-preserving path (a lambda registered through spark.udf is
    * an interpreted black box; an expression builder stays inside
    * whole-stage codegen). Mirrors how the reference surfaces its scalar
    * registry to SQL (ballista executor function registries,
    * executor/src/execution_loop.rs:182-205). */
  def registerExpression(spark: org.apache.spark.sql.SparkSession, name: String,
                         builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")
}
