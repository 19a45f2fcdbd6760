package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Vector math over Array[Float] embedding columns using the higher-order
  * built-ins (`zip_with`, `aggregate`) — codegen-friendly, no UDF.
  */
object VectorFunctions {

  /** Dot product of two float-array columns (double result). Backed by the
    * native codegen'd [[graft.plans.FloatVecDot]]; semantics identical to the
    * higher-order `aggregate(zip_with(...))` form (left-to-right double
    * accumulation) but ~an order of magnitude faster per pair. */
  def dot(a: Column, b: Column): Column = graft.plans.VectorExpressions.fvDot(a, b)

  /** Interpreted reference implementation (kept for cross-checking the
    * native expression in tests). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** SQL-callable forms (catalyst expression builders — `graft_vec_dot`
    * is the native codegen'd [[graft.plans.VecDot]] directly). */
  def register(spark: SparkSession): Unit = {
    import org.apache.spark.sql.graft.ColumnBridge.registerExpression
    registerExpression(spark, "graft_vec_dot", es => graft.plans.VecDot(es(0), es(1)))
    registerExpression(spark, "graft_cosine", es => graft.plans.SqlExprs.cosine(es(0), es(1)))
  }
}
