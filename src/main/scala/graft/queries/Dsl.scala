package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared helpers for oracle-exact query formulation.
  *
  * The synthetic data's doubles are exactly-2-decimal values, so casting to
  * DECIMAL is lossless, decimal aggregation is exact in both Spark and the
  * DuckDB oracle, and a final cast to DOUBLE is bit-identical in both engines.
  * This avoids float-summation-order nondeterminism entirely — which also
  * means results are stable under any partitioning, i.e. at any scale.
  */
object Dsl {
  /** Lossless decimal view of a 2-decimal double column. */
  def dec(c: Column, p: Int = 12, s: Int = 2): Column = c.cast(DecimalType(p, s))

  /** Final-output double cast (bit-exact across engines for decimal input). */
  def d(c: Column): Column = c.cast(DoubleType)

  /** (1 - discount) as an exact small decimal factor. */
  def oneMinus(c: Column): Column = (lit(1) - dec(c, 4, 2)).cast(DecimalType(5, 2))

  /** (1 + tax) as an exact small decimal factor. */
  def onePlus(c: Column): Column = (lit(1) + dec(c, 4, 2)).cast(DecimalType(5, 2))

  /** Timestamp literal parsed in the session (UTC) zone — matches DuckDB's
    * naive TIMESTAMP literal on the same parquet data. */
  def ts(s: String): Column = lit(s).cast(TimestampType)

  /** Exact decimal revenue term: extendedprice * (1 - discount). */
  def revenueTerm(price: Column, discount: Column): Column =
    dec(price) * oneMinus(discount)

  /** Cross-engine-safe DECIMAL→DOUBLE for int128-backed decimals (plain
    * casts double-round differently per engine — see the verify recipe):
    * split into floor-BIGINT + scaled-frac-BIGINT (both convert correctly
    * rounded everywhere) and reassemble with the same two IEEE ops. The
    * value must be non-negative and its floor must fit in int64. */
  def splitDouble(c: Column, scale: Int): Column = {
    val pow = math.pow(10, scale)
    floor(c).cast(LongType).cast(DoubleType) +
      ((c % 1) * pow.toLong).cast(LongType).cast(DoubleType) / lit(pow)
  }

  /** SQL fragments for the DuckDB oracle mirroring the helpers above. */
  object sql {
    /** DuckDB mirror of [[Dsl.splitDouble]]. `decScale` is a decimal type
      * wide enough for the fractional part (int128-safe, e.g. DECIMAL(12,s)). */
    def splitDouble(c: String, scale: Int): String = {
      val pow = math.pow(10, scale).toLong
      s"(CAST(CAST(floor(($c)) AS BIGINT) AS DOUBLE) + " +
        s"CAST(CAST(CAST(($c) % 1 AS DECIMAL(12,$scale)) * $pow AS BIGINT) AS DOUBLE) / $pow.0)"
    }
    def dec(c: String, p: Int = 12, s: Int = 2): String = s"CAST($c AS DECIMAL($p,$s))"
    def oneMinus(c: String): String = s"CAST(1 - CAST($c AS DECIMAL(4,2)) AS DECIMAL(5,2))"
    def onePlus(c: String): String = s"CAST(1 + CAST($c AS DECIMAL(4,2)) AS DECIMAL(5,2))"
    def revenueTerm(price: String, discount: String): String =
      s"${dec(price)} * ${oneMinus(discount)}"
    /** SUM of a decimal expression, cast to double for bit-exact compare. */
    def dsum(expr: String): String = s"CAST(SUM($expr) AS DOUBLE)"
  }
}
