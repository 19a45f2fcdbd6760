package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Date/time functions the reference has that Spark lacks as built-ins.
  *
  * Reference surface: DateBin (datafusion.proto:517), ToTimestampMillis/
  * Micros/Seconds (datafusion.proto:504-507), CurrentTime (datafusion.proto:520).
  * All are implemented as compositions of codegen'd built-in expressions —
  * no UDF, no codegen break, fully distributed.
  */
object DateTimeFunctions {

  /** DATE_BIN(stride, source, origin): floor `source` into `stride`-wide bins
    * anchored at `origin`. Pure column arithmetic on epoch microseconds, so it
    * stays inside whole-stage codegen.
    *
    * EXACT integer form: `src − pmod(src − origin, stride)` is
    * `origin + floorDiv(delta, stride) · stride` for positive strides, in
    * Long arithmetic end to end. The earlier `floor(delta.toDouble /
    * stride)` form loses to double rounding once the quotient passes ~2^33:
    * a timestamp one microsecond before a bin boundary ~280 years from the
    * origin divides to a quotient whose nearest double IS the boundary
    * integer, flooring into the wrong bin (caught by DateBinLawsSpec's
    * boundary corpus; DataFusion's own date_bin does this arithmetic in
    * integers for the same reason). pmod keeps pre-origin timestamps
    * flooring downward, matching floorDiv semantics.
    */
  def dateBin(strideMicros: Column, source: Column, origin: Column): Column = {
    val srcUs = unix_micros(source.cast("timestamp"))
    val orgUs = unix_micros(origin.cast("timestamp"))
    timestamp_micros(srcUs - pmod(srcUs - orgUs, strideMicros.cast("long")))
  }

  def dateBin(strideMicros: Long, source: Column, origin: Column): Column =
    dateBin(lit(strideMicros), source, origin)

  /** to_timestamp_seconds / _millis / _micros (reference: datafusion.proto:504-507) */
  def toTimestampSeconds(c: Column): Column = timestamp_seconds(c.cast("long"))
  def toTimestampMillis(c: Column): Column = timestamp_millis(c.cast("long"))
  def toTimestampMicros(c: Column): Column = timestamp_micros(c.cast("long"))

  /** SQL-callable forms, registered as catalyst expression builders
    * (graft.plans.SqlExprs) so they stay codegen'd — the reference
    * surfaces every scalar function through SQL. */
  def register(spark: SparkSession): Unit = {
    import graft.plans.SqlExprs
    import org.apache.spark.sql.graft.ColumnBridge.registerExpression
    registerExpression(spark, "graft_date_bin", es => SqlExprs.dateBin(es(0), es(1), es(2)))
    registerExpression(spark, "graft_to_timestamp_seconds", es => SqlExprs.toTimestampSeconds(es(0)))
    registerExpression(spark, "graft_to_timestamp_millis", es => SqlExprs.toTimestampMillis(es(0)))
    registerExpression(spark, "graft_to_timestamp_micros", es => SqlExprs.toTimestampMicros(es(0)))
  }
}
