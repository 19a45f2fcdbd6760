package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines.
  * All are compositions of codegen'd built-ins (no Scala UDFs in hot paths),
  * so they run distributed and whole-stage-compiled at 100 TB.
  */
object TextFunctions {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    size(split(trim(text), "\\s+"))

  def register(spark: SparkSession): Unit = ()
}
