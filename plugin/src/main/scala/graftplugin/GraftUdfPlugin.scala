package graftplugin

import org.apache.spark.sql.SparkSession

/** Out-of-artifact UDF plugin (reference: ballista/core/src/plugin/udf.rs:
  * 29-53 — `UDFPlugin` implementations loaded from dynamic libraries in a
  * plugin dir register named UDFs into the session).
  *
  * This is built as its own jar with NO dependency on the graft artifact;
  * the host ships the jar to executors (`--jars` / `sparkContext.addJar`),
  * loads this class reflectively, and invokes [[register]] — after which
  * the function resolves by name in SQL like any built-in.
  */
object GraftUdfPlugin {
  def register(spark: SparkSession): Unit =
    spark.udf.register("graft_plugin_shout",
      (s: String) => if (s == null) null else s.toUpperCase + "!")
}
