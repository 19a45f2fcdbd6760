package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Session-extension entry point: `spark.sql.extensions=graft.GraftExtensions`
  * (set by [[GraftSession]]; on a cluster the same line goes in
  * spark-defaults.conf / spark-submit --conf). Injects the planner strategy
  * for the custom operators — the library's plug-in surface, mirroring the
  * reference's physical-plan extension registry
  * (reference: ballista/core/src/serde/mod.rs:69-86, the
  * PhysicalExtensionCodec plug-in point).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.GraftStrategies)
    // row_number()<=k window-filters rewrite to the bounded-heap operator
    ext.injectOptimizerRule(_ => graft.plans.TopKRewrite)
  }
}
