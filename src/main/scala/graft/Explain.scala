package graft

/** Plan inspector for local iteration: runs one registered query and prints
  * its AQE-final physical plan (collect() first, so reuse/stage info is the
  * real executed plan, not a re-plan — see .claude/skills/verify/SKILL.md).
  *
  * Usage: runMain graft.Explain <queryName> <sfDir>
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir) = args.take(2)
    val spark = GraftSession.getOrCreate(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]", 8)
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect()
    println("==== executedPlan ====")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
