package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** Per-job profiler for local optimization work (guide §1: measure first).
  *
  * Runs one or more registered queries through the noop sink (after one
  * warmup) and prints every Spark job the run launched — wall-clock, task
  * count, and stage-level shuffle bytes — so the cost of an iterative
  * operator can be attributed to its rounds instead of guessed at.
  *
  * Usage: runMain graft.Profile <sfDir> <query>[,<query>...]
  * Not part of the driver contract; Bench remains the timing authority.
  */
object Profile {

  private final case class JobRow(id: Int, sec: Double, tasks: Int,
      shufRead: Long, shufWrite: Long, desc: String)

  def main(args: Array[String]): Unit = {
    val Array(sfDir, names) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.getOrCreate(s"local[$cpus]", cpus.toInt)
    graft.queries.SourcesDdl.cleanStaleScratch()

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]()
    val rows = new ConcurrentLinkedQueue[JobRow]()
    val stageShuf = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long)]()
    val jobStages = new java.util.concurrent.ConcurrentHashMap[Int, Seq[Int]]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        starts.put(js.jobId, (System.nanoTime(), desc, js.stageInfos.map(_.numTasks).sum))
        jobStages.put(js.jobId, js.stageIds)
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null)
          stageShuf.put(sc.stageInfo.stageId,
            (m.shuffleReadMetrics.totalBytesRead, m.shuffleWriteMetrics.bytesWritten))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach { case (t0, desc, tasks) =>
          val (r, w) = jobStages.getOrDefault(je.jobId, Nil)
            .flatMap(s => Option(stageShuf.get(s)))
            .foldLeft((0L, 0L)) { case ((ar, aw), (sr, sw)) => (ar + sr, aw + sw) }
          rows.add(JobRow(je.jobId, (System.nanoTime() - t0) / 1e9, tasks, r, w, desc))
        }
      }
    })

    names.split(',').map(_.trim).filter(_.nonEmpty).foreach { name =>
      val fn = SparkEntry.queries(name)
      // warmup: plan + codegen + parquet footer caches, identical to Bench
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      Thread.sleep(300)
      rows.clear()
      val t0 = System.nanoTime()
      spark.sparkContext.setJobDescription(s"profile:$name")
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // listener settle
      val js = rows.asScala.toSeq.sortBy(_.id)
      println(f"==== $name%s: ${total}%.3f s, ${js.size}%d jobs ====")
      js.foreach { j =>
        println(f"  job ${j.id}%4d ${j.sec}%7.3f s ${j.tasks}%5d tasks " +
          f"shufR ${j.shufRead / 1e6}%8.2f MB shufW ${j.shufWrite / 1e6}%8.2f MB  ${j.desc.take(60)}%s")
      }
      println(f"  jobs-sum ${js.map(_.sec).sum}%.3f s (gaps = driver/planning time)")
    }
    spark.stop()
  }
}
