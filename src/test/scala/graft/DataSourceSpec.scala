package graft

import graft.sources.GraftSeqSource
import org.apache.spark.sql.functions._

/** The DataSource V2 custom table provider: both load paths, pushdown
  * behavior (range narrowing + column pruning happen in the source, not
  * post-scan), partition parallelism, and residual-filter correctness. */
class DataSourceSpec extends SparkSpec {

  private def seq(start: Long, end: Long, slices: Int = 4) =
    spark.read.format("graft-seq")
      .option("start", start.toString).option("end", end.toString)
      .option("slices", slices.toString).load()

  test("reads the full range, correct derived columns, by short name") {
    val rows = seq(0, 40).orderBy("id").collect()
    assert(rows.length === 40)
    assert(rows.map(_.getLong(0)).toSeq === (0L until 40L))
    assert(rows(10).getDouble(1) === 2.5)
    assert(rows(13).getString(2) === "g3")
  }

  test("loads by provider class name and through GraftContext.readTable") {
    val byClass = spark.read.format(classOf[GraftSeqSource].getName)
      .option("start", "5").option("end", "9").load()
    assert(byClass.count() === 4)
    val ctx = new GraftContext(spark)
    val viaCtx = ctx.readTable("graft-seq", Map("start" -> "5", "end" -> "9"))
    assert(viaCtx.count() === 4)
  }

  test("id comparisons narrow the generated range at planning time") {
    val df = seq(0, 1000000, slices = 8).filter(col("id") >= 999990 && col("id") < 999995)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("lo=999990") && plan.contains("hi=999995"), plan.take(1500))
    assert(df.count() === 5) // and the pruned scan still returns the right rows
  }

  test("projection prunes unread columns out of the scan") {
    val df = seq(0, 100).select(col("id"), col("tag"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("cols=[id,tag]"), plan.take(1500))
  }

  test("unsupported predicates stay as residual filters, results exact") {
    // tag predicate can't be pushed; id range can — both must apply
    val df = seq(0, 100).filter(col("id") < 50 && col("tag") === "g3")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("hi=50"), plan.take(1500))
    assert(df.collect().map(_.getLong(0)).toSeq === Seq(3L, 13L, 23L, 33L, 43L))
  }

  test("slices become input partitions; empty and equality ranges degrade sanely") {
    assert(seq(0, 1000, slices = 8).rdd.getNumPartitions === 8)
    assert(seq(10, 10).count() === 0)
    val one = seq(0, 1000).filter(col("id") === 7)
    assert(one.collect().map(_.getLong(0)).toSeq === Seq(7L))
  }

  test("count(*) works with a fully pruned (zero-column) read schema") {
    assert(seq(0, 12345).count() === 12345)
  }

  test("avro bridge round-trips scalars, nulls and binary exactly") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    val schema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("s", StringType, nullable = true),
      StructField("x", DoubleType, nullable = true),
      StructField("flag", BooleanType, nullable = false),
      StructField("blob", BinaryType, nullable = true)))
    val rows = Seq(
      Row(1L, "alpha", 1.5, true, Array[Byte](1, 2, 3)),
      Row(2L, null, null, false, null),
      Row(3L, "gamma", -0.25, true, Array[Byte]()))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val p = s"${sys.props("java.io.tmpdir")}/graft_avro_spec"
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(p), true)
    graft.sources.AvroIo.write(df, p)
    val back = graft.sources.AvroIo.read(spark, p, schema).orderBy("k").collect()
    assert(back.length === 3)
    assert(back(0).getString(1) === "alpha" && back(0).getAs[Array[Byte]]("blob").toSeq === Seq[Byte](1, 2, 3))
    assert(back(1).isNullAt(1) && back(1).isNullAt(2) && back(1).isNullAt(4))
    assert(back(2).getDouble(2) === -0.25 && back(2).getAs[Array[Byte]]("blob").isEmpty)
  }

  test("avro bridge refuses non-scalar columns with a clear error") {
    import org.apache.spark.sql.types._
    val nested = StructType(Seq(StructField("a", ArrayType(LongType), nullable = true)))
    val e = intercept[IllegalArgumentException] {
      graft.sources.AvroIo.toAvroSchema(nested)
    }
    assert(e.getMessage.contains("project to a scalar"))
  }
}
