package graft.sources

import java.nio.ByteBuffer

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro scan/sink (reference: `read_avro`, client/src/context.rs:224-231;
  * `AvroScanExecNode`, datafusion.proto:1169-1171).
  *
  * The packaged Spark mapping is `spark.read.format("avro")` via the
  * spark-avro module, which is not on this classpath (probed: absent from
  * /opt/spark/jars and the offline coursier cache). Avro core + avro-mapred
  * 1.12.1 ARE shipped with Spark, so this bridges through the Hadoop
  * `AvroKeyInputFormat`/`AvroKeyOutputFormat` instead — the same container
  * format on disk, readable by any Avro tool. RDD-level code is justified
  * here: this is genuine per-partition imperative IO (records are created
  * and consumed inside one task, never shuffled), and each Avro block maps
  * to an input split so the scan parallelizes like any file scan.
  *
  * Type coverage is the flat scalar surface the reference's Avro scan
  * exposes (context.rs:224: schemaless read of primitive columns); nested /
  * temporal columns should be projected to scalars before writing.
  */
object AvroIo {

  /** Spark StructType → Avro record schema (nullable fields as
    * union(null, T), matching spark-avro's public mapping). */
  def toAvroSchema(schema: StructType, name: String = "graft_record"): Schema = {
    val fields = SchemaBuilder.record(name).namespace("graft").fields()
    schema.foldLeft(fields) { (fs, f) =>
      val base = f.dataType match {
        case LongType => Schema.create(Schema.Type.LONG)
        case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case FloatType => Schema.create(Schema.Type.FLOAT)
        case StringType => Schema.create(Schema.Type.STRING)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case BinaryType => Schema.create(Schema.Type.BYTES)
        case other => throw new IllegalArgumentException(
          s"AvroIo: unsupported type $other for field ${f.name} — project to a scalar first")
      }
      if (f.nullable)
        fs.name(f.name)
          .`type`(Schema.createUnion(Schema.create(Schema.Type.NULL), base))
          .withDefault(null)
      else fs.name(f.name).`type`(base).noDefault()
    }
    fields.endRecord()
  }

  /** Write a DataFrame as an Avro container-file directory (one file per
    * partition, standard Hadoop commit protocol, overwrite semantics like
    * `mode("overwrite")`). */
  def write(df: DataFrame, path: String): Unit = {
    val sparkSchema = df.schema
    val avroSchema = toAvroSchema(sparkSchema)
    val schemaJson = avroSchema.toString
    val hadoopConf = df.sparkSession.sparkContext.hadoopConfiguration
    val target = new org.apache.hadoop.fs.Path(path)
    target.getFileSystem(hadoopConf).delete(target, true)
    val job = Job.getInstance(hadoopConf)
    AvroJob.setOutputKeySchema(job, avroSchema)
    df.rdd.mapPartitions { rows =>
      // parse once per task; GenericRecord never crosses a task boundary
      val schema = new Schema.Parser().parse(schemaJson)
      rows.map { row =>
        val rec = new GenericData.Record(schema)
        var i = 0
        while (i < sparkSchema.length) {
          rec.put(i, toAvroValue(row.get(i)))
          i += 1
        }
        (new AvroKey[GenericRecord](rec), NullWritable.get())
      }
    }.saveAsNewAPIHadoopFile(
      path,
      classOf[AvroKey[GenericRecord]],
      classOf[NullWritable],
      classOf[AvroKeyOutputFormat[GenericRecord]],
      job.getConfiguration)
  }

  /** Read an Avro container-file directory into a DataFrame with the given
    * schema (the reader uses each file's embedded writer schema; `schema`
    * states the Spark-side column types, like `spark.read.schema(...)`). */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val rdd = spark.sparkContext.newAPIHadoopFile(
      path,
      classOf[AvroKeyInputFormat[GenericRecord]],
      classOf[AvroKey[GenericRecord]],
      classOf[NullWritable])
    val fieldNames = schema.fieldNames
    val rows = rdd.mapPartitions { it =>
      it.map { case (k, _) =>
        val rec = k.datum()
        Row.fromSeq(fieldNames.toIndexedSeq.map(n => fromAvroValue(rec.get(n))))
      }
    }
    spark.createDataFrame(rows, schema)
  }

  private def toAvroValue(v: Any): Any = v match {
    case null => null
    case b: Array[Byte] => ByteBuffer.wrap(b)
    case x => x // Long/Int/Double/Float/Boolean/String pass through
  }

  private def fromAvroValue(v: Any): Any = v match {
    case null => null
    case s: CharSequence => s.toString // avro Utf8 → java String
    case b: ByteBuffer =>
      val out = new Array[Byte](b.remaining()); b.duplicate().get(out); out
    case x => x
  }
}
