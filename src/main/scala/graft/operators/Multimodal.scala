package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque binary columns with typed
  * metadata, processed in partition-sized batches.
  *
  * The decode step is a STUB (no image/audio libraries in this container):
  * [[FakeDecoder.decode]] derives deterministic dimensions from the leading
  * bytes. The Spark-side plumbing is real: binary column schema, typed
  * Dataset encoders, mapPartitions batch shape (the Scala analog of
  * mapInPandas — one decoder instance per partition, streaming iterator, no
  * per-row setup cost), and partition-count control for decoder parallelism.
  */
object Multimodal {

  /** Typed media row: id + opaque payload + declared type. */
  case class MediaRow(doc_id: Long, media: Array[Byte], media_type: String)

  /** Decoded metadata. */
  case class MediaMeta(doc_id: Long, width: Long, height: Long, n_bytes: Long, format: String)

  /** STUB decoder — deterministic fake standing in for e.g. libjpeg/ffmpeg.
    * A real deployment swaps `decode` for the native library call; the
    * surrounding plumbing (batching, schema, partitioning) is unchanged. */
  object FakeDecoder {
    def decode(bytes: Array[Byte]): (Long, Long, String) = {
      val b0 = if (bytes.length > 0) bytes(0) & 0x3f else 0
      val b1 = if (bytes.length > 1) bytes(1) & 0x3f else 0
      (64L + b0, 64L + b1, "fake")
    }
  }

  /** Wrap a text table as fake media (payload = utf-8 bytes). In production
    * this is `spark.read.format("binaryFile")` or a parquet binary column. */
  def asMedia(docs: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).cast("binary").as("media"),
      lit("image/fake").as("media_type")).as[MediaRow]
  }

  /** Batch-decode: one decoder per partition, iterator-streamed (constant
    * memory). Repartition upstream to match decoder parallelism. */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here (native lib handle, etc.)
      rows.map { r =>
        val (w, h, fmt) = FakeDecoder.decode(r.media)
        MediaMeta(r.doc_id, w, h, r.media.length.toLong, fmt)
      }
    }
  }

  /** End-to-end: docs → media → decoded metadata DataFrame. */
  def decodeDocuments(spark: SparkSession, docs: DataFrame): DataFrame =
    decodeMeta(asMedia(docs, "doc_id", "text")).toDF()
}
