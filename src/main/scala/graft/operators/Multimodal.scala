package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque binary columns with typed
  * metadata, processed in partition-sized batches.
  *
  * The GENERAL decode step is a STUB (no libjpeg/ffmpeg in this container):
  * [[FakeDecoder.decode]] derives deterministic dimensions from the leading
  * bytes. The Spark-side plumbing is real: binary column schema, typed
  * Dataset encoders, mapPartitions batch shape (the Scala analog of
  * mapInPandas — one decoder instance per partition, streaming iterator, no
  * per-row setup cost), and partition-count control for decoder parallelism.
  * For the formats that need no native library the decode itself is real
  * too — see [[MediaCodecs]]: hand-rolled BMP and RIFF/PCM-WAV parsers,
  * JDK `javax.imageio` PNG/JPEG decode, and a real nearest-neighbor resize
  * replacing this file's byte-truncation [[resize]] stub.
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
        // a MISSING payload (null column) is metadata, not a crash: the
        // decode tier must survive it like any other corrupt input
        if (r.media == null) MediaMeta(r.doc_id, 0L, 0L, 0L, "missing")
        else {
          val (w, h, fmt) = FakeDecoder.decode(r.media)
          MediaMeta(r.doc_id, w, h, r.media.length.toLong, fmt)
        }
      }
    }
  }

  /** End-to-end: docs → media → decoded metadata DataFrame. */
  def decodeDocuments(spark: SparkSession, docs: DataFrame): DataFrame =
    decodeMeta(asMedia(docs, "doc_id", "text")).toDF()

  /** One sampled frame of a media payload. */
  case class MediaFrame(doc_id: Long, frame_idx: Long, frame_len: Long, frame: Array[Byte])

  /** Frame sampling: chunk each payload into `frameBytes` frames and keep
    * every `everyN`-th (the video-keyframe access pattern). Pure row-local
    * flatMap — no shuffle, scales linearly; a real decoder replaces the
    * byte-slicing with container parsing, same shape. */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int = 64,
                   everyN: Int = 2): Dataset[MediaFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { r =>
      if (r.media == null) Iterator.empty // a missing payload has no frames
      else {
      val len = r.media.length
      val nFrames = math.max(1L, (len.toLong + frameBytes - 1) / frameBytes)
      (0L until nFrames).filter(_ % everyN == 0).map { i =>
        val from = (i * frameBytes).toInt
        val until = math.min(from + frameBytes, len)
        MediaFrame(r.doc_id, i, (until - from).toLong,
          java.util.Arrays.copyOfRange(r.media, from, until))
      }
      }
    }
  }

  /** Per-frame audio energy. */
  case class FrameEnergy(doc_id: Long, frame_idx: Long, n_samples: Long, energy: Long)

  /** Audio feature extraction: treat each payload as unsigned 8-bit PCM,
    * window it into `frameBytes`-sample frames, and emit per-frame energy
    * Σ s² — the VAD/silence-trim primitive of audio curation pipelines.
    * Exact integer arithmetic (so the gate hash-replays); row-local flatMap
    * like [[sampleFrames]]; a real deployment swaps the byte view for an
    * ffmpeg/PCM decode in the same per-partition shape. */
  def frameEnergy(media: Dataset[MediaRow], frameBytes: Int = 64): Dataset[FrameEnergy] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { r =>
      if (r.media == null) Iterator.empty // a missing payload has no frames
      else {
      val len = r.media.length
      val nFrames = math.max(1L, (len.toLong + frameBytes - 1) / frameBytes)
      (0L until nFrames).map { i =>
        val from = (i * frameBytes).toInt
        val until = math.min(from + frameBytes, len)
        var e = 0L
        var j = from
        while (j < until) { val s = r.media(j).toLong & 0xffL; e += s * s; j += 1 }
        FrameEnergy(r.doc_id, i, (until - from).toLong, e)
      }
      }
    }
  }

  /** Resize stub: deterministic fake (truncate/pad payload to w*h bytes,
    * metadata updated) standing in for an image-library resample. The
    * plumbing — binary in/binary out, row-local, schema-typed — is real. */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { r =>
      if (r.media == null) r // a missing payload passes through untouched
      else {
        val target = w * h
        val out = java.util.Arrays.copyOf(r.media, target)
        MediaRow(r.doc_id, out, r.media_type + s";resized=${w}x$h")
      }
    }
  }
}
