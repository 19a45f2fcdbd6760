package graft.operators

import graft.operators.Multimodal.MediaRow
import org.apache.spark.sql.Dataset

/** REAL media decoders for the multimodal tier — no external libraries.
  *
  * [[Multimodal]]'s general decode step is stubbed because the container
  * has no libjpeg/ffmpeg; these two formats need neither: BMP (BI_RGB) and
  * WAV (RIFF PCM) are flat headers over raw samples, parseable in ~40 lines
  * of JVM each, and PNG/JPEG decode ships inside the JDK (`javax.imageio`).
  * So the decode tier is real end-to-end for bitmap images and PCM audio —
  * header parse, pixel/sample extraction, per-channel statistics — with the
  * same per-partition mapPartitions shape the stub documents, and the stub
  * remains only for codecs that genuinely need native libraries.
  *
  * Decoder outputs are EXACT integers (pixel-channel sums, sample count,
  * sum of squared amplitudes) so downstream aggregates hash-replay on any
  * engine; means/RMS are one final division away and stated as such.
  * Corrupt or foreign payloads produce an `err` row instead of throwing —
  * a curation pipeline meets truncated files as a matter of course, and a
  * decoder that kills the task on the first bad file does not survive a
  * 100-TB crawl.
  */
object MediaCodecs {

  /** Decoded image: exact per-channel sums over all pixels (mean = sum/n_px
    * when ok). `err` is null on success. */
  case class ImageMeta(doc_id: Long, width: Long, height: Long, bpp: Long,
      n_px: Long, sum_r: Long, sum_g: Long, sum_b: Long, format: String,
      err: String)

  /** Decoded audio: exact per-channel frame count (`n_samples`) and Σ s²
    * over ALL channel samples — so for multi-channel audio
    * RMS = sqrt(sum_sq / (n_samples * channels)) when ok, not
    * sqrt(sum_sq / n_samples), which would be inflated by sqrt(channels). */
  case class AudioMeta(doc_id: Long, sample_rate: Long, channels: Long,
      bits: Long, n_samples: Long, sum_sq: Long, err: String)

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) |
      ((b(o + 3) & 0xff) << 24)

  private def imageErr(id: Long, why: String): ImageMeta =
    ImageMeta(id, -1, -1, -1, 0, 0, 0, 0, null, why)

  /** Windows bitmap, BI_RGB 24-bpp (the uncompressed interchange form):
    * BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER, pixel rows
    * bottom-up (negative height = top-down), each row padded to 4 bytes,
    * samples ordered B,G,R. */
  def parseBmp(id: Long, b: Array[Byte]): ImageMeta = {
    // classify by magic before length: a 9-byte text payload is "not BMP",
    // not a truncated one
    if (b.length < 2 || b(0) != 'B' || b(1) != 'M') return imageErr(id, "not BMP")
    if (b.length < 54) return imageErr(id, "truncated header")
    val pixOff = le32(b, 10)
    val hdrSize = le32(b, 14)
    if (hdrSize < 40) return imageErr(id, s"unsupported header size $hdrSize")
    val width = le32(b, 18)
    val rawH = le32(b, 22)
    val height = math.abs(rawH)
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    if (compression != 0) return imageErr(id, s"compressed BMP ($compression)")
    if (bpp != 24) return imageErr(id, s"unsupported bpp $bpp")
    if (width <= 0 || height <= 0) return imageErr(id, "bad dimensions")
    // Long arithmetic: an adversarial width overflows `width * 3` in Int,
    // turning the bounds check below into an out-of-bounds read. The checks
    // are staged so no product can overflow Long either (width=height=2^31-1
    // makes strideL*height ~1.4e19 > Long.Max, which would wrap negative and
    // sail past a single combined comparison): first a row must fit, then
    // the row count is bounded by division — both operands already <= length.
    if (pixOff < 0 || pixOff > b.length) return imageErr(id, "truncated pixel data")
    val strideL = ((width.toLong * 3 + 3) / 4) * 4
    val avail = (b.length - pixOff).toLong
    if (strideL > avail || height.toLong > avail / strideL)
      return imageErr(id, "truncated pixel data")
    val stride = strideL.toInt // fits: stride <= avail <= Int.Max
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < height) {
      var o = pixOff + y * stride
      var x = 0
      while (x < width) {
        sb += b(o) & 0xff; sg += b(o + 1) & 0xff; sr += b(o + 2) & 0xff
        o += 3; x += 1
      }
      y += 1
    }
    ImageMeta(id, width, height, bpp, width.toLong * height, sr, sg, sb,
      "bmp", null)
  }

  private def audioErr(id: Long, why: String): AudioMeta =
    AudioMeta(id, -1, -1, -1, 0, 0, why)

  /** RIFF/WAVE with integer PCM (format tag 1), 8-bit unsigned or 16-bit
    * signed little-endian. Chunks are walked, not assumed adjacent — real
    * encoders interleave LIST/fact chunks before data. Amplitudes are
    * centered (8-bit: s−128) so silence sums to zero in both widths. */
  def parseWav(id: Long, b: Array[Byte]): AudioMeta = {
    if (b.length < 4 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F')
      return audioErr(id, "not WAV")
    if (b.length < 12) return audioErr(id, "truncated header")
    if (b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E')
      return audioErr(id, "not WAV")
    var rate, channels, bits = -1
    var fmtTag = -1
    var dataOff, dataLen = -1
    var o = 12
    while (o + 8 <= b.length) {
      val cid = new String(b, o, 4, "US-ASCII")
      val len = le32(b, o + 4)
      if (len < 0 || o + 8 + len > b.length)
        return audioErr(id, s"truncated chunk $cid")
      cid match {
        case "fmt " if len >= 16 =>
          fmtTag = le16(b, o + 8)
          channels = le16(b, o + 10)
          rate = le32(b, o + 12)
          bits = le16(b, o + 22)
        case "data" => dataOff = o + 8; dataLen = len
        case _ => ()
      }
      o += 8 + len + (len % 2) // chunks are word-aligned
    }
    if (fmtTag == -1) return audioErr(id, "no fmt chunk")
    if (fmtTag != 1) return audioErr(id, s"non-PCM format $fmtTag")
    if (dataOff == -1) return audioErr(id, "no data chunk")
    if (bits != 8 && bits != 16) return audioErr(id, s"unsupported bits $bits")
    if (channels <= 0) return audioErr(id, s"bad channel count $channels")
    val bytesPer = bits / 8
    val n = dataLen / bytesPer
    var sq = 0L
    var i = 0
    while (i < n) {
      val s =
        if (bits == 8) (b(dataOff + i) & 0xff) - 128
        else le16(b, dataOff + i * 2).toShort.toInt
      sq += s.toLong * s; i += 1
    }
    AudioMeta(id, rate, channels, bits, n.toLong / channels, sq, null)
  }

  /** Batch BMP decode — one decoder loop per partition, streaming. The
    * catch-all is the err-row contract's last line of defense: a parser bug
    * on an adversarial payload must cost one err row, never the task. */
  def decodeBmp(media: Dataset[MediaRow]): Dataset[ImageMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { r =>
      try parseBmp(r.doc_id, r.media)
      catch { case e: Exception => imageErr(r.doc_id, s"decode failed: ${e.getMessage}") }
    })
  }

  /** Batch WAV decode — same err-row catch-all contract as [[decodeBmp]]. */
  def decodeWav(media: Dataset[MediaRow]): Dataset[AudioMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { r =>
      try parseWav(r.doc_id, r.media)
      catch { case e: Exception => audioErr(r.doc_id, s"decode failed: ${e.getMessage}") }
    })
  }

  /** Real image resize — the operation [[Multimodal.resize]] stubs with
    * byte truncation: decode via ImageIO, nearest-neighbor resample
    * (deterministic — no anti-aliasing kernel to vary by JDK), re-encode
    * PNG (lossless, so the resampled pixels round-trip exactly). Row-local
    * binary-in/binary-out, same shape as every decoder here; undecodable
    * payloads pass through unchanged with a `;resize=failed` type tag
    * rather than killing the task. */
  def resizeImage(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    require(w > 0 && h > 0, s"resize target must be positive, got ${w}x$h")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { r =>
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.media))
        if (img == null) MediaRow(r.doc_id, r.media, r.media_type + ";resize=failed")
        else {
          val out = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
          g.drawImage(img, 0, 0, w, h, null)
          g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          MediaRow(r.doc_id, bos.toByteArray, s"image/png;resized=${w}x$h")
        }
      } catch {
        case _: Exception => MediaRow(r.doc_id, r.media, r.media_type + ";resize=failed")
      }
    })
  }

  /** JDK-built-in image decode (`javax.imageio`: PNG, JPEG, GIF, BMP) —
    * the breadth path where the hand-rolled parser covers only BI_RGB.
    * Same exact-integer output contract; per-partition reader reuse is
    * ImageIO's own caching. Headless-safe: decoding never touches a
    * display. */
  def decodeImage(media: Dataset[MediaRow]): Dataset[ImageMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { r =>
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.media))
        if (img == null) imageErr(r.doc_id, "no registered decoder")
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          var (sr, sg, sb) = (0L, 0L, 0L)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
              x += 1
            }
            y += 1
          }
          ImageMeta(r.doc_id, w, h, img.getColorModel.getPixelSize,
            w.toLong * h, sr, sg, sb, "imageio", null)
        }
      } catch {
        case e: Exception => imageErr(r.doc_id, s"decode failed: ${e.getMessage}")
      }
    })
  }
}
