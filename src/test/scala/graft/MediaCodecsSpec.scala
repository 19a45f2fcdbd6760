package graft

import graft.operators.{MediaCodecs, Multimodal}
import graft.operators.Multimodal.MediaRow

/** The real (non-stub) media decoders, checked three ways: against
  * hand-constructed payloads with known pixel/sample ground truth, against
  * corrupt payloads (err rows, never exceptions), and — for BMP —
  * differentially against the JDK's own ImageIO decode of the same bytes.
  */
class MediaCodecsSpec extends SparkSpec {

  // ---- payload builders (ground truth by construction) ---------------------

  private def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** 24-bpp BI_RGB bottom-up BMP with pixel(x, y) = (r, g, b) from `px`. */
  private def bmp(width: Int, height: Int, px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val stride = ((width * 3 + 3) / 4) * 4
    val dataSize = stride * height
    val out = java.nio.ByteBuffer.allocate(54 + dataSize)
    out.put('B'.toByte).put('M'.toByte).put(le32(54 + dataSize)).put(le32(0)).put(le32(54))
    out.put(le32(40)).put(le32(width)).put(le32(height)).put(le16(1)).put(le16(24))
    out.put(le32(0)).put(le32(dataSize)).put(le32(2835)).put(le32(2835)).put(le32(0)).put(le32(0))
    for (row <- 0 until height) {
      val y = height - 1 - row // bottom-up storage
      for (x <- 0 until width) {
        val (r, g, b) = px(x, y)
        out.put(b.toByte).put(g.toByte).put(r.toByte)
      }
      out.put(new Array[Byte](stride - width * 3))
    }
    out.array()
  }

  /** RIFF/WAVE, 16-bit PCM little-endian, with a junk LIST chunk between
    * fmt and data (real encoders do this; the walker must skip it). */
  private def wav16(rate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val listLen = 4
    val riffLen = 4 + (8 + 16) + (8 + listLen) + (8 + dataLen)
    val out = java.nio.ByteBuffer.allocate(8 + riffLen)
    out.put("RIFF".getBytes).put(le32(riffLen)).put("WAVE".getBytes)
    out.put("fmt ".getBytes).put(le32(16)).put(le16(1)).put(le16(channels))
    out.put(le32(rate)).put(le32(rate * channels * 2)).put(le16(channels * 2)).put(le16(16))
    out.put("LIST".getBytes).put(le32(listLen)).put("INFO".getBytes)
    out.put("data".getBytes).put(le32(dataLen))
    samples.foreach(s => out.put(le16(s & 0xffff)))
    out.array()
  }

  private def mediaDs(rows: Seq[(Long, Array[Byte])]) = {
    import spark.implicits._
    spark.createDataset(rows.map { case (id, b) => MediaRow(id, b, "media/test") })
  }

  // ---- BMP -----------------------------------------------------------------

  test("BMP decode: exact channel sums for constructed pixels, stride padding honored") {
    // 3x2 (stride padding present: 3*3=9 -> 12) with distinct channel ramps
    val img = bmp(3, 2, (x, y) => (10 * x + 1, 20 * y + 2, x + y))
    val out = MediaCodecs.decodeBmp(mediaDs(Seq((7L, img)))).collect().head
    assert(out.err == null && out.format == "bmp")
    assert((out.width, out.height, out.bpp, out.n_px) == (3L, 2L, 24L, 6L))
    val truth = for { x <- 0 until 3; y <- 0 until 2 } yield (10 * x + 1, 20 * y + 2, x + y)
    assert(out.sum_r == truth.map(_._1).sum)
    assert(out.sum_g == truth.map(_._2).sum)
    assert(out.sum_b == truth.map(_._3).sum)
  }

  test("BMP decode agrees with the JDK's ImageIO on the same bytes") {
    val img = bmp(5, 4, (x, y) => ((x * 37 + y * 11) % 256, (x * 5) % 256, (y * 93) % 256))
    val rows = mediaDs(Seq((1L, img)))
    val own = MediaCodecs.decodeBmp(rows).collect().head
    val jdk = MediaCodecs.decodeImage(rows).collect().head
    assert(own.err == null && jdk.err == null)
    assert((own.width, own.height, own.n_px, own.sum_r, own.sum_g, own.sum_b) ==
      (jdk.width, jdk.height, jdk.n_px, jdk.sum_r, jdk.sum_g, jdk.sum_b),
      s"hand-rolled $own vs ImageIO $jdk")
  }

  test("corrupt images yield err rows, never exceptions") {
    val good = bmp(2, 2, (_, _) => (1, 2, 3))
    val out = MediaCodecs.decodeBmp(mediaDs(Seq(
      (1L, good),
      (2L, good.take(20)),                       // truncated header
      (3L, "not an image at all".getBytes),      // wrong magic
      (4L, good.take(60)),                       // header ok, pixels truncated
      (5L, { val b = good.clone(); b(30) = 1; b } // compression flag set
      )))).collect().sortBy(_.doc_id)
    assert(out(0).err == null)
    assert(out(1).err == "truncated header")
    assert(out(2).err == "not BMP")
    assert(out(3).err == "truncated pixel data")
    assert(out(4).err == "compressed BMP (1)")
  }

  test("adversarial BMP dimensions that overflow Long bounds yield err rows, not a crash") {
    // width = height = 2^31-1 makes stride*height ~1.38e19 > Long.Max: a
    // single combined bounds product wraps negative, passes the check, and
    // the truncated Int stride then drives an out-of-bounds pixel read that
    // kills the task. The staged guards must reject it as truncated instead.
    def hdr(width: Int, height: Int): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(54)
      out.put('B'.toByte).put('M'.toByte).put(le32(54)).put(le32(0)).put(le32(54))
      out.put(le32(40)).put(le32(width)).put(le32(height)).put(le16(1)).put(le16(24))
      out.put(le32(0)).put(le32(0)).put(le32(2835)).put(le32(2835)).put(le32(0)).put(le32(0))
      out.array()
    }
    val cases = Seq(
      hdr(Int.MaxValue, Int.MaxValue),  // stride*height wraps Long negative
      hdr(Int.MaxValue, 1),             // one row alone exceeds the payload
      hdr(2, Int.MaxValue),             // row fits; row count must be division-bounded
      { val b = hdr(2, 2); System.arraycopy(le32(Int.MaxValue), 0, b, 10, 4); b }) // huge pixOff
    for (b <- cases)
      assert(MediaCodecs.parseBmp(1L, b).err == "truncated pixel data",
        s"width=${b.slice(18, 22).toSeq} height=${b.slice(22, 26).toSeq}")
    // and the batch path keeps the err-row contract under the same payloads
    val out = MediaCodecs.decodeBmp(mediaDs(cases.zipWithIndex.map { case (b, i) => (i.toLong, b) }))
      .collect()
    assert(out.length == 4 && out.forall(_.err == "truncated pixel data"))
  }

  test("ImageIO path decodes a JDK-encoded PNG with exact sums") {
    val bi = new java.awt.image.BufferedImage(4, 3, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 4; y <- 0 until 3)
      bi.setRGB(x, y, (x * 50 << 16) | (y * 80 << 8) | (x + y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "png", bos)
    val out = MediaCodecs.decodeImage(mediaDs(Seq((9L, bos.toByteArray)))).collect().head
    assert(out.err == null && (out.width, out.height) == (4L, 3L))
    val truth = for { x <- 0 until 4; y <- 0 until 3 } yield (x * 50, y * 80, x + y)
    assert((out.sum_r, out.sum_g, out.sum_b) ==
      (truth.map(_._1.toLong).sum, truth.map(_._2.toLong).sum, truth.map(_._3.toLong).sum))
  }

  // ---- WAV -----------------------------------------------------------------

  test("WAV decode: 16-bit PCM with an interleaved LIST chunk, exact energy") {
    val samples = Array[Short](0, 1000, -1000, 32767, -32768, 12)
    val out = MediaCodecs.decodeWav(mediaDs(Seq((3L, wav16(44100, 1, samples))))).collect().head
    assert(out.err == null)
    assert((out.sample_rate, out.channels, out.bits, out.n_samples) == (44100L, 1L, 16L, 6L))
    assert(out.sum_sq == samples.map(s => s.toLong * s).sum)
  }

  test("WAV decode: stereo frame count and 8-bit centering") {
    val stereo = wav16(8000, 2, Array[Short](5, -5, 7, -7)) // 2 frames x 2 ch
    val o1 = MediaCodecs.decodeWav(mediaDs(Seq((1L, stereo)))).collect().head
    assert(o1.err == null && o1.n_samples == 2L && o1.channels == 2L)
    assert(o1.sum_sq == 2 * 25L + 2 * 49L)
    // 8-bit: bytes are unsigned, 128 = silence
    val hdr = wav16(8000, 1, Array.empty[Short])
    val eightBit = {
      val b = hdr.clone()
      b(34) = 8 // bitsPerSample in fmt
      val data = Array[Byte](128.toByte, 130.toByte, 126.toByte) // 0, +2, -2
      val withData = java.util.Arrays.copyOf(b, b.length + 3)
      System.arraycopy(data, 0, withData, b.length, 3)
      // patch the data chunk length (last chunk) and RIFF length
      System.arraycopy(le32(3), 0, withData, b.length - 4, 4)
      System.arraycopy(le32(withData.length - 8), 0, withData, 4, 4)
      withData
    }
    val o2 = MediaCodecs.decodeWav(mediaDs(Seq((2L, eightBit)))).collect().head
    assert(o2.err == null && o2.bits == 8L && o2.n_samples == 3L && o2.sum_sq == 8L)
  }

  test("corrupt audio yields err rows: truncation, non-PCM, missing chunks") {
    val good = wav16(8000, 1, Array[Short](1, 2))
    val nonPcm = { val b = good.clone(); b(20) = 3; b } // IEEE float tag
    val out = MediaCodecs.decodeWav(mediaDs(Seq(
      (1L, good),
      (2L, good.take(10)),
      (3L, "RIFFxxxxOGGS".getBytes),
      (4L, nonPcm),
      (5L, good.dropRight(1))))).collect().sortBy(_.doc_id)
    assert(out(0).err == null)
    assert(out(1).err == "truncated header")
    assert(out(2).err == "not WAV")
    assert(out(3).err == "non-PCM format 3")
    assert(out(4).err != null) // truncated final chunk
  }

  test("real resize: decoded dimensions change, solid color survives, failures pass through") {
    val img = bmp(8, 6, (_, _) => (40, 90, 200)) // solid color
    val rows = mediaDs(Seq((1L, img), (2L, "not an image".getBytes)))
    val out = MediaCodecs.resizeImage(rows, 4, 3).collect().sortBy(_.doc_id)
    val meta = MediaCodecs.decodeImage(mediaDs(Seq((1L, out(0).media)))).collect().head
    assert(meta.err == null && (meta.width, meta.height) == (4L, 3L))
    // nearest-neighbor over a solid image is the same solid image
    assert((meta.sum_r, meta.sum_g, meta.sum_b) == (40L * 12, 90L * 12, 200L * 12))
    assert(out(0).media_type == "image/png;resized=4x3")
    assert(out(1).media_type.endsWith(";resize=failed") &&
      (out(1).media sameElements "not an image".getBytes))
  }

  test("decoders compose with the multimodal wrapper plumbing") {
    // asMedia wraps text bytes; real decoders classify them as non-media
    val docs = spark.createDataFrame(Seq((1L, "just text"))).toDF("doc_id", "text")
    val media = Multimodal.asMedia(docs, "doc_id", "text")
    assert(MediaCodecs.decodeBmp(media).collect().head.err == "not BMP")
    assert(MediaCodecs.decodeWav(media).collect().head.err == "not WAV")
  }
}
