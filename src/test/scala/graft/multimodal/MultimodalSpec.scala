package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "a" * 100), (2L, "xy" * 300), (3L, "z")).toDF("doc_id", "text")

  test("withMedia produces binary payload with byte-length metadata") {
    val m = Multimodal.withMedia(docs).collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("n_bytes")).toMap
    assert(m === Map(1L -> 100L, 2L -> 600L, 3L -> 1L))
  }

  test("sampleChunks covers the payload exactly with 256-byte chunks") {
    val chunks = Multimodal.sampleChunks(Multimodal.withMedia(docs), "doc_id")
      .withColumn("len", length(col("chunk")))
      .groupBy("doc_id").agg(count(lit(1)).as("n"), sum("len").as("bytes"))
      .collect().map(r => r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n"), r.getAs[Long]("bytes")))).toMap
    assert(chunks(1L) === ((1L, 100L)))
    assert(chunks(2L) === ((3L, 600L))) // 256+256+88
    assert(chunks(3L) === ((1L, 1L)))
  }

  test("byteHistogram buckets every byte exactly once") {
    val h = Multimodal.byteHistogram(Multimodal.withMedia(docs), "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Seq[Long]]("histogram")).toMap
    assert(h(1L).sum === 100L)
    assert(h(1L)(('a'.toInt & 0xff) >> 4) === 100L) // all 'a' bytes in one bucket
    assert(h(2L).sum === 600L)
  }

  test("syntheticFeatures is deterministic on identical payloads") {
    val b = "hello".getBytes("UTF-8")
    assert(Multimodal.syntheticFeatures(b) === Multimodal.syntheticFeatures(b.clone()))
  }

  /** An in-memory 16-bit PCM mono WAV: a full-scale-ish square wave —
    * every sample is ±amp, so peak == amp/32768 and rms == peak exactly.
    */
  private def wavBytes(rate: Int = 8000, nFrames: Int = 4000,
      amp: Int = 16384, channels: Int = 1): Array[Byte] = {
    val dataLen = nFrames * channels * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(rate)
      .putInt(rate * channels * 2).putShort((channels * 2).toShort).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    for (i <- 0 until nFrames * channels)
      bb.putShort(if ((i / 8) % 2 == 0) amp.toShort else (-amp).toShort)
    bb.array()
  }

  test("decodeWav parses a generated PCM WAV end-to-end: header + stats") {
    val m = Multimodal.decodeWav(wavBytes()).get
    assert(m.nChannels === 1 && m.sampleRateHz === 8000 && m.bitsPerSample === 16)
    assert(m.nFrames === 4000L && m.durationMs === 500L) // 4000 / 8000 Hz
    // square wave at ±16384: peak = rms = 0.5 exactly
    assert(m.peakAbs === 0.5 && m.rms === 0.5)
    // stereo: frames = samples / channels (the generator writes
    // nFrames × channels samples, so the frame count is unchanged)
    val st = Multimodal.decodeWav(wavBytes(channels = 2)).get
    assert(st.nChannels === 2 && st.nFrames === 4000L && st.durationMs === 500L)
    // non-WAV and truncated payloads refuse rather than guess
    assert(Multimodal.decodeWav("not audio at all".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeWav(wavBytes().take(60)).isEmpty)
  }

  test("decode routes WAV to the real audio parser, not the synthetic fake") {
    val r = Multimodal.decode(wavBytes())
    assert(r.getString(0) === "audio/wav")
    assert(r.isNullAt(1) && r.isNullAt(2)) // width/height are image-only
  }

  test("audioFeatures extracts per-row WAV stats executor-side; non-audio rows keep nulls") {
    val rows = Seq((1L, wavBytes()), (2L, "plain text".getBytes("UTF-8")))
      .toDF("doc_id", "media")
    val out = Multimodal.audioFeatures(rows, "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val a = out(1L)
    assert(a.getAs[Int]("sample_rate_hz") === 8000)
    assert(a.getAs[Long]("duration_ms") === 500L)
    assert(a.getAs[Long]("peak_micros") === 500000L)
    assert(a.getAs[Long]("rms_micros") === 500000L)
    assert(out(2L).isNullAt(out(2L).fieldIndex("sample_rate_hz")))
  }

  /** An in-memory PNG: 7×5, left half pure red, right half pure blue. */
  private def pngBytes(w: Int = 7, h: Int = 5): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) 0xff0000 else 0x0000ff)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("decode parses a real PNG: format and true dimensions") {
    val r = Multimodal.decode(pngBytes())
    assert(r.getString(0) === "image/png")
    assert(r.getInt(1) === 7 && r.getInt(2) === 5)
  }

  test("decode falls back to the deterministic synthetic features for non-media bytes") {
    val b = "not an image".getBytes("UTF-8")
    assert(Multimodal.decode(b) === Multimodal.syntheticFeatures(b))
  }

  test("decodeMedia decodes PNG rows and marks the rest synthetic, executor-side") {
    val rows = Seq((1L, pngBytes()), (2L, "plain text".getBytes("UTF-8")))
      .toDF("doc_id", "media")
    val out = Multimodal.decodeMedia(rows, "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("media_type"), r.getAs[Int]("width"), r.getAs[Int]("height")))).toMap
    assert(out(1L) === (("image/png", 7, 5)))
    assert(out(2L)._1 === "synthetic/undecoded")
  }

  test("resizeImages scales decodable images and passes the rest through") {
    val rows = Seq((1L, pngBytes(8, 6)), (2L, "not an image".getBytes("UTF-8")))
      .toDF("doc_id", "media")
    val out = Multimodal.resizeImages(rows, "doc_id", targetW = 4, targetH = 3)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val img = out(1L)
    assert(img.getAs[Boolean]("resized"))
    assert(img.getAs[Int]("width") === 4 && img.getAs[Int]("height") === 3)
    // round-trip: the emitted bytes decode as a real 4x3 PNG
    val Some((fmt, w, h, _)) = Multimodal.decodeImage(img.getAs[Array[Byte]]("media"))
    assert(fmt === "image/png" && w === 4 && h === 3)
    // undecodable payload: untouched bytes, resized = false, null dims
    assert(!out(2L).getAs[Boolean]("resized"))
    assert(out(2L).getAs[Array[Byte]]("media").toSeq === "not an image".getBytes("UTF-8").toSeq)
    assert(out(2L).isNullAt(out(2L).fieldIndex("width")))
  }

  test("channelHistogram: per-channel sums equal pixel count; colors land in the right bins") {
    val rows = Seq((1L, pngBytes()), (2L, "xx".getBytes("UTF-8"))).toDF("doc_id", "media")
    val out = Multimodal.channelHistogram(rows, "doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val img = out(1L)
    def hist(r: org.apache.spark.sql.Row, c: String): scala.collection.Seq[Long] =
      r.getSeq[Long](r.fieldIndex(c))
    val (rh, gh, bh) = (hist(img, "r_hist"), hist(img, "g_hist"), hist(img, "b_hist"))
    assert(rh.sum === 35L && gh.sum === 35L && bh.sum === 35L) // 7×5 pixels
    // left 3 columns red (r=255 → last bin), right 4 blue (b=255 → last bin)
    assert(rh.last === 15L && rh.head === 20L)
    assert(bh.last === 20L && bh.head === 15L)
    assert(gh.head === 35L) // green channel always 0 → first bin
    assert(out(2L).isNullAt(1)) // undecodable → null histograms
  }

  /** An in-memory YUV4MPEG2 stream, 4×2 C420 at 25 fps: each frame's Y
    * plane is a constant luma from `lumas`; chroma planes are 128 (gray).
    */
  private def y4mBytes(lumas: Seq[Int], w: Int = 4, h: Int = 2): Array[Byte] = {
    val header = s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420\n".getBytes("US-ASCII")
    val ySize = w * h
    val cSize = ((w + 1) / 2) * ((h + 1) / 2)
    val buf = new java.io.ByteArrayOutputStream()
    buf.write(header)
    lumas.foreach { y =>
      buf.write("FRAME\n".getBytes("US-ASCII"))
      (0 until ySize).foreach(_ => buf.write(y))
      (0 until 2 * cSize).foreach(_ => buf.write(128))
    }
    buf.toByteArray
  }

  test("decodeY4m parses header, counts frames, and sizes the planes") {
    val m = Multimodal.decodeY4m(y4mBytes(Seq(0, 255, 128))).get
    assert(m.width === 4 && m.height === 2)
    assert(m.fpsNum === 25 && m.fpsDen === 1)
    assert(m.nFrames === 3)
    assert(m.durationMs === 120L) // 3 frames / 25 fps
    // truncated stream and wrong magic are rejected, not half-parsed
    assert(Multimodal.decodeY4m(y4mBytes(Seq(0, 255)).dropRight(1)).isEmpty)
    assert(Multimodal.decodeY4m("MPEG4 junk\n".getBytes("US-ASCII")).isEmpty)
    // malformed header with huge W/H: frameSize would overflow Int
    // (50000*50000*1.5 > 2^31) — must return None, not walk off the
    // frame array and crash the task
    val huge = ("YUV4MPEG2 W50000 H50000 F30:1 C420\nFRAME\n" + "x" * 64)
      .getBytes("US-ASCII")
    assert(Multimodal.decodeY4m(huge).isEmpty)
    // ditto a frame claiming more bytes than the whole stream
    val tooBig = ("YUV4MPEG2 W1000 H1000 F30:1 C420\nFRAME\nxy")
      .getBytes("US-ASCII")
    assert(Multimodal.decodeY4m(tooBig).isEmpty)
    // decode() routes y4m before the synthetic fallback
    assert(Multimodal.decode(y4mBytes(Seq(10))).getString(0) === "video/y4m")
  }

  test("videoFeatures: exact luma mean and inter-frame motion in micros") {
    val rows = Seq((1L, y4mBytes(Seq(0, 255, 128))),
      (2L, "not video".getBytes("UTF-8"))).toDF("doc_id", "media")
    val out = Multimodal.videoFeatures(rows, "doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val v = out(1L)
    assert(v.getAs[Int]("n_frames") === 3)
    // mean luma (0+255+128)/3/255 = 0.50065...
    assert(v.getAs[Long]("mean_luma_micros") ===
      math.floor(383.0 / (3 * 255) * 1e6 + 0.5).toLong)
    // motion: |255-0| then |128-255| → (255+127)/(2*255)
    assert(v.getAs[Long]("motion_micros") ===
      math.floor(382.0 / (2 * 255) * 1e6 + 0.5).toLong)
    assert(out(2L).isNullAt(out(2L).fieldIndex("width"))) // undecodable → nulls
    // a single sampled frame has no motion
    val one = Multimodal.videoFeatures(
      Seq((1L, y4mBytes(Seq(7)))).toDF("doc_id", "media"), "doc_id").collect().head
    assert(one.isNullAt(one.fieldIndex("motion_micros")))
  }

  test("sampleFrames extracts every k-th Y plane with its timestamp") {
    val rows = Seq((1L, y4mBytes(Seq(0, 50, 100, 150, 200)))).toDF("doc_id", "media")
    val frames = Multimodal.sampleFrames(rows, "doc_id", every = 2).collect()
      .sortBy(_.getAs[Int]("frame_idx"))
    assert(frames.map(_.getAs[Int]("frame_idx")).toSeq === Seq(0, 2, 4))
    assert(frames.map(_.getAs[Long]("pts_ms")).toSeq === Seq(0L, 80L, 160L))
    assert(frames.forall(_.getAs[Array[Byte]]("y_plane").length === 8)) // 4×2 luma
    assert(frames(1).getAs[Array[Byte]]("y_plane").forall(b => (b & 0xff) === 100))
    // non-video rows contribute zero frames
    assert(Multimodal.sampleFrames(
      Seq((9L, "junk".getBytes("UTF-8"))).toDF("doc_id", "media"), "doc_id").count() === 0L)
  }
}
