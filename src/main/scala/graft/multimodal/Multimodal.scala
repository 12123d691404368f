package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, chunk/frame sampling, and per-partition feature extraction.
  *
  * Image decode is REAL for the formats the JDK ships codecs for
  * (`javax.imageio`: PNG, BMP, GIF, JPEG, WBMP) — [[decode]] parses the
  * container and returns true width/height; [[channelHistogram]] extracts
  * per-channel pixel histograms. Audio/video codecs are not available in
  * this environment, so non-image payloads fall back to the clearly-marked
  * deterministic [[decodeStub]]; everything Spark-side — schema, batching,
  * partition-local iteration, output shape — is identical for both paths.
  *
  * Scale design: per-row byte work happens inside mapPartitions (no driver
  * collect, no shuffle); metadata stays columnar so filters on media_type /
  * n_bytes push into the scan.
  */
object Multimodal {

  val MediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType)
  ))

  /** Demo ingestion: materialize a binary payload column (UTF-8 bytes of the
    * text here; in production the bytes come off object storage) plus typed
    * metadata.
    */
  def withMedia(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("media", encode(col(textCol), "UTF-8"))
      .withColumn("media_type", lit("application/octet-stream"))
      .withColumn("n_bytes", length(col("media")).cast("long"))

  /** Frame/chunk sampling: every chunk of `chunkSize` bytes, via binary
    * substring — pure projection, no UDF.
    */
  def sampleChunks(df: DataFrame, keyCol: String, chunkSize: Int = 256): DataFrame =
    df.withColumn("n_chunks",
        ceil(col("n_bytes").cast("double") / chunkSize).cast("long"))
      .withColumn("chunk_idx", explode(expr("sequence(0, CAST(n_chunks AS INT) - 1)")))
      .withColumn("chunk",
        expr(s"substring(media, chunk_idx * $chunkSize + 1, $chunkSize)"))
      .select(col(keyCol), col("chunk_idx"), col("chunk"))

  /** STUB decode for formats without an in-sandbox codec (audio/video):
    * a deterministic fake deriving "dimensions" from the payload length so
    * the downstream plumbing (schema, joins, filters) is exercised honestly.
    */
  def decodeStub(bytes: Array[Byte]): Row = {
    // ??? <- real audio/video codec goes here; deterministic fake below.
    val n = bytes.length
    Row("stub/decoded", n % 640, n % 480, n.toLong)
  }

  /** Real image decode via `javax.imageio` (JDK-shipped codecs: PNG, BMP,
    * GIF, JPEG, WBMP). Returns (format, width, height, image) or None when
    * no installed reader recognizes the byte stream.
    */
  def decodeImage(bytes: Array[Byte]): Option[(String, Int, Int, java.awt.image.BufferedImage)] = {
    import javax.imageio.ImageIO
    val iis = ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(bytes))
    if (iis == null) return None
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis)
          val fmt = reader.getFormatName.toLowerCase
          val img = reader.read(0)
          Some((s"image/$fmt", img.getWidth, img.getHeight, img))
        } finally reader.dispose()
      }
    } catch { case _: Exception => None }
    finally iis.close()
  }

  /** Decode with [[MediaMetaSchema]] shape: real `javax.imageio` parse for
    * recognized image formats, [[decodeStub]] fallback otherwise — same
    * signature, so downstream schema/joins are identical either way.
    */
  def decode(bytes: Array[Byte]): Row = decodeImage(bytes) match {
    case Some((mt, w, h, _)) => Row(mt, w, h, bytes.length.toLong)
    case None                => decodeStub(bytes)
  }

  /** DataFrame-level decode: (key, media_type, width, height, n_bytes) via
    * mapPartitions — the byte-level parse stays executor-side and
    * partition-local; no shuffle, no driver collect.
    */
  def decodeMedia(df: DataFrame, keyCol: String, mediaCol: String = "media"): DataFrame = {
    val spark = df.sparkSession
    val keyIdx = df.schema.fieldIndex(keyCol)
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    val outSchema = StructType(df.schema(keyCol) +: MediaMetaSchema.fields.toSeq)
    val rdd = df.rdd.mapPartitions { iter =>
      iter.map { r =>
        val meta = decode(r.getAs[Array[Byte]](mediaIdx))
        Row.fromSeq(r.get(keyIdx) +: meta.toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Real image resize via AWT: decode (JDK codecs), scale with bilinear
    * interpolation to `targetW`×`targetH`, re-encode as PNG. Undecodable
    * payloads pass through unchanged with `resized = false` — the
    * pipeline keeps every row, mirroring the decode fallback contract.
    * mapPartitions keeps pixel work executor-side; output is
    * (key, media, width, height, resized).
    */
  def resizeImages(df: DataFrame, keyCol: String, targetW: Int, targetH: Int,
      mediaCol: String = "media"): DataFrame = {
    require(targetW > 0 && targetH > 0, "target dimensions must be positive")
    val spark = df.sparkSession
    val keyIdx = df.schema.fieldIndex(keyCol)
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    val outSchema = StructType(Seq(
      df.schema(keyCol),
      StructField("media", BinaryType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("resized", BooleanType)))
    val rdd = df.rdd.mapPartitions { iter =>
      iter.map { r =>
        val bytes = r.getAs[Array[Byte]](mediaIdx)
        decodeImage(bytes) match {
          case Some((_, _, _, img)) =>
            val out = new java.awt.image.BufferedImage(targetW, targetH,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            try {
              g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, targetW, targetH, null)
            } finally g.dispose()
            val buf = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", buf)
            Row(r.get(keyIdx), buf.toByteArray, targetW, targetH, true)
          case None =>
            Row(r.get(keyIdx), bytes, null, null, false)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Per-channel (R, G, B) pixel histograms with `bins` buckets per channel
    * — (key, r_hist, g_hist, b_hist), null arrays for undecodable payloads.
    * Each channel histogram sums to width×height. mapPartitions for the
    * same executor-side batch shape as [[byteHistogram]].
    */
  def channelHistogram(df: DataFrame, keyCol: String, mediaCol: String = "media",
      bins: Int = 8): DataFrame = {
    require(bins > 0 && 256 % bins == 0, s"bins must divide 256: $bins")
    val spark = df.sparkSession
    val keyIdx = df.schema.fieldIndex(keyCol)
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    val outSchema = StructType(Seq(
      df.schema(keyCol),
      StructField("r_hist", ArrayType(LongType, containsNull = false)),
      StructField("g_hist", ArrayType(LongType, containsNull = false)),
      StructField("b_hist", ArrayType(LongType, containsNull = false))))
    val width256 = 256 / bins
    val rdd = df.rdd.mapPartitions { iter =>
      iter.map { r =>
        decodeImage(r.getAs[Array[Byte]](mediaIdx)) match {
          case Some((_, w, h, img)) =>
            val rh = new Array[Long](bins); val gh = new Array[Long](bins); val bh = new Array[Long](bins)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val px = img.getRGB(x, y)
                rh(((px >> 16) & 0xff) / width256) += 1
                gh(((px >> 8) & 0xff) / width256) += 1
                bh((px & 0xff) / width256) += 1
                x += 1
              }
              y += 1
            }
            Row(r.get(keyIdx), rh.toSeq, gh.toSeq, bh.toSeq)
          case None => Row(r.get(keyIdx), null, null, null)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Per-partition feature extraction: 16-bin byte histogram per row.
    * mapPartitions keeps the byte loop executor-side and batch-amortized —
    * the same shape a real codec/feature-extractor (or a Pandas-UDF
    * equivalent) plugs into.
    */
  def byteHistogram(df: DataFrame, keyCol: String, mediaCol: String = "media"): DataFrame = {
    val spark = df.sparkSession
    val keyIdx = df.schema.fieldIndex(keyCol)
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    val outSchema = StructType(Seq(
      df.schema(keyCol),
      StructField("histogram", ArrayType(LongType, containsNull = false))))
    val rdd = df.rdd.mapPartitions { iter =>
      iter.map { r =>
        val bytes = r.getAs[Array[Byte]](mediaIdx)
        val hist = new Array[Long](16)
        var i = 0
        while (i < bytes.length) { hist((bytes(i) & 0xff) >> 4) += 1; i += 1 }
        Row(r.get(keyIdx), hist.toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
