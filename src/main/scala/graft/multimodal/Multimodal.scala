package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, chunk/frame sampling, and per-partition feature extraction.
  *
  * The actual image/audio codecs are NOT available in this environment, so
  * the decode step is a clearly-marked deterministic STUB; everything
  * Spark-side — schema, batching, partition-local iteration, output shape —
  * is real. Swap [[decodeStub]] for a real codec behind the same signature.
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

  /** STUB decode: a real implementation would parse the container format.
    * This deterministic fake derives "dimensions" from the payload length so
    * the downstream plumbing (schema, joins, filters) is exercised honestly.
    */
  def decodeStub(bytes: Array[Byte]): Row = {
    // ??? <- real codec goes here; deterministic fake below.
    val n = bytes.length
    Row("stub/decoded", n % 640, n % 480, n.toLong)
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
