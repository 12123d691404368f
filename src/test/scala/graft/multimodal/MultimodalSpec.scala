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

  test("decodeStub is deterministic on identical payloads") {
    val b = "hello".getBytes("UTF-8")
    assert(Multimodal.decodeStub(b) === Multimodal.decodeStub(b.clone()))
  }
}
