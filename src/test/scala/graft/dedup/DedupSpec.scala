package graft.dedup

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 0
    (2L, "The Quick Brown Fox jumps over the lazy dog  "), // dup after normalize? (case differs -> same after lower/trim)
    (3L, "the quick brown fox jumps over the sleepy dog"), // near-dup
    (4L, "completely different content about spark engines and shuffles here")
  ).toDF("doc_id", "text")

  test("exactStats counts normalized duplicates") {
    val r = Dedup.exactStats(docs).collect().head
    assert(r.getAs[Long]("total_docs") === 5L)
    assert(r.getAs[Long]("distinct_texts") === 3L) // 0=1=2, 3, 4
    assert(r.getAs[Long]("duplicate_rows") === 2L)
  }

  test("jaccardPairs finds near-duplicates and scores exact dups 1.0") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", minJaccard = 0.3).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r.getAs[Double]("jaccard")).toMap
    assert(pairs((0L, 1L)) === 1.0)
    assert(pairs.contains((0L, 3L))) // near-dup above threshold
    assert(!pairs.keySet.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("simHash is deterministic and equal for identical texts") {
    val sigs = Dedup.simHash(docs, "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(0L) === sigs(1L))
    // near-dup has small hamming distance; unrelated doc large
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(0L), sigs(3L)) < ham(sigs(0L), sigs(4L)))
  }

  test("simHashPairs surfaces banded near-dup candidates") {
    val pairs = Dedup.simHashPairs(docs, "doc_id", maxHamming = 16).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs.contains((0L, 1L)))
  }

  test("minHashPairs finds the planted near-dup via banded buckets") {
    val pairs = Dedup.minHashPairs(docs, "doc_id", maxDistance = 0.9)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 3L)) || pairs.contains((1L, 3L)))
  }
}
