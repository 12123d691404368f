package graft.dedup

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental corpus dedup against a historical corpus via a Bloom
  * filter — the pattern for continuous-crawl ingestion at scale: a daily
  * batch must not re-shuffle the ENTIRE historical corpus to find its
  * duplicates. Instead the history is summarized once into a bounded
  * artifact (a Bloom filter over content fingerprints: ~1.2 GB per 10⁹
  * keys at 1% fpp — a broadcastable model, not a dataset), and each new
  * batch runs two phases:
  *
  *  1. **Bloom prefilter** (`graft_bf_contains`, a native codegen'd
  *     expression — no UDF, no join): rows whose fingerprint is NOT in the
  *     filter are *definitely new* (Bloom filters have no false negatives)
  *     and pass through untouched — at steady state that is almost the
  *     whole batch, for the cost of a projection.
  *  2. **Exact verify** of the maybe-duplicates only: a left-anti join of
  *     the small flagged slice against the history. False positives (the
  *     configured fpp of the batch) are restored here, so the two-phase
  *     result is EXACTLY the plain anti-join's — the filter changes the
  *     cost, never the answer.
  *
  * Beyond ~10¹⁰ historical keys a single filter stops being broadcastable;
  * the same two-phase contract then applies per hash-bucket (build one
  * filter per bucket of the history, route batch rows by the same bucket
  * key) — the filter artifact shards exactly like the data. Fingerprints
  * are 64-bit xxhash64 of the normalized text ([[Dedup.exactStats]]'s md5
  * normalization, hashed to long for `mightContainLong` probes).
  */
object BloomDedup {

  /** 64-bit content fingerprint: xxhash64 of the lower/trimmed text —
    * the long-keyed form of the md5 fingerprint the exact-dedup path uses.
    */
  def fingerprint(textCol: Column): Column = xxhash64(lower(trim(textCol)))

  /** One pass over the history → serialized Bloom filter over its
    * fingerprints. `expectedItems`/`fpp` size the filter
    * (n·ln(1/fpp)/ln²2 bits); the build is a distributed aggregation
    * (per-partition filters OR-merged), only the final artifact lands on
    * the driver.
    */
  def buildFilter(history: DataFrame, textCol: String = "text",
      expectedItems: Long = 1000000L, fpp: Double = 0.01): Array[Byte] = {
    val fps = history.select(fingerprint(col(textCol)).as("fp"))
    // stat.bloomFilter NPEs on an empty frame (its aggregate yields null
    // bytes); an empty history is a legitimate first-batch state -> an
    // empty filter (everything probes new).
    val bf =
      if (fps.isEmpty) org.apache.spark.util.sketch.BloomFilter.create(expectedItems, fpp)
      else fps.stat.bloomFilter("fp", expectedItems, fpp)
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** Incremental maintenance of the filter artifact: fold a new batch's
    * fingerprints into an existing filter WITHOUT re-scanning history —
    * one batch-sized build + a bit-OR merge. Bloom insertion is
    * idempotent bit-setting, so for a fixed (expectedItems, fpp) sizing
    * the merged filter is BIT-IDENTICAL to one built over
    * history ∪ batch (BloomDedupSpec asserts the byte equality); size
    * `expectedItems` for the corpus's target population, not today's
    * count, exactly as a fresh build would.
    */
  def addBatch(filterBytes: Array[Byte], batch: DataFrame,
      textCol: String = "text", expectedItems: Long = 1000000L,
      fpp: Double = 0.01): Array[Byte] = {
    val standing = org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(filterBytes))
    val batchFilter = org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(
        buildFilter(batch, textCol, expectedItems, fpp)))
    require(standing.isCompatible(batchFilter),
      "filter sizing changed: rebuild the standing filter instead of merging")
    standing.mergeInPlace(batchFilter)
    val out = new ByteArrayOutputStream()
    standing.writeTo(out)
    out.toByteArray
  }

  /** Phase 1: split a batch on the filter probe. Adds `maybe_dup` —
    * `false` rows are guaranteed-new (no false negatives); `true` rows
    * need the exact verify. Pure codegen'd projection.
    */
  def probe(batch: DataFrame, filterBytes: Array[Byte],
      textCol: String = "text"): DataFrame = {
    graft.functions.GraftFunctions.register(batch.sparkSession)
    // The filter bytes enter the plan as a BinaryType Literal
    // (lit(Array[Byte]) via call_function) — NOT as an X'..' SQL hex
    // string, which doubles the size (2 chars/byte) and hits JVM
    // string/parser limits long before the ~1.2 GB filters the class doc
    // promises are broadcastable.
    batch.withColumn("_fp", fingerprint(col(textCol)))
      .withColumn("maybe_dup",
        call_function("graft_bf_contains", lit(filterBytes), col("_fp")))
  }

  /** Both phases: rows of `batch` whose normalized text does not appear in
    * `history`. Identical result to
    * `batch.join(history, fingerprints match, "left_anti")`, but the exact
    * join only processes the bloom-flagged slice (true dups + fpp of the
    * batch) instead of the whole batch.
    */
  def newDocuments(batch: DataFrame, history: DataFrame,
      filterBytes: Array[Byte], textCol: String = "text"): DataFrame = {
    val probed = probe(batch, filterBytes, textCol)
    val definitelyNew = probed.filter(!col("maybe_dup"))
    val verified = probed.filter(col("maybe_dup"))
      .join(history.select(fingerprint(col(textCol)).as("_fp")).distinct(),
        Seq("_fp"), "left_anti")
    definitelyNew.unionByName(verified).drop("_fp", "maybe_dup")
  }
}
