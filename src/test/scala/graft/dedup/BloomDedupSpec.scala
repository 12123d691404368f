package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class BloomDedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val history = (1L to 300L)
    .map(i => (i, s"historical document number $i with stable content"))
    .toDF("doc_id", "text")

  // 40 exact re-crawls of history docs (modulo case/whitespace — the
  // fingerprint normalizes) + 160 genuinely new docs
  private lazy val batch = ((1001L to 1040L)
    .map(i => (i, s"  HISTORICAL document number ${i - 1000} with stable content ")) ++
    (2001L to 2160L).map(i => (i, s"fresh never-seen document $i")))
    .toDF("doc_id", "text")

  test("bloom probe has no false negatives: every true dup is flagged") {
    val f = BloomDedup.buildFilter(history, expectedItems = 1000)
    val probed = BloomDedup.probe(batch, f)
    val flagged = probed.filter(col("maybe_dup"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert((1001L to 1040L).forall(flagged.contains)) // guaranteed by the filter
  }

  test("two-phase newDocuments equals the plain anti-join exactly") {
    val f = BloomDedup.buildFilter(history, expectedItems = 1000)
    val twoPhase = BloomDedup.newDocuments(batch, history, f)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val plain = batch
      .withColumn("_fp", BloomDedup.fingerprint(col("text")))
      .join(history.select(BloomDedup.fingerprint(col("text")).as("_fp")).distinct(),
        Seq("_fp"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(twoPhase === plain)
    assert(twoPhase === (2001L to 2160L).toSet) // dups gone, new docs intact
  }

  test("a tight filter keeps the verify slice small (fpp bound holds)") {
    val f = BloomDedup.buildFilter(history, expectedItems = 1000, fpp = 0.01)
    val probed = BloomDedup.probe(batch, f)
    val falsePos = probed
      .filter(col("maybe_dup") && col("doc_id") >= 2001L).count()
    // 160 new docs at fpp 1%: expected ~1.6 false positives; 16 = 10x margin
    assert(falsePos <= 16L)
  }

  test("addBatch merge is BIT-IDENTICAL to rebuilding over the union") {
    val standing = BloomDedup.buildFilter(history, expectedItems = 1000)
    val newDocs = (5001L to 5100L)
      .map(i => (i, s"tomorrow's crawl document $i")).toDF("doc_id", "text")
    val merged = BloomDedup.addBatch(standing, newDocs, expectedItems = 1000)
    val rebuilt = BloomDedup.buildFilter(history.unionByName(newDocs),
      expectedItems = 1000)
    assert(java.util.Arrays.equals(merged, rebuilt),
      "bit-OR merge must equal the full rebuild for a fixed sizing")
    // and incompatible sizings refuse to merge rather than corrupting
    val e = intercept[IllegalArgumentException] {
      BloomDedup.addBatch(standing, newDocs, expectedItems = 5000)
    }
    assert(e.getMessage.contains("rebuild"))
  }
}
