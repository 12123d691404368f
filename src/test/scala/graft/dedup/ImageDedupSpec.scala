package graft.dedup

import graft.SparkSpec
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Perceptual image dedup: dHash locality on real PNG round-trips and the
  * banded-candidate + exact-re-rank pipeline on hand-planted pairs.
  */
class ImageDedupSpec extends SparkSpec {
  import spark.implicits._

  private def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)

  test("dHash locality: brightness shift = 0 bits, one-block bump <= 2 bits, distinct images far") {
    val base = Multimodal.dHash64(Multimodal.blockPng("t1")).get
    val bright = Multimodal.dHash64(Multimodal.blockPng("t1", brightnessDelta = 8)).get
    assert(hamming(base, bright) === 0, "brightness shift preserves every gradient sign")
    // the bump's GUARANTEE is <= 2 flipped bits (the block's two
    // comparisons); whether any flips depends on the neighbors' levels
    for (t <- Seq("t1", "t2", "t3", "t4", "t5")) {
      val b0 = Multimodal.dHash64(Multimodal.blockPng(t)).get
      val b1 = Multimodal.dHash64(Multimodal.blockPng(t, bumpBlock = Some((3, 4)))).get
      assert(hamming(b0, b1) <= 2, s"$t: one-block bump flips at most 2 comparisons")
    }
    // t2's block (3,4) sits within bumpDelta of a neighbor, so its bump
    // genuinely flips a gradient sign — the pair is near-dup, not exact
    val t2 = Multimodal.dHash64(Multimodal.blockPng("t2")).get
    val t2b = Multimodal.dHash64(Multimodal.blockPng("t2", bumpBlock = Some((3, 4)))).get
    assert(hamming(t2, t2b) === 1)
    val other = Multimodal.dHash64(Multimodal.blockPng("t2")).get
    assert(hamming(base, other) > 3, "independent images live outside the acceptance region")
    // determinism: same tag, same bytes, same hash
    assert(Multimodal.dHash64(Multimodal.blockPng("t1")).get === base)
  }

  test("dHash64 decodes real PNGs and rejects non-images") {
    assert(Multimodal.dHash64(Multimodal.blockPng("x")).isDefined)
    assert(Multimodal.dHash64("not an image".getBytes("UTF-8")).isEmpty)
  }

  test("aHash: deterministic, exact-dup invariant, far for distinct images") {
    val a = Multimodal.aHash64(Multimodal.blockPng("t1")).get
    assert(Multimodal.aHash64(Multimodal.blockPng("t1")).get === a)
    val other = Multimodal.aHash64(Multimodal.blockPng("t2")).get
    assert(hamming(a, other) > 3)
    // a one-block bump moves at most that cell's bit plus mean-adjacent
    // cells; stays inside a loose re-rank budget
    val bumped = Multimodal.aHash64(Multimodal.blockPng("t1", bumpBlock = Some((3, 4)))).get
    assert(hamming(a, bumped) <= 8)
    assert(Multimodal.aHash64("junk".getBytes("UTF-8")).isEmpty)
  }

  test("banded pipeline finds exactly the planted pairs; nulls excluded") {
    // hand-built corpus: 1 <-> 101 brightness twin (hamming 0),
    // 2 <-> 102 bumped twin (hamming <= 2), 3 distinct, 4 undecodable
    val rows = Seq(
      (1L, Multimodal.blockPng("a")),
      (101L, Multimodal.blockPng("a", brightnessDelta = 8)),
      (2L, Multimodal.blockPng("b")),
      (102L, Multimodal.blockPng("b", bumpBlock = Some((3, 4)))),
      (3L, Multimodal.blockPng("c")),
      (4L, "garbage".getBytes("UTF-8")))
    val df = rows.toDF("img_id", "media")
    val hashes = Multimodal.dHashes(df, "img_id")
    assert(hashes.filter(col("dhash").isNull).select("img_id").as[Long].collect().toSeq === Seq(4L))
    val pairs = ImageDedup.dHashPairs(hashes, "img_id", bands = 4, maxHamming = 3)
      .orderBy("doc_a").collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 101L), (2L, 102L)))
    assert(pairs.find(_.getLong(0) == 1L).get.getAs[Int]("hamming") === 0)
    assert(pairs.find(_.getLong(0) == 2L).get.getAs[Int]("hamming") <= 2)
  }

  test("incremental batch-vs-corpus: batch work only, both duplicate sources routed") {
    // corpus: images a, b (fingerprints only — the standing 8-byte table);
    // batch: re-crawl of a (corpus hit), two copies of d (within-batch
    // pair), fresh e (no match)
    val corpus = Seq(
      (1L, Multimodal.blockPng("a")),
      (2L, Multimodal.blockPng("b"))).toDF("img_id", "media")
    val batch = Seq(
      (10L, Multimodal.blockPng("a", brightnessDelta = 8)),
      (11L, Multimodal.blockPng("d")),
      (12L, Multimodal.blockPng("d", brightnessDelta = 8)),
      (13L, Multimodal.blockPng("e"))).toDF("img_id", "media")
    val r = ImageDedup.incrementalDHashPairs(
      Multimodal.dHashes(batch, "img_id"), Multimodal.dHashes(corpus, "img_id"),
      "img_id").collect()
    val got = r.map(x => (x.getLong(0), x.getLong(1), x.getString(3))).toSet
    assert(got === Set((10L, 1L, "corpus"), (12L, 11L, "batch")))
  }

  test("pair graph composes: near-dup clusters over image pairs") {
    // a-chain of three perceptual twins clusters into ONE component
    val imgs = Seq(
      (1L, Multimodal.blockPng("a")),
      (2L, Multimodal.blockPng("a", brightnessDelta = 8)),
      (3L, Multimodal.blockPng("a", bumpBlock = Some((3, 4)))),
      (4L, Multimodal.blockPng("z"))).toDF("img_id", "media")
    val pairs = ImageDedup.dHashPairs(
      Multimodal.dHashes(imgs, "img_id"), "img_id", bands = 4, maxHamming = 3)
    val clusters = Dedup.dedupClusters(pairs)
    assert(clusters.select("cluster_id").distinct().count() === 1L)
    assert(clusters.count() === 3L) // image 4 is a singleton, not in pairs
  }

  test("synthetic corpus plants twins by id arithmetic") {
    val docs = (0L to 45L).toDF("doc_id")
    val imgs = Multimodal.syntheticBlockImages(docs, "doc_id", plantEvery = 20)
    // 46 bases + twins for ids 0, 20, 40
    assert(imgs.count() === 49)
    assert(imgs.filter(col("img_id") >= 10000000L).select("img_id").as[Long]
      .collect().sorted.toSeq === Seq(10000000L, 10000020L, 10000040L))
    val pairs = ImageDedup.dHashPairs(
      Multimodal.dHashes(imgs, "img_id"), "img_id", bands = 4, maxHamming = 3)
    assert(pairs.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ===
      Seq((0L, 10000000L), (20L, 10000020L), (40L, 10000040L)))
  }
}
