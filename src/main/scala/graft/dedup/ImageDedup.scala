package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Perceptual image near-duplicate pairs — the image-grain sibling of the
  * text dedup stack (the reference's dedup DQ check,
  * reference/lambda/data_quality_monitor/lambda_function.py:246-277, at
  * the media grain the brief makes first-class): images whose dHash
  * fingerprints ([[graft.multimodal.Multimodal.dHash64]] — gradient signs
  * of the decoded luma plane) differ in at most `maxHamming` of 64 bits.
  *
  * Candidate generation is the q_simhash shape: the 64-bit fingerprint is
  * split into `bands` contiguous slices and pairs sharing any slice become
  * candidates (bucket equi-join — never all-pairs), then the EXACT
  * hamming distance (`bit_count(a XOR b)` — one codegen'd projection on
  * two longs) re-ranks. Pigeonhole guarantee: with maxHamming ≤ bands − 1,
  * every true pair has more bands than differing bits, so at least one
  * band is bit-identical and the banding CANNOT miss inside the
  * acceptance region — recall 1.0 by construction, which q_imgdedup's
  * planted-pair oracle asserts.
  *
  * Scale shape: fingerprints are one mapPartitions over the media bytes
  * (pixel work executor-side, 8 bytes out per image); banding explodes
  * each image to `bands` rows of (band_id, 16-bit value) — the only
  * shuffle is the bucket join, bucket sizes are hamming-ball occupancies
  * (random-looking fingerprints spread uniformly over 2¹⁶ values per
  * band), and the re-rank is pair-local long arithmetic with no media
  * bytes anywhere past the hash step. A 100 TB image corpus dedups on
  * ~8 bytes/image of shuffled state.
  */
object ImageDedup {

  /** Near-dup pairs (doc_a, doc_b, hamming) from a (key, dhash) frame —
    * null hashes (undecodable payloads) are excluded, matching the decode
    * fallback contract. 64 must be divisible by `bands`. Grain-agnostic:
    * only the 8-byte fingerprint column is ever touched, so the audio
    * energy-delta hashes ([[graft.multimodal.Multimodal.audioEnergyHash64]])
    * ride the same generator (q_audiodedup).
    */
  def dHashPairs(hashes: DataFrame, keyCol: String, bands: Int = 4,
      maxHamming: Int = 3): DataFrame = {
    require(bands >= 1 && 64 % bands == 0, s"bands must divide 64: $bands")
    require(maxHamming >= 0 && maxHamming < bands,
      s"pigeonhole guarantee needs maxHamming < bands: $maxHamming/$bands")
    val bits = 64 / bands
    val mask = if (bits == 64) -1L else (1L << bits) - 1
    val banded = hashes.filter(col("dhash").isNotNull)
      .select(col(keyCol), col("dhash"), posexplode(expr(
        s"transform(sequence(0, ${bands - 1}), b -> shiftright(dhash, b * $bits) & ${mask}L)"))
        .as(Seq("band_id", "band_val")))
    banded.toDF("doc_a", "dhash_a", "band_id", "band_val")
      .join(banded.toDF("doc_b", "dhash_b", "band_id", "band_val"),
        Seq("band_id", "band_val"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "dhash_a", "dhash_b").distinct()
      .withColumn("hamming", expr("bit_count(dhash_a ^ dhash_b)"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  /** Incremental batch-vs-corpus image dedup — the nightly-crawl shape
    * ([[Dedup.incrementalJaccardNearDups]] at the image grain): new
    * images band-join against the STANDING corpus fingerprint table (8
    * bytes/image — the artifact a production pipeline maintains), so
    * work scales with the batch and the corpus never self-joins.
    * Within-batch duplicates are caught by one batch-side [[dHashPairs]].
    * Output: (new_id, match_id, hamming, source ∈ {corpus, batch}).
    */
  def incrementalDHashPairs(newHashes: DataFrame, corpusHashes: DataFrame,
      keyCol: String, bands: Int = 4, maxHamming: Int = 3): DataFrame = {
    require(bands >= 1 && 64 % bands == 0, s"bands must divide 64: $bands")
    require(maxHamming >= 0 && maxHamming < bands,
      s"pigeonhole guarantee needs maxHamming < bands: $maxHamming/$bands")
    val bits = 64 / bands
    val mask = if (bits == 64) -1L else (1L << bits) - 1
    def banded(df: DataFrame) = df.filter(col("dhash").isNotNull)
      .select(col(keyCol), col("dhash"), posexplode(expr(
        s"transform(sequence(0, ${bands - 1}), b -> shiftright(dhash, b * $bits) & ${mask}L)"))
        .as(Seq("band_id", "band_val")))
    val vsCorpus = banded(newHashes).toDF("new_id", "dhash_n", "band_id", "band_val")
      .join(banded(corpusHashes).toDF("match_id", "dhash_c", "band_id", "band_val"),
        Seq("band_id", "band_val"))
      .select("new_id", "match_id", "dhash_n", "dhash_c").distinct()
      .withColumn("hamming", expr("bit_count(dhash_n ^ dhash_c)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("new_id"), col("match_id"), col("hamming"),
        lit("corpus").as("source"))
    val within = dHashPairs(newHashes, keyCol, bands, maxHamming)
      .select(col("doc_b").as("new_id"), col("doc_a").as("match_id"),
        col("hamming"), lit("batch").as("source"))
    vsCorpus.unionByName(within)
  }

  /** [[incrementalDHashPairs]] against a PERSISTED store — the media
    * grains' sibling of [[PairGraph.appendBatchCommitted]]: the standing
    * state is the corpus fingerprint table (`hashes`: key + 8 bytes per
    * clip/image — the artifact a production media pipeline actually
    * maintains) plus the accumulated match ledger (`matches`). Each
    * append (1) band-joins the BATCH's hashes against the standing
    * table ([[incrementalDHashPairs]] — work scales with the batch, the
    * corpus never self-joins), (2) unions the batch hashes into the
    * standing table (replay-safe: key anti-join first), and (3) commits
    * both marker-last ([[graft.core.ArtifactStore]]). `batchMark`
    * recorded in the commit metadata makes replays exactly-once, same
    * contract as the pair graph ([[PairGraph.BatchMarkKey]]). Returns
    * the committed version.
    */
  def appendHashesCommitted(spark: org.apache.spark.sql.SparkSession,
      root: String, batchHashes: DataFrame, keyCol: String,
      bands: Int = 4, maxHamming: Int = 3,
      batchMark: Option[Long] = None): Long = {
    import graft.core.ArtifactStore
    import graft.dedup.PairGraph
    batchMark.foreach { mark =>
      val latest = ArtifactStore.latestVersion(spark, root)
      if (latest.isDefined &&
          PairGraph.latestBatchMark(spark, root).exists(_ >= mark))
        return latest.get
    }
    val standing = ArtifactStore.read(spark, root, "hashes")
      .getOrElse(batchHashes.limit(0))
    val standingMatches = ArtifactStore.read(spark, root, "matches")
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          batchHashes.schema(keyCol).copy(name = "new_id"),
          batchHashes.schema(keyCol).copy(name = "match_id"),
          org.apache.spark.sql.types.StructField("hamming",
            org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField("source",
            org.apache.spark.sql.types.StringType)))))
    // replay guards: a batch carrying the same key twice (an upstream
    // that re-emitted a clip) collapses to one row BEFORE the anti-join —
    // fingerprints are deterministic per key, so dropDuplicates loses
    // nothing — and keys the standing table already holds drop next;
    // without the first guard a doubled key would union two identical
    // rows into the standing `hashes` table and inflate every future
    // band-join's match counts
    val novel = batchHashes
      .dropDuplicates(keyCol)
      .join(standing.select(keyCol), Seq(keyCol), "left_anti")
      .localCheckpoint() // consumed by the match join and the union
    val m = incrementalDHashPairs(novel, standing, keyCol, bands, maxHamming)
      .withColumn("hamming", col("hamming").cast("int"))
    ArtifactStore.commit(spark, root,
      Map("hashes" -> standing.unionByName(novel),
        "matches" -> standingMatches.unionByName(m)),
      meta = batchMark.map(v => PairGraph.BatchMarkKey -> v.toString).toMap)
  }

  /** Cross-clip EXACT shared-frame pairs — the "shared intro/outro"
    * detector at the frame grain: clips whose sampled frames
    * ([[graft.multimodal.Multimodal.sampleFrames]] output) contain
    * byte-identical Y planes. Frame identity is `md5(y_plane)` (a
    * codegen'd columnar projection — 16 bytes/frame is all that ever
    * shuffles), pairs come from the frame-hash equi-join (never
    * all-pairs), and a clip repeating a frame internally counts once
    * (per-clip distinct frame contents before the join).
    *
    * `maxClipsPerFrame` is the df stop-list (the q_setsim cap at the
    * frame grain): a frame shared by more clips than the cap — black
    * frames, title cards, the boilerplate of video — is excluded from
    * pair generation, bounding candidate volume ≤ cap · postings
    * explicitly instead of letting one ubiquitous frame go quadratic.
    *
    * Output: (clip_a, clip_b, n_shared_frames), clip_a < clip_b.
    */
  def sharedFramePairs(frames: DataFrame, keyCol: String,
      planeCol: String = "y_plane", maxClipsPerFrame: Int = 50): DataFrame = {
    require(maxClipsPerFrame >= 2, s"cap must allow pairs: $maxClipsPerFrame")
    // Eagerly materialized: fp feeds the df table AND both sides of the
    // pair self-join — lazily each consumer re-ran the upstream frame
    // decode (the md5 fingerprint is exactly the 16-byte/frame proxy the
    // heavy plane bytes should collapse to once, guide §8).
    val fp = frames.select(col(keyCol), md5(col(planeCol)).as("fh")).distinct()
      .localCheckpoint()
    val dfTab = fp.groupBy("fh").agg(count(lit(1)).as("fdf"))
    val kept = fp.join(dfTab.filter(col("fdf") <= maxClipsPerFrame), Seq("fh"))
      .select("fh", keyCol)
    kept.select(col("fh"), col(keyCol).as("clip_a"))
      .join(kept.select(col("fh"), col(keyCol).as("clip_b")), Seq("fh"))
      .filter(col("clip_a") < col("clip_b"))
      .groupBy("clip_a", "clip_b")
      .agg(count(lit(1)).as("n_shared_frames"))
  }
}
