package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{ArtifactStore, ParquetIo, Tables}
import graft.dedup.{ImageDedup, PairGraph}
import graft.incremental.WatermarkStore
import graft.multimodal.Multimodal
import graft.text.CorpusCuration

/** The nightly-crawl loop in ONE invocation — the reference's
  * incremental-with-watermark identity
  * (`lambda/snowflake_extractor/watermark_manager.py:211-259`: advance
  * the mark only after the write lands) composed with the curation gates
  * and the STANDING dedup artifacts:
  *
  *  1. read documents with `doc_id` above the committed watermark (the
  *     new crawl);
  *  2. run the curation gates on the BATCH ONLY
  *     ([[CorpusCuration.curate]]: language/quality/length + exact
  *     dedup within the batch), then drop any doc the curated corpus
  *     ALREADY holds (an anti-join on the key — the replay guard that
  *     makes a re-read batch a no-op);
  *  3. append the survivors' near-dup edges into the committed
  *     pair-graph artifacts ([[PairGraph.appendBatchCommitted]] —
  *     touched-component re-cluster, marker-last versioned commit,
  *     batch watermark recorded in the commit metadata), and the
  *     survivors' image/audio/video fingerprints into the per-grain
  *     standing hash stores ([[ImageDedup.appendHashesCommitted]] —
  *     incremental batch-vs-corpus media dedup, same commit contract),
  *     and — when `suffixIndex` is on — the survivors' suffix ranks
  *     into the standing suffix index
  *     ([[graft.text.SuffixIndexStore.appendBatchCommitted]] — the
  *     fifth grain: ladder levels, token/pair dicts and window counts
  *     grow by dictionary probes, same commit contract);
  *  4. append the survivors to the curated corpus;
  *  5. ONLY THEN advance the watermark — and prune artifact versions
  *     older than the newest `keepLast` (a nightly loop otherwise
  *     accretes one version per night forever).
  *
  * Failure semantics are EXACTLY-once on every standing table: a crash
  * before step 5 leaves the mark at the previous run's value, so the
  * rerun re-reads the batch — but (a) artifact commits carry the batch
  * high-watermark in their marker metadata, so an append the latest
  * version already covers is skipped instead of re-unioned, (b) the
  * step-2 anti-join drops batch docs the corpus already holds, so a
  * crash after the corpus append cannot duplicate corpus rows or
  * generate self-matching edges, and (c) a crash INSIDE step 3 leaves a
  * torn (marker-less) artifact version that readers never see and the
  * rerun's commit clears. The rerun's standing tables are row-identical
  * to a single uninterrupted run (RunIncrementalCurationSpec replays a
  * crash at each step boundary and asserts exactly that).
  *
  * Bootstrap is decided by path-absence ONLY ([[ParquetIo.readOrEmpty]]):
  * a transient FS error or corrupted footer on an EXISTING corpus
  * rethrows — it must never silently commit an artifact version whose
  * batch found no corpus matches because the corpus "read empty".
  *
  * The cluster table after every run labels the FULL corpus's near-dup
  * components (incremental ≡ full rebuild — the q_incpairs gate), so
  * keep-representative / soft-dedup / leakage-split consumers read
  * standing artifacts that are always corpus-complete without any run
  * ever re-pairing the corpus with itself.
  *
  * Usage: runMain graft.pipeline.RunIncrementalCuration <docsDir> <outRoot>
  */
object RunIncrementalCuration {

  final case class IncRunResult(
      artifactVersion: Long,
      watermark: Option[Long],
      batchDocs: Long,
      keptDocs: Long)

  /** Test seam: thrown by [[run]] when `crashAfterStep` injects a fault —
    * specs use it to replay a crash at an exact step boundary. */
  final class InjectedCrash(step: Int)
    extends RuntimeException(s"injected crash after step $step")

  /** One nightly run. `keepLast` is the artifact retention window
    * (versions beyond it are pruned after the watermark advances);
    * `mediaDedup` grows the loop by the image/audio/video fingerprint
    * stages (off in text-only deployments); `suffixIndex` by the
    * standing suffix-index grain ([[graft.text.SuffixIndexStore]] —
    * ladder levels, token/pair dicts, window counts maintained under
    * the same batch-mark exactly-once contract, so incremental
    * ExactSubstr statistics probe a PERSISTED index);
    * `crashAfterStep` is a TEST-ONLY fault injector (3 = after artifact
    * commits, 4 = after corpus append) proving the replay guarantees
    * above.
    */
  def run(spark: SparkSession, docsDir: String, outRoot: String,
      config: CorpusCuration.Config = CorpusCuration.Config(),
      keepLast: Int = 2, mediaDedup: Boolean = false,
      suffixIndex: Boolean = false,
      crashAfterStep: Option[Int] = None): IncRunResult = {
    val store = new WatermarkStore(s"$outRoot/_state")
    val corpusPath = s"$outRoot/curated"
    val artifactsRoot = s"$outRoot/artifacts"
    val docs = Tables(spark, docsDir).documents
    val prevWm = store.get("documents", "doc_id").map(_.toLong)
    val batch = prevWm.map(v => docs.filter(col("doc_id") > v)).getOrElse(docs)
    val batchDocs = batch.count()
    if (batchDocs == 0L)
      return IncRunResult(
        ArtifactStore.latestVersion(spark, artifactsRoot).getOrElse(0L),
        prevWm, 0L, 0L)
    val hi = batch.agg(max("doc_id")).head.getLong(0)
    // gates on the batch only; keep the corpus schema (curation columns
    // are decision-time only)
    val curated = CorpusCuration.curate(batch, config)
      .select(docs.columns.map(col): _*)
    val corpus = ParquetIo.readOrEmpty(spark, corpusPath, curated.schema)
    // replay guard: docs the corpus already ingested (a rerun after a
    // crash between the corpus append and the watermark advance) drop
    // here, so the batch is key-disjoint from the corpus by construction
    val kept = curated
      .join(corpus.select("doc_id"), Seq("doc_id"), "left_anti")
      .localCheckpoint() // consumed by count + artifact appends + corpus write
    val keptDocs = kept.count()
    val version = PairGraph.appendBatchCommitted(
      spark, artifactsRoot, corpus, kept, "doc_id", batchMark = Some(hi))
    if (mediaDedup) {
      // the per-grain standing fingerprint stores: batch clips hash once,
      // band-join the standing 8-byte/clip table, hashes append — the
      // q_incimgdedup / q_incaudiodedup / q_incvideodedup shape inside
      // the nightly loop, so all four grains (text pair graph + three
      // media stores) maintain incrementally in one invocation
      val batchIds = kept.select("doc_id")
      ImageDedup.appendHashesCommitted(spark, s"$outRoot/artifacts_image",
        Multimodal.dHashes(
          Multimodal.syntheticBaseImages(batchIds, "doc_id"), "img_id")
          .withColumnRenamed("img_id", "doc_id"),
        "doc_id", batchMark = Some(hi))
      ImageDedup.appendHashesCommitted(spark, s"$outRoot/artifacts_audio",
        Multimodal.audioEnergyHashes(
          Multimodal.syntheticBaseWavs(batchIds, "doc_id"), "aud_id")
          .withColumnRenamed("aud_id", "doc_id"),
        "doc_id", batchMark = Some(hi))
      ImageDedup.appendHashesCommitted(spark, s"$outRoot/artifacts_video",
        Multimodal.videoTemporalHashes(
          Multimodal.syntheticBaseY4ms(batchIds, "doc_id"), "vid_id")
          .withColumnRenamed("vid_id", "doc_id"),
        "doc_id", batchMark = Some(hi))
    }
    if (suffixIndex) {
      // the fifth grain: the standing suffix index grows by the kept
      // batch — bootstrap commits the (possibly empty) current corpus as
      // v1 once, every night appends under the same batch-mark contract,
      // so a replayed night skips the commit instead of double-ranking.
      // The batch's vocabulary-drift row vs the standing token dict (OOV
      // rate + new-type count — the tokenizer retrain signal) ledgers
      // INTO the commit's marker metadata, so every version records how
      // far its batch moved the vocabulary (readable via
      // ArtifactStore.readMeta, no extra table).
      val sufRoot = s"$outRoot/artifacts_suffix"
      if (graft.core.ArtifactStore.latestVersion(spark, sufRoot).isEmpty)
        graft.text.SuffixIndexStore.bootstrapCommitted(spark, sufRoot,
          corpus, "doc_id")
      // (a replay's kept batch is empty — the append below skips on the
      // covered mark, so there is nothing to ledger either)
      val driftMeta = if (keptDocs == 0L) Map.empty[String, String] else {
        val standingDict =
          graft.text.SuffixIndexStore.read(spark, sufRoot).get.tokenDict
        graft.text.TextAnalysis.vocabDrift(kept, "doc_id", standingDict)
          .collect().headOption.map { r =>
            Map("vocab_n_tokens" -> r.getAs[Long]("n_tokens").toString,
              "vocab_oov_micros" -> r.getAs[Long]("oov_micros").toString,
              "vocab_new_types" -> r.getAs[Long]("n_new_types").toString)
          }.getOrElse(Map.empty[String, String])
      }
      graft.text.SuffixIndexStore.appendBatchCommitted(spark, sufRoot,
        kept, "doc_id", batchMark = Some(hi), extraMeta = driftMeta)
    }
    if (crashAfterStep.contains(3)) throw new InjectedCrash(3)
    if (keptDocs > 0L)
      kept.write.mode(SaveMode.Append).parquet(corpusPath)
    if (crashAfterStep.contains(4)) throw new InjectedCrash(4)
    // the mark advances LAST — commit-after-write, the reference contract
    store.put("documents", "doc_id", hi.toString)
    ArtifactStore.prune(spark, artifactsRoot, keepLast)
    if (mediaDedup)
      for (grain <- Seq("image", "audio", "video"))
        ArtifactStore.prune(spark, s"$outRoot/artifacts_$grain", keepLast)
    if (suffixIndex)
      ArtifactStore.prune(spark, s"$outRoot/artifacts_suffix", keepLast)
    IncRunResult(version, Some(hi), batchDocs, keptDocs)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: RunIncrementalCuration <docsDir> <outRoot>")
    val spark = graft.core.GraftSession.local(8)
    try {
      val r = run(spark, args(0), args(1))
      println(s"""{"artifact_version":${r.artifactVersion},"watermark":${r.watermark.getOrElse(-1L)},"batch_docs":${r.batchDocs},"kept_docs":${r.keptDocs}}""")
    } finally spark.stop()
  }
}
