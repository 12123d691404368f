package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{ArtifactStore, Tables}
import graft.dedup.PairGraph
import graft.incremental.WatermarkStore
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
  *     dedup within the batch);
  *  3. append the survivors' near-dup edges into the committed
  *     pair-graph artifacts ([[PairGraph.appendBatchCommitted]] —
  *     touched-component re-cluster, marker-last versioned commit);
  *  4. append the survivors to the curated corpus;
  *  5. ONLY THEN advance the watermark.
  *
  * Failure semantics are at-least-once end to end: a crash before step 5
  * leaves the mark at the previous run's value, so the rerun re-reads
  * the batch; a crash inside step 3 leaves a torn (marker-less) artifact
  * version that readers never see and the rerun overwrites; step 4's
  * corpus append before the mark means a rerun may re-append — the
  * curated corpus is keyed by doc_id, so downstream readers dedup by
  * key (or the corpus write moves to a transactional table format for
  * exactly-once, as RunPipeline documents for its sinks).
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

  def run(spark: SparkSession, docsDir: String, outRoot: String,
      config: CorpusCuration.Config = CorpusCuration.Config()): IncRunResult = {
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
    // gates on the batch only; keep the corpus schema (curation columns
    // are decision-time only)
    val kept = CorpusCuration.curate(batch, config)
      .select(docs.columns.map(col): _*)
      .localCheckpoint() // consumed by count + artifact append + corpus write
    val keptDocs = kept.count()
    val corpus = try spark.read.parquet(corpusPath)
      catch { case _: Exception => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], kept.schema) }
    val version = PairGraph.appendBatchCommitted(
      spark, artifactsRoot, corpus, kept, "doc_id")
    if (keptDocs > 0L)
      kept.write.mode(SaveMode.Append).parquet(corpusPath)
    // the mark advances LAST — commit-after-write, the reference contract
    val hi = batch.agg(max("doc_id")).head.getLong(0)
    store.put("documents", "doc_id", hi.toString)
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
