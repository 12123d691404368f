package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end training-corpus curation: quality scoring → language filter →
  * exact dedup (keep lowest doc id per fingerprint) → curated output with
  * per-language stats. One composed declarative plan — the quality stats
  * and fingerprint are projections over the scan, dedup is one shuffle on
  * the md5 key, the rollup one more; nothing touches the driver.
  */
object CorpusCuration {

  final case class Config(
      minQuality: Double = 0.5,
      minTokens: Int = 10,
      maxTokens: Int = 100000,
      languages: Seq[String] = Seq("en"))

  /** Per-document curation decision columns (kept lazy for composition). */
  def scored(docs: DataFrame, config: Config = Config()): DataFrame =
    TextAnalysis.stats(docs)
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
      .withColumn("lang_ok", col("lang").isin(config.languages: _*))
      .withColumn("quality_ok", col("quality_score") >= config.minQuality)
      .withColumn("length_ok",
        col("n_tokens").between(config.minTokens, config.maxTokens))

  /** The curated corpus: passing docs, exact-deduped keeping the smallest
    * doc id per normalized fingerprint.
    */
  def curate(docs: DataFrame, config: Config = Config()): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val passing = scored(docs, config)
      .filter(col("lang_ok") && col("quality_ok") && col("length_ok"))
    passing
      .withColumn("_rn", row_number().over(
        Window.partitionBy("fp").orderBy(col("doc_id"))))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** Funnel report: how many documents each curation stage removed. */
  def funnel(docs: DataFrame, config: Config = Config()): DataFrame = {
    val s = scored(docs, config)
    s.agg(
      count(lit(1)).as("total_docs"),
      sum(when(!col("lang_ok"), 1L).otherwise(0L)).as("dropped_lang"),
      sum(when(col("lang_ok") && !col("quality_ok"), 1L).otherwise(0L)).as("dropped_quality"),
      sum(when(col("lang_ok") && col("quality_ok") && !col("length_ok"), 1L).otherwise(0L)).as("dropped_length"),
      sum(when(col("lang_ok") && col("quality_ok") && col("length_ok"), 1L).otherwise(0L)).as("passed"),
      countDistinct(when(col("lang_ok") && col("quality_ok") && col("length_ok"), col("fp"))).as("distinct_passed"))
  }
}
