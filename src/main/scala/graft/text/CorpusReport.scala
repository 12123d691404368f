package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The per-language "dataset card" a corpus release ships with — one row
  * per language rolling up the survey primitives this package provides:
  *
  *  - volume: n_docs, total_chars;
  *  - vocabulary: distinct-token estimate (portable relational HLL,
  *    [[CorpusSketches.hllRegisters]] — register-table state, not a
  *    vocabulary groupBy);
  *  - length shape: p50/p99 of doc length from the ≤64-cell log₂
  *    histogram ([[CorpusSketches.logHistogram]] — no sort);
  *  - duplication: corpus-global duplicated-sentence rate in integer
  *    micros ([[CorpusCuration.sentenceDedup]] — dedup is judged against
  *    the WHOLE corpus, then attributed to each language);
  *  - privacy: total PII matches ([[TextAnalysis.piiScrub]], counted on
  *    original text).
  *
  * Every component is a one-pass linear scan with bounded aggregation
  * state (sketches, not exact distincts), so the report costs a few
  * corpus scans however large the corpus — the operational difference
  * between "run the card nightly at 100 TB" and "can't". Composition is
  * five keyed aggregates joined on the language — each component is
  * independently oracle-checked by its own registered query; this query
  * pins the composition.
  */
object CorpusReport {

  def perLanguage(docs: DataFrame, langCol: String = "lang",
      keyCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val base = docs.groupBy(langCol).agg(
      count(lit(1)).as("n_docs"),
      sum(length(col(textCol)).cast("long")).as("total_chars"))
    val toks = TextAnalysis.withTokens(docs, textCol)
      .select(col(langCol), explode(col("tokens")).as("token"))
    val vocab = CorpusSketches.hllEstimate(
        CorpusSketches.hllRegisters(toks, langCol, "token"), langCol)
      .select(col(langCol), col("est_distinct").as("est_distinct_tokens"))
    val lens = CorpusSketches.logHistogramQuantiles(
        CorpusSketches.logHistogram(
          docs.select(col(langCol), length(col(textCol)).cast("long").as("_len")),
          langCol, "_len"),
        langCol, Seq(0.5, 0.99))
      .groupBy(langCol).agg(
        max(when(col("q") === 0.5, col("est"))).as("p50_chars"),
        max(when(col("q") === 0.99, col("est"))).as("p99_chars"))
    val sent = CorpusCuration.sentenceDedup(docs, keyCol, textCol)
      .join(docs.select(col(keyCol), col(langCol)), Seq(keyCol))
      .groupBy(langCol).agg(
        sum(col("n_sentences")).as("_total"),
        sum(col("n_kept")).as("_kept"))
      .select(col(langCol), expr(
        """CAST(floor(CAST(_total - _kept AS DOUBLE) / CAST(_total AS DOUBLE)
          |  * 1e6 + 0.5) AS BIGINT)""".stripMargin).as("dup_sent_micros"))
    val pii = TextAnalysis.piiScrub(docs, textCol)
      .groupBy(langCol).agg(sum(col("pii_total")).as("pii_total"))
    base
      .join(vocab, Seq(langCol), "left")
      .join(lens, Seq(langCol), "left")
      .join(sent, Seq(langCol), "left")
      .join(pii, Seq(langCol), "left")
  }
}
