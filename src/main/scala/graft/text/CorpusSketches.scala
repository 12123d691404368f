package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch-backed corpus statistics — the bounded-memory summaries a
  * 100 TB corpus survey runs where exact aggregation would shuffle the
  * world. All built on Spark's public sketch aggregates (Datasketches HLL,
  * space-saving top-k), so state per group is O(sketch), not O(distinct).
  *
  * Exactness contract: `approx_top_k` tracks `maxItemsTracked` items per
  * group; when a group's distinct-item count stays at or under that bound
  * the counts are EXACT (the sketch never evicts) — the spec pins this on
  * a skewed corpus. HLL estimates carry the standard ~1.6%/√(2^lgK)
  * relative error; the spec asserts the measured error bound, not
  * equality.
  */
object CorpusSketches {

  private def tokens(docs: DataFrame, textCol: String) =
    TextAnalysis.withTokens(docs, textCol)
      .select(explode(col("tokens")).as("token"))

  /** Heavy-hitter tokens: (token, cnt), exact while the corpus vocabulary
    * fits `maxItemsTracked`, approximate (space-saving guarantees) beyond.
    * One partial-aggregated sketch pass — no full token groupBy at scale.
    */
  def topTokensApprox(docs: DataFrame, k: Int, textCol: String = "text",
      maxItemsTracked: Int = 10000): DataFrame =
    tokens(docs, textCol)
      .agg(expr(s"approx_top_k(token, $k, $maxItemsTracked)").as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item").as("token"), col("e.count").as("cnt"))

  /** Per-group distinct-token estimates via Datasketches HLL:
    * (groupCol, est_distinct_tokens, n_tokens). lgConfigK 12 → ~1.6%
    * relative standard error at a few KB of state per group.
    */
  def distinctTokensByGroup(docs: DataFrame, groupCol: String,
      textCol: String = "text", lgConfigK: Int = 12): DataFrame =
    TextAnalysis.withTokens(docs, textCol)
      .select(col(groupCol), explode(col("tokens")).as("token"))
      .groupBy(groupCol)
      .agg(expr(s"hll_sketch_estimate(hll_sketch_agg(token, $lgConfigK))")
        .as("est_distinct_tokens"),
        count(lit(1)).as("n_tokens"))

  /** Mergeable distinct sketches: per-partition-of-the-corpus HLL binaries
    * that a later pass (or another engine reading the parquet) can union —
    * the artifact form incremental corpus accounting needs: yesterday's
    * sketches + today's batch sketch = today's totals, no rescan.
    */
  def distinctTokenSketches(docs: DataFrame, groupCol: String,
      textCol: String = "text", lgConfigK: Int = 12): DataFrame =
    TextAnalysis.withTokens(docs, textCol)
      .select(col(groupCol), explode(col("tokens")).as("token"))
      .groupBy(groupCol)
      .agg(expr(s"hll_sketch_agg(token, $lgConfigK)").as("hll"))

  /** Union previously-materialized sketches (e.g. read back from parquet)
    * into one estimate per group — the merge side of
    * [[distinctTokenSketches]].
    */
  def mergeDistinctSketches(sketches: DataFrame, groupCol: String): DataFrame =
    sketches.groupBy(groupCol)
      .agg(expr("hll_sketch_estimate(hll_union_agg(hll))").as("est_distinct_tokens"))
}
