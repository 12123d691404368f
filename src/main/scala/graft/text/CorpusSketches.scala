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

  /** Count–Min sketch (Cormode & Muthukrishnan 2005) as a RELATIONAL
    * artifact: `depth` hash rows × `width` buckets, each cell the exact
    * count of items hashed into it. One explode (×depth) + one groupBy —
    * map-side partial aggregation collapses the stream to ≤ depth·width
    * cells per task before any shuffle, so the sketch costs O(depth·width)
    * state no matter how many items flow through (the frequency-summary
    * primitive a 100 TB token stream needs where an exact token groupBy
    * would shuffle the vocabulary).
    *
    * Unlike opaque binary sketch state, the cell TABLE round-trips through
    * parquet and any engine: the row hash is md5-based
    * (`conv(substr(md5(d:item),1,8))` — 32-bit, non-negative), so the
    * DuckDB oracle replays cells bit-for-bit. Merge = cellwise SUM
    * ([[cmsMerge]]); the estimate for an item is min over its depth cells
    * ([[cmsEstimate]]) — an OVERESTIMATE with P(err > 2N/width per row) ≤
    * 1/2, so P(all depth rows high) ≤ 2^-depth (the classic ε=e/width,
    * δ=e^-depth bound up to constants).
    *
    * Output: (d, w, cnt) — only nonzero cells (absent cell ≡ 0).
    */
  def cmsCells(items: DataFrame, itemCol: String, depth: Int = 4,
      width: Int = 1024): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth in [1,16]: $depth")
    require(width >= 2, s"width >= 2: $width")
    items
      .select(explode(expr(
        s"""transform(sequence(1, $depth), d -> struct(
           |  CAST(d AS BIGINT) AS d,
           |  CAST(conv(substr(md5(concat(CAST(d AS STRING), ':', $itemCol)), 1, 8), 16, 10) AS BIGINT) % $width AS w))""".stripMargin)).as("c"))
      .groupBy(col("c.d").as("d"), col("c.w").as("w"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge Count–Min cell tables built with the SAME (depth, width):
    * cellwise sum. sketch(A) ⊕ sketch(B) ≡ sketch(A ∪ B) exactly —
    * the property that lets per-shard/per-day sketches roll up without
    * rescanning (spec-pinned).
    */
  def cmsMerge(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy("d", "w").agg(sum("cnt").as("cnt"))

  /** Point estimates from a Count–Min cell table for a bounded probe set:
    * min over the item's depth cells (missing cell = 0 via the left join).
    * Output: (item, est). The probe side re-derives the same md5 row
    * hashes, joins the (≤ depth·width)-row cell table — broadcast-sized
    * by construction — and takes one min per item.
    */
  def cmsEstimate(cells: DataFrame, probes: DataFrame, itemCol: String,
      depth: Int = 4, width: Int = 1024): DataFrame = {
    val probeCells = probes
      .select(col(itemCol).as("item"))
      .distinct()
      .select(col("item"), explode(expr(
        s"""transform(sequence(1, $depth), d -> struct(
           |  CAST(d AS BIGINT) AS d,
           |  CAST(conv(substr(md5(concat(CAST(d AS STRING), ':', item)), 1, 8), 16, 10) AS BIGINT) % $width AS w))""".stripMargin)).as("c"))
      .select(col("item"), col("c.d").as("d"), col("c.w").as("w"))
    probeCells
      .join(broadcast(cells), Seq("d", "w"), "left")
      .groupBy("item")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
