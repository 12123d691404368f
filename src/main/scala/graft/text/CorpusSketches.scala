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

  /** HyperLogLog registers (Flajolet 2007) as a RELATIONAL artifact — the
    * portable sibling of [[distinctTokenSketches]]: where the Datasketches
    * binary is opaque engine state, this register TABLE (groupCol, bucket,
    * rho) round-trips through parquet and replays bit-for-bit in any
    * engine (the DuckDB oracle recomputes it from the same md5 hashes).
    * One groupBy-max over ≤ m rows of state per group — map-side
    * combinable, so a 100 TB token stream reduces to m counters per task
    * before the shuffle.
    *
    * Hash = 32-bit md5 prefix; low log2(m) bits pick the bucket, the
    * remaining 32−log2(m) bits feed rho = leading-zero count + 1,
    * computed arithmetically (`bin()` string length — no engine-specific
    * popcount, no libm). Merge = max per register ([[hllMergeRegisters]]):
    * registers(A) ⊔ registers(B) ≡ registers(A ∪ B) exactly.
    */
  def hllRegisters(items: DataFrame, groupCol: String, itemCol: String,
      m: Int = 256): DataFrame = {
    require(m >= 16 && (m & (m - 1)) == 0, s"m must be a power of two >= 16: $m")
    val restBits = 32 - Integer.numberOfTrailingZeros(m)
    items
      .withColumn("_h", expr(
        s"CAST(conv(substr(md5(concat('hll:', $itemCol)), 1, 8), 16, 10) AS BIGINT)"))
      .withColumn("bucket", col("_h") % m)
      .withColumn("_rest", expr(s"_h div $m"))
      .withColumn("_rho", expr(
        s"CASE WHEN _rest = 0 THEN ${restBits + 1} " +
          s"ELSE ${restBits + 1} - length(bin(_rest)) END"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(max(col("_rho")).cast("long").as("rho"))
  }

  /** Max-merge HLL register tables built with the same m — the union side
    * of [[hllRegisters]] (yesterday's registers ⊔ today's batch =
    * today's totals, no rescan).
    */
  def hllMergeRegisters(regs: DataFrame*): DataFrame =
    regs.reduce(_ unionByName _)
      .groupBy(col(regs.head.columns(0)), col("bucket"))
      .agg(max("rho").as("rho"))

  /** Raw HyperLogLog estimate from a register table: αₘ·m²/Σⱼ2^−Mⱼ with
    * empty registers contributing 2⁰. DETERMINISTIC across engines and
    * partitionings: Σ2^−Mⱼ is computed as the exact integer Σ2^(40−Mⱼ)
    * (Mⱼ ≤ 33 < 40, so every term and the sum are exact BIGINTs), and the
    * final double is one fixed left-associated literal expression — no
    * libm calls (the small/large-range ln() corrections are deliberately
    * omitted; raw-regime bias is the documented price of portability,
    * spec-pinned against exact counts).
    *
    * Output: (groupCol, n_buckets_set, est_distinct).
    */
  /** αₘ·m²·2⁴⁰ as ONE Scala-computed double, so engines divide by the
    * identical constant (a plain `0.7213 / …` SQL chain parses as DECIMAL
    * in both Spark and DuckDB, with engine-specific scale rules). The
    * shortest-round-trip decimal string parses back to this exact double
    * in any IEEE engine.
    */
  def hllScale(m: Int): Double =
    0.7213 / (1.0 + 1.079 / m) * m * m * 1099511627776.0

  def hllEstimate(registers: DataFrame, groupCol: String,
      m: Int = 256): DataFrame = {
    require(m >= 128, s"alpha constant assumes m >= 128: $m")
    registers.groupBy(groupCol)
      .agg(count(lit(1)).as("n_buckets_set"),
        sum(expr("shiftleft(1L, CAST(40 - rho AS INT))")).as("_sumPresent"))
      .withColumn("_sumInt",
        (lit(m.toLong) - col("n_buckets_set")) * lit(1099511627776L) + col("_sumPresent"))
      .withColumn("est_distinct",
        expr(s"CAST('${hllScale(m)}' AS DOUBLE) / _sumInt"))
      .select(col(groupCol), col("n_buckets_set"), col("est_distinct"))
  }

  /** Log₂ histogram sketch over a non-negative BIGINT measure — the
    * third leg of the relational sketch suite (frequency → [[cmsCells]],
    * distinct → [[hllRegisters]], quantiles → this): (groupCol, bucket,
    * cnt) where bucket = bit-length of the value (0 stays bucket 0, so
    * bucket b ≥ 1 covers [2^(b−1), 2^b)). ≤ 64 cells per group however
    * many rows stream through, map-side combinable, merge = cellwise sum,
    * and the arithmetic (`length(bin(x))`) replays in any engine — no
    * sort, which is the whole point: exact percentiles of a 100 TB
    * column need a global sort or two passes; this is one pass with a
    * guaranteed ≤ 2× relative error (bucket width).
    */
  def logHistogram(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame =
    df.select(col(groupCol),
        expr(s"CASE WHEN $valueCol <= 0 THEN 0L " +
          s"ELSE CAST(length(bin($valueCol)) AS BIGINT) END").as("bucket"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Quantile estimates from a [[logHistogram]] cell table: for each q,
    * the type-1 rank r = max(1, ceil(q·n)) lands in a bucket by
    * cumulative count; the estimate interpolates linearly inside the
    * bucket's [2^(b−1), 2^b) span. The windows run over ≤ 64 rows per
    * group (the sketch, not the data); every input to the one double
    * expression is an exact integer, so results are bit-stable across
    * engines and partitionings. Output: (groupCol, q, est).
    */
  def logHistogramQuantiles(hist: DataFrame, groupCol: String,
      quantiles: Seq[Double]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(quantiles.nonEmpty && quantiles.forall(q => q > 0 && q <= 1))
    val w = Window.partitionBy(groupCol).orderBy("bucket")
    val cum = hist
      .withColumn("cum", sum("cnt").over(w))
      .withColumn("n", sum("cnt").over(Window.partitionBy(groupCol)))
      .withColumn("cum_before", col("cum") - col("cnt"))
    val qs = quantiles.map(q => s"CAST($q AS DOUBLE)").mkString(", ")
    cum
      .select(col(groupCol), col("bucket"), col("cnt"), col("cum"),
        col("cum_before"), col("n"), explode(expr(s"array($qs)")).as("q"))
      .withColumn("r", expr("greatest(1L, CAST(ceil(q * n) AS BIGINT))"))
      .filter(col("r") > col("cum_before") && col("r") <= col("cum"))
      .withColumn("est", expr(
        """CASE WHEN bucket = 0 THEN CAST(0 AS DOUBLE)
          |ELSE CAST(shiftleft(1L, CAST(bucket - 1 AS INT)) AS DOUBLE)
          |  + CAST(r - cum_before AS DOUBLE) / CAST(cnt AS DOUBLE)
          |    * CAST(shiftleft(1L, CAST(bucket - 1 AS INT)) AS DOUBLE)
          |END""".stripMargin))
      .select(col(groupCol), col("q"), col("est"))
  }

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

  /** Equi-join cardinality estimate from two Count–Min cell tables built
    * with the same (depth, width) over the two join keys: the CM inner
    * product (Cormode & Muthukrishnan 2005 §4.2) — per hash row d,
    * Σ_w cntA(d,w)·cntB(d,w); the estimate is the min over rows. Always
    * an OVERESTIMATE of |A ⋈ B| (colliding keys only add), within
    * εNₐN_b of exact with the standard CM probability. This is the
    * plan-time primitive: size a prospective 100 TB join from two
    * depth×width tables without touching either input again — the
    * sketches having been banked at ingest ([[cmsMerge]] keeps them
    * current). Output: one row, (est_join_size).
    */
  def cmsJoinSize(cellsA: DataFrame, cellsB: DataFrame): DataFrame =
    cellsA.toDF("d", "w", "cnt_a")
      .join(cellsB.toDF("d", "w", "cnt_b"), Seq("d", "w"))
      .groupBy("d")
      .agg(sum(col("cnt_a") * col("cnt_b")).as("ip"))
      .agg(min("ip").as("est_join_size"))

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
