package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data selection via importance resampling (DSIR, Xie et al. 2023) —
  * select corpus documents whose hashed-n-gram distribution looks like a
  * target domain — plus the unigram-LM negative-log-likelihood quality
  * signal (the CCNet-style "perplexity filter", here with the corpus's own
  * unigram distribution as the LM).
  *
  * Engine-portability design: every per-document score is a SUM OF 64-BIT
  * INTEGERS ("micros" — log-ratios rounded to 1e-6 at the per-BUCKET level),
  * so document scores are exact and partition-order independent, and any
  * engine replays them bit-for-bit. The only floating-point steps are
  * per-bucket (one ln over correctly-rounded double divisions, then
  * `floor(x*1e6 + 0.5)` — floor, not round(): Spark's round() on doubles
  * goes through shortest-repr BigDecimal and can tie-break differently from
  * an exact-binary engine). A 1-ulp ln() discrepancy across libm
  * implementations flips a floor only inside a ~1e-10-wide boundary zone
  * per bucket — negligible, and confined to one bucket's ±1 micro.
  *
  * Scale shape: bucket distributions are one explode + one bounded-key
  * groupBy (≤ `nBuckets` rows — the point of feature hashing); per-doc
  * weights are one join against that bounded table (AQE broadcasts it) +
  * one integer-sum groupBy; resampling is a global top-k
  * (TakeOrderedAndProject — map-side partial top-k, no full sort).
  */
object ImportanceSampling {

  /** One row per token: (keyCol, bucket). The bucket is the first 3 hex
    * chars of md5(token) — 4096 hashed unigram features, portable to any
    * engine with md5. (DSIR hashes n-grams; unigrams are the n=1 instance —
    * callers wanting bigrams can pre-join tokens into a text column.)
    */
  def tokenBuckets(docs: DataFrame, keyCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    TextAnalysis.withTokens(docs, textCol)
      .select(col(keyCol), explode(col("tokens")).as("tok"))
      .select(col(keyCol), substring(md5(col("tok").cast("binary")), 1, 3).as("bucket"))

  /** Per-bucket importance log-ratio in micros:
    * floor(ln(p̂_b / q̂_b)·1e6 + 0.5) with add-one smoothing over `nBuckets`
    * possible buckets (p̂ = target, q̂ = source). Buckets unseen on one side
    * get the smoothed floor probability — the full outer join keeps them.
    * Output is ≤ nBuckets rows: (bucket, lr_micros).
    */
  def logRatioMicros(target: DataFrame, source: DataFrame,
      keyCol: String = "doc_id", textCol: String = "text",
      nBuckets: Int = 4096): DataFrame = {
    val t = tokenBuckets(target, keyCol, textCol)
      .groupBy("bucket").agg(count(lit(1)).as("tc"))
    val s = tokenBuckets(source, keyCol, textCol)
      .groupBy("bucket").agg(count(lit(1)).as("sc"))
    // 1-row totals, lazily broadcast (the A8 no-collect scalar pattern)
    val tt = t.agg(sum(col("tc")).as("tt"))
    val st = s.agg(sum(col("sc")).as("st"))
    t.join(s, Seq("bucket"), "full")
      .na.fill(0L, Seq("tc", "sc"))
      .crossJoin(broadcast(tt)).crossJoin(broadcast(st))
      .withColumn("lr_micros", expr(
        s"""CAST(floor(ln(((tc + 1.0) / (tt + CAST($nBuckets AS DOUBLE)))
           |  / ((sc + 1.0) / (st + CAST($nBuckets AS DOUBLE)))) * 1e6 + 0.5) AS BIGINT)""".stripMargin))
      .select("bucket", "lr_micros")
  }

  /** Per-document importance weight: Σ over the doc's TOKENS of the
    * token-bucket's lr_micros (the c_b weighting is implicit in the token
    * multiplicity). Pure integer sum — exact, order-independent. Documents
    * must come from the population whose buckets `ratios` covers (scoring
    * the source corpus against target/source ratios always does).
    */
  def importanceWeightsMicros(docs: DataFrame, ratios: DataFrame,
      keyCol: String = "doc_id", textCol: String = "text"): DataFrame =
    tokenBuckets(docs, keyCol, textCol)
      .join(ratios, Seq("bucket"))
      .groupBy(keyCol).agg(sum(col("lr_micros")).as("logw_micros"))

  /** Deterministic Gumbel-top-k resampling: score = logw_micros + Gumbel
    * noise derived from a salted md5 of the key (first 4 hex digits →
    * u ∈ (0,1) at 1/65536 granularity → −ln(−ln(u)) in micros). Exactly
    * the importance-resample DSIR prescribes, but hash-seeded so the
    * sample is reproducible across runs, partitionings, and engines —
    * change the salt for an independent draw. orderBy+limit compiles to
    * TakeOrderedAndProject (map-side partial top-k; only k rows per
    * partition reach the driver-side merge).
    */
  def gumbelTopK(weighted: DataFrame, k: Int, salt: String,
      keyCol: String = "doc_id", weightCol: String = "logw_micros"): DataFrame = {
    require(k > 0, "k must be positive")
    weighted
      .withColumn("_u",
        (conv(substring(md5(concat(lit(salt), col(keyCol).cast("string")).cast("binary")),
          1, 4), 16, 10).cast("long") + lit(0.5)) / lit(65536.0))
      .withColumn("score_micros",
        col(weightCol) + expr("CAST(floor(-ln(-ln(_u)) * 1e6 + 0.5) AS BIGINT)"))
      .orderBy(col("score_micros").desc, col(keyCol))
      .limit(k)
      .select(col(keyCol), col(weightCol), col("score_micros"))
  }

  /** Unigram-LM negative log-likelihood per document — the classic
    * LM-perplexity quality signal (CCNet and successors), with the corpus's
    * own hashed-unigram distribution as the model: rare-token-heavy
    * (high-NLL) documents are gibberish candidates, low-NLL ones are
    * boilerplate candidates. Per-token cost floor(−ln(c_b/T)·1e6 + 0.5) is
    * integer micros (same portability contract as [[logRatioMicros]]);
    * `mean_nll` is the only double column, derived from the exact integer
    * sum by two correctly-rounded divisions.
    */
  def unigramNll(docs: DataFrame, keyCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    // cached: the token table feeds the bucket counts AND the per-doc
    // join below — lazily each consumer re-ran the tokenize+md5 explode
    val b = tokenBuckets(docs, keyCol, textCol).cache()
    val cnt = b.groupBy("bucket").agg(count(lit(1)).as("cb"))
    val tot = cnt.agg(sum(col("cb")).as("tt"))
    b.join(cnt, Seq("bucket"))
      .crossJoin(broadcast(tot))
      .withColumn("nll_micros", expr(
        "CAST(floor(-ln(cb / CAST(tt AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)"))
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n_tokens"), sum(col("nll_micros")).as("nll_total_micros"))
      .withColumn("mean_nll",
        col("nll_total_micros").cast("double") / col("n_tokens") / lit(1e6))
  }

  /** CCNet-style perplexity tiering (Wenzek et al. 2020): every document
    * ranked by its unigram-LM mean NLL ([[unigramNll]]) and cut into the
    * head / middle / tail thirds CCNet feeds to downstream filtering —
    * head = most-fluent-under-the-LM (boilerplate-leaning), tail = least
    * fluent (gibberish-leaning). Returns the [[unigramNll]] columns plus
    * (ppl_rank, ppl_bucket).
    *
    * The global rank is NOT a `row_number().over(Window.orderBy(...))`
    * (which serializes the corpus through one task) — it is the two-pass
    * prefix-sum of [[graft.quality.Drift]] / `tokenSpans`: a distributed
    * range-sort on (mean_nll, key), one pass collecting numPartitions row
    * counts (bounded by cluster size), then a second pass over the SAME
    * sort lineage attaching offset-corrected ranks. mean_nll is derived
    * from exact integer micros by two correctly-rounded divisions, so the
    * sort key — and therefore the tiering — is engine-portable; ties
    * break on the key column.
    */
  def nllTiles(docs: DataFrame, keyCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}
    val sorted = unigramNll(docs, keyCol, textCol)
      .select(col(keyCol).cast("long"), col("n_tokens"),
        col("nll_total_micros"), col("mean_nll"))
      .orderBy(col("mean_nll"), col(keyCol))
    val rdd = sorted.rdd.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val perPart = rdd.mapPartitionsWithIndex(
        (i, it) => Iterator.single((i, it.size.toLong)),
        preservesPartitioning = true)
      .collect().sortBy(_._1).map(_._2)
    val offsets = perPart.scanLeft(0L)(_ + _)
    val n = offsets.last
    val rows = rdd.mapPartitionsWithIndex { (i, it) =>
      var rank = offsets(i)
      it.map { case (k, nt, tm, mean) =>
        rank += 1
        val bucket = if (rank * 3 <= n) "head"
          else if (rank * 3 <= 2 * n) "middle" else "tail"
        Row(k, nt, tm, mean, rank, bucket)
      }
    }
    docs.sparkSession.createDataFrame(rows, StructType(Seq(
      StructField(keyCol, LongType, nullable = false),
      StructField("n_tokens", LongType, nullable = false),
      StructField("nll_total_micros", LongType, nullable = false),
      StructField("mean_nll", DoubleType, nullable = false),
      StructField("ppl_rank", LongType, nullable = false),
      StructField("ppl_bucket", StringType, nullable = false))))
  }

  /** Interpolated bigram-LM negative log-likelihood per document — one
    * model order up from [[unigramNll]], toward the KenLM-style n-gram
    * filters of CCNet: each bigram position i ≥ 2 costs
    * −ln(λ·c₂(b_{i−1},b_i)/c₁(b_{i−1}) + (1−λ)·c₁(b_i)/T) over the
    * corpus's own hashed-bucket counts. Interpolation (not backoff)
    * keeps the formula a fixed expression tree both engines evaluate in
    * the same IEEE op order; with the corpus as its own model every
    * observed bigram has c₂ ≥ 1, so the argument is never 0. λ defaults
    * to 0.75 — exactly representable, as is 1−λ (the portability
    * contract; an arbitrary λ would round its literal differently from
    * its complement).
    *
    * Output (docs with ≥ 2 tokens): (keyCol, n_bigrams,
    * nll_total_micros, mean_nll) — integer micros summed exactly, the
    * mean derived by two correctly-rounded divisions.
    *
    * Scale shape: bigrams are an array projection (no self-join, no
    * window — `transform(sequence(2, n), ...)` pairs adjacent tokens
    * in-place); the model counts are two hash-keyed aggregates (4096
    * and ≤4096² rows — bounded by the bucket space, not the corpus), so
    * the three model joins broadcast; one shuffle for the per-doc sum.
    */
  def bigramNll(docs: DataFrame, keyCol: String = "doc_id",
      textCol: String = "text", lambdaMix: Double = 0.75): DataFrame = {
    require(lambdaMix > 0.0 && lambdaMix < 1.0, s"lambda must be in (0,1): $lambdaMix")
    // cached: feeds c1, tot and (via bg's shape) nothing else — one pass
    val uni = tokenBuckets(docs, keyCol, textCol).cache()
    val c1 = uni.groupBy("bucket").agg(count(lit(1)).as("cb"))
    val tot = uni.agg(count(lit(1)).as("tt"))
    val bg = TextAnalysis.withTokens(docs, textCol)
      .filter(size(col("tokens")) >= 2)
      .select(col(keyCol), explode(expr(
        """transform(sequence(2, size(tokens)),
          |  i -> struct(substr(md5(element_at(tokens, i - 1)), 1, 3) AS pb,
          |              substr(md5(element_at(tokens, i)), 1, 3) AS b))""".stripMargin)).as("g"))
      .select(col(keyCol), col("g.pb").as("pb"), col("g.b").as("b"))
      // cached: bg feeds the c2 aggregate and the scoring join — lazily the
      // tokenize + 2-md5-per-bigram explode ran once per consumer
      .cache()
    val c2 = bg.groupBy("pb", "b").agg(count(lit(1)).as("c2"))
    bg.join(c2, Seq("pb", "b"))
      .join(c1.select(col("bucket").as("pb"), col("cb").as("cp")), Seq("pb"))
      .join(c1.select(col("bucket").as("b"), col("cb")), Seq("b"))
      .crossJoin(broadcast(tot))
      .withColumn("nll_micros", expr(
        s"""CAST(floor(-ln($lambdaMix * (c2 / CAST(cp AS DOUBLE))
           |  + ${1.0 - lambdaMix} * (cb / CAST(tt AS DOUBLE))) * 1e6 + 0.5) AS BIGINT)""".stripMargin))
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n_bigrams"), sum(col("nll_micros")).as("nll_total_micros"))
      .withColumn("mean_nll",
        col("nll_total_micros").cast("double") / col("n_bigrams") / lit(1e6))
  }

  /** Interpolated Kneser–Ney bigram NLL — the smoothing KenLM actually
    * ships (Kneser & Ney 1995; Chen & Goodman 1998), one rung above the
    * naive interpolation of [[bigramNll]]: the unigram back-off weight is
    * the CONTINUATION probability (in how many distinct left-contexts does
    * this token appear?) rather than the raw frequency, so corpus-frequent
    * but context-bound tokens ("Francisco") stop inflating the back-off
    * mass. Per bigram position:
    *
    *   P(b|pb) = (c₂(pb,b) − D)/ctx(pb) + D·N₁₊(pb,·)/ctx(pb) · N₁₊(·,b)/T
    *
    * with D = 0.75 (exactly representable — the portability contract of
    * [[bigramNll]]), ctx(pb) = bigram occurrences with left bucket pb
    * (the exact normalizer: Σ_b P(b|pb) = 1), N₁₊ the distinct-neighbor
    * counts and T the total distinct bigram types. Corpus-as-own-model
    * means c₂ ≥ 1 > D, so the discounted term is always positive and the
    * max(·,0) clamp of the general formula is vacuous — omitted so both
    * engines evaluate the same fixed expression tree in the same IEEE
    * order. Costs are integer micros summed exactly.
    *
    * Output (docs with ≥ 2 tokens): (keyCol, n_bigrams, kn_nll_micros,
    * mean_nll).
    *
    * Scale shape: identical family to [[bigramNll]] — bigrams are an
    * in-place array projection (no self-join, no window); the four model
    * tables (c₂, ctx, N₁₊ left/right) are hash-keyed aggregates bounded by
    * the 4096-bucket space (≤4096² pair rows, ≤4096 unary rows — AQE
    * broadcasts them); the type total rides the 1-row broadcast idiom; one
    * shuffle for the per-doc integer sum.
    */
  def kneserNeyNll(docs: DataFrame, keyCol: String = "doc_id",
      textCol: String = "text", discount: Double = 0.75): DataFrame = {
    require(discount > 0.0 && discount < 1.0, s"discount must be in (0,1): $discount")
    val bg = TextAnalysis.withTokens(docs, textCol)
      .filter(size(col("tokens")) >= 2)
      .select(col(keyCol), explode(expr(
        """transform(sequence(2, size(tokens)),
          |  i -> struct(substr(md5(element_at(tokens, i - 1)), 1, 3) AS pb,
          |              substr(md5(element_at(tokens, i)), 1, 3) AS b))""".stripMargin)).as("g"))
      .select(col(keyCol), col("g.pb").as("pb"), col("g.b").as("b"))
      // cached: bg feeds c2, ctx AND the scoring join (n1l/n1r reuse c2's
      // exchange) — lazily the bigram explode ran once per consumer
      .cache()
    val c2 = bg.groupBy("pb", "b").agg(count(lit(1)).as("c2")).cache()
    val ctx = bg.groupBy("pb").agg(count(lit(1)).as("ctx"))
    val n1l = c2.groupBy("pb").agg(count(lit(1)).as("n1l"))
    val n1r = c2.groupBy("b").agg(count(lit(1)).as("n1r"))
    val ty = c2.agg(count(lit(1)).as("ty"))
    bg.join(c2, Seq("pb", "b"))
      .join(ctx, Seq("pb"))
      .join(n1l, Seq("pb"))
      .join(n1r, Seq("b"))
      .crossJoin(broadcast(ty))
      .withColumn("nll_micros", expr(
        s"""CAST(floor(-ln((CAST(c2 AS DOUBLE) - $discount) / CAST(ctx AS DOUBLE)
           |  + $discount * CAST(n1l AS DOUBLE) / CAST(ctx AS DOUBLE)
           |    * (CAST(n1r AS DOUBLE) / CAST(ty AS DOUBLE))) * 1e6 + 0.5) AS BIGINT)""".stripMargin))
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n_bigrams"), sum(col("nll_micros")).as("kn_nll_micros"))
      .withColumn("mean_nll",
        col("kn_nll_micros").cast("double") / col("n_bigrams") / lit(1e6))
  }

  /** DoReMi-inspired domain reweighting (Xie et al. 2023, single-step
    * excess-loss form): domains whose mean LM loss exceeds the corpus
    * reference get training-mixture weight proportional to that excess —
    * the "upweight what the model finds hard" signal that DoReMi's
    * exponentiated-gradient loop converges toward. This is the lite
    * (one-shot, proxy = the corpus's own unigram LM from [[unigramNll]])
    * variant: no iterative proxy training, no transcendental softmax —
    * every step is exact integer micros and replays on any engine.
    *
    *   nll_mean_d  = Σ_d nll div Σ_d tokens          (once-rounded)
    *   excess_d    = max(0, nll_mean_d − nll_mean_ref)
    *   raw_d       = excess_d·10⁶ div Σ excess       (uniform if Σ = 0)
    *   weight_d    = ((10⁶−ε)·raw_d + ε·(10⁶ div D)) div 10⁶
    *
    * with ε the standard uniform-smoothing floor (DoReMi's ε·u term) so
    * no domain starves to zero. Weights are floor-normalized micros
    * (Σ ≈ 10⁶ up to D floors — callers needing an exact simplex can
    * largest-remainder the residue; the training sampler only needs
    * ratios).
    *
    * Scale shape: the [[unigramNll]] token pass (explode + two keyed
    * map-side-combinable groupBys), one D-row domain aggregate, two
    * broadcast 1-row scalars. Domains with zero tokens never reach the
    * token table and carry no row — they have no loss to weigh.
    */
  def domainExcessWeights(docs: DataFrame, keyCol: String = "doc_id",
      textCol: String = "text", domainCol: String = "source",
      epsMicros: Long = 200000L): DataFrame = {
    require(epsMicros >= 0L && epsMicros <= 1000000L, "epsMicros in [0, 1e6]")
    val perDoc = unigramNll(docs, keyCol, textCol).drop("mean_nll")
    val dom = perDoc
      .join(docs.select(col(keyCol), col(domainCol).as("domain")), Seq(keyCol))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"),
        sum("nll_total_micros").as("_nll_sum"))
      .withColumn("nll_mean_micros", expr("_nll_sum div n_tokens"))
    val ref = dom.agg(sum("n_tokens").as("_rt"), sum("_nll_sum").as("_rs"))
      .select(expr("_rs div _rt").as("_ref_mean"))
    val withExcess = dom.crossJoin(broadcast(ref))
      .withColumn("excess_micros",
        greatest(lit(0L), col("nll_mean_micros") - col("_ref_mean")))
    val tot = withExcess.agg(sum("excess_micros").as("_te"),
      count(lit(1)).as("_nd"))
    withExcess.crossJoin(broadcast(tot))
      .withColumn("weight_micros", expr(
        s"""((1000000L - $epsMicros) * (CASE WHEN _te > 0
           |  THEN excess_micros * 1000000L div _te
           |  ELSE 1000000L div _nd END)
           | + $epsMicros * (1000000L div _nd)) div 1000000L""".stripMargin))
      .select("domain", "n_docs", "n_tokens", "nll_mean_micros",
        "excess_micros", "weight_micros")
  }
}
