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

  /** Benchmark decontamination — the n-gram collision check run over a
    * training corpus before a model sees it (the 13-gram overlap analysis
    * popularized by the GPT-3 appendix and successors): flag corpus
    * documents sharing ANY token n-gram with a benchmark/eval set.
    *
    * Grams are compared by md5 (engine-portable, and the join shuffles a
    * fixed 32-char key instead of an n-token string). The benchmark side
    * is reduced to DISTINCT grams and the join left un-hinted: real
    * benchmark suites are small enough that AQE broadcasts them, but
    * nothing forces driver-side materialization if the "benchmark" is
    * itself corpus-sized. Returns (keyCol, shared_ngrams) for contaminated
    * corpus documents only.
    */
  def contamination(corpus: DataFrame, benchmark: DataFrame, keyCol: String,
      textCol: String = "text", n: Int = 13): DataFrame = {
    require(n > 1, "n-gram size must be > 1")
    def grams(df: DataFrame) = TextAnalysis.withTokens(df, textCol)
      .filter(size(col("tokens")) >= n)
      .select(col(keyCol), explode(expr(
        s"""transform(sequence(1, size(tokens) - ${n - 1}),
           |  i -> md5(concat_ws(' ', slice(tokens, i, $n))))""".stripMargin)).as("gh"))
    grams(corpus)
      .join(grams(benchmark).select("gh").distinct(), Seq("gh"))
      .groupBy(keyCol).agg(countDistinct(col("gh")).as("shared_ngrams"))
  }

  /** Per-document n-gram novelty against a reference corpus — the
    * memorization-risk / freshness signal: what fraction of a candidate
    * document's distinct n-grams already exist ANYWHERE in the
    * reference. [[contamination]] answers "does this doc overlap a
    * benchmark" (absolute shared count, benchmark-sized right side);
    * novelty answers "how much NEW text does this doc add to the corpus
    * we already have" — the dedup-adjacent score used to rank crawl
    * batches before paying for training on them. Returns one row per
    * candidate doc with ≥ n tokens:
    * (keyCol, n_grams, seen_grams, novelty_micros) where novelty =
    * (n_grams − seen_grams)/n_grams in integer micros.
    *
    * Scale shape: same md5-gram projection as [[contamination]]; the
    * reference side is distinct'd to one row per gram and the join is a
    * LEFT SEMI-shaped aggregate (seen = inner-join count), so the
    * shuffle carries gram hashes, never text. At 100 TB the reference
    * gram set is the big side — the join shuffles both by gram hash,
    * no broadcast assumed.
    */
  def noveltyScore(candidates: DataFrame, reference: DataFrame,
      keyCol: String, textCol: String = "text", n: Int = 13): DataFrame = {
    require(n > 1, "n-gram size must be > 1")
    def grams(df: DataFrame) = TextAnalysis.withTokens(df, textCol)
      .filter(size(col("tokens")) >= n)
      .select(col(keyCol), explode(expr(
        s"""transform(sequence(1, size(tokens) - ${n - 1}),
           |  i -> md5(concat_ws(' ', slice(tokens, i, $n))))""".stripMargin)).as("gh"))
    val cand = grams(candidates).distinct()
    val seen = cand.join(grams(reference).select("gh").distinct(), Seq("gh"))
      .groupBy(keyCol).agg(count(lit(1)).as("seen_grams"))
    cand.groupBy(keyCol).agg(count(lit(1)).as("n_grams"))
      .join(seen, Seq(keyCol), "left")
      .na.fill(0L, Seq("seen_grams"))
      .withColumn("novelty_micros", expr(
        """CAST(floor((CAST(n_grams - seen_grams AS DOUBLE) / CAST(n_grams AS DOUBLE))
          |  * 1e6 + 0.5) AS BIGINT)""".stripMargin))
  }

  /** CCNet-style cross-document boilerplate detection at segment
    * granularity (cf. Wenzek et al., "CCNet", LREC 2020 — paragraph-level
    * dedup before any document-level pass). Documents are cut into
    * non-overlapping `segTokens`-token segments (the corpus here is
    * single-line, so fixed token windows stand in for lines/paragraphs);
    * a segment is boilerplate when its hash appears in more than
    * `maxDocFreq` DISTINCT documents — headers, footers, navigation
    * chrome, license blurbs.
    *
    * Returns one row per segment: tokenChunks' columns plus `doc_freq`
    * and `is_boilerplate`. Scale shape: the chunking is a pure
    * projection; `doc_freq` is one shuffle on the segment hash with a
    * partial countDistinct; the flag join re-shuffles both sides by the
    * hash — big×big, no broadcast assumed, rows = segment count not
    * pair count.
    */
  def boilerplateSegments(docs: DataFrame, keyCol: String,
      textCol: String = "text", segTokens: Int = 12,
      maxDocFreq: Long = 1L): DataFrame = {
    require(segTokens > 0, "segTokens must be positive")
    require(maxDocFreq >= 1, "maxDocFreq must be >= 1")
    val segs = TextAnalysis.tokenChunks(docs, keyCol, textCol,
      chunkSize = segTokens, stride = segTokens)
    val freq = segs.groupBy("chunk_hash")
      .agg(countDistinct(col(keyCol)).as("doc_freq"))
    segs.join(freq, Seq("chunk_hash"))
      .withColumn("is_boilerplate", col("doc_freq") > maxDocFreq)
  }

  /** Content-defined chunking (CDC — the rolling-boundary chunking of
    * LBFS/restic-style dedup storage, at token granularity): a chunk
    * boundary falls after token i when the hash of the trailing
    * `window`-token context is ≡ 0 mod `divisor`, plus a forced boundary
    * at the document end. Because boundaries depend only on LOCAL
    * content, inserting or deleting text early in a document shifts only
    * the chunks up to the first boundary past the edit — every later
    * chunk re-aligns and hashes identically, which is what makes CDC
    * chunks dedup-able across near-identical long documents where
    * fixed-stride chunks ([[TextAnalysis.tokenChunks]]) all shift.
    * Expected chunk length ≈ `divisor` tokens.
    *
    * The boundary scan, chunk assembly and hashing are ONE array
    * projection per document (filter + transform over the token array —
    * no window function, no explode until the final chunk rows), so the
    * operator is embarrassingly parallel at any corpus size. Output:
    * (keyCol, chunk_idx, start, n_tokens, chunk_hash).
    */
  def contentDefinedChunks(docs: DataFrame, keyCol: String,
      textCol: String = "text", window: Int = 4, divisor: Int = 8): DataFrame = {
    require(window > 0, "window must be positive")
    require(divisor > 1, "divisor must be > 1")
    TextAnalysis.withTokens(docs, textCol)
      .withColumn("_bounds", expr(
        s"""CASE WHEN size(tokens) <= $window THEN array(size(tokens))
           |ELSE concat(filter(sequence($window, size(tokens) - 1),
           |  i -> CAST(conv(substr(md5(concat_ws(' ', slice(tokens, i - ${window - 1}, $window))), 1, 8), 16, 10) AS BIGINT) % $divisor = 0),
           |  array(size(tokens))) END""".stripMargin))
      .select(col(keyCol), col("tokens"), posexplode(expr(
        """transform(_bounds, (e, k) -> named_struct(
          |  'start', CASE WHEN k = 0 THEN 1 ELSE element_at(_bounds, k) + 1 END,
          |  'end', e))""".stripMargin)).as(Seq("chunk_idx", "c")))
      .select(col(keyCol), col("chunk_idx"),
        col("c.start").as("start"),
        (col("c.end") - col("c.start") + 1).as("n_tokens"),
        expr("md5(concat_ws(' ', slice(tokens, c.start, c.end - c.start + 1)))")
          .as("chunk_hash"))
  }

  /** Exact duplicated-substring coverage (cf. Lee et al., "Deduplicating
    * Training Data Makes Language Models Better", ACL 2022 — their
    * ExactSubstr criterion at token granularity): a span is duplicated
    * when its `k`-token window occurs more than once ANYWHERE in the
    * corpus (another document or the same one), and a token is covered
    * when any duplicated span contains it. Returns one row per document
    * with ≥ k tokens: (keyCol, n_tokens, n_dup_spans, covered_tokens,
    * dup_micros = covered/n_tokens).
    *
    * Covered-token counting merges overlapping spans WITHOUT exploding
    * them: sorted duplicated starts p₁<p₂<…, each start contributes
    * min(k, next−p) tokens — the gaps-and-islands union computed by one
    * LEAD window, doc-partitioned (bounded by doc length, never corpus-
    * wide). Scale shape: stride-1 gram projection (explode factor =
    * tokens/doc, same as [[contamination]]), one shuffle counting gram
    * occurrences, big×big join back on the gram hash, then the per-doc
    * window.
    */
  def duplicatedSpanCoverage(docs: DataFrame, keyCol: String,
      textCol: String = "text", k: Int = 13): DataFrame = {
    require(k > 1, "span size must be > 1")
    val toks = TextAnalysis.withTokens(docs, textCol)
      .filter(size(col("tokens")) >= k)
      .select(col(keyCol), col("tokens"))
    val grams = toks.select(col(keyCol), posexplode(expr(
      s"""transform(sequence(1, size(tokens) - ${k - 1}),
         |  i -> md5(concat_ws(' ', slice(tokens, i, $k))))""".stripMargin))
        .as(Seq("pos0", "gh")))
      .select(col(keyCol), (col("pos0") + 1).as("pos"), col("gh"))
    val dup = grams.groupBy("gh").agg(count(lit(1)).as("_n"))
      .filter(col("_n") > 1).select("gh")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy("pos")
    val cov = grams.join(dup, Seq("gh"))
      .withColumn("_next", lead(col("pos"), 1).over(w))
      .withColumn("_c", when(col("_next").isNull, lit(k.toLong))
        .otherwise(least(lit(k.toLong), col("_next") - col("pos"))))
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n_dup_spans"), sum(col("_c")).as("covered_tokens"))
    toks.select(col(keyCol), size(col("tokens")).cast("long").as("n_tokens"))
      .join(cov, Seq(keyCol), "left")
      .na.fill(0L, Seq("n_dup_spans", "covered_tokens"))
      .withColumn("dup_micros", expr(
        """CAST(floor(CAST(covered_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE)
          |  * 1e6 + 0.5) AS BIGINT)""".stripMargin))
  }

  /** Per-document rollup of [[boilerplateSegments]]:
    * (keyCol, n_segs, n_boiler_segs, boiler_micros) where boiler =
    * n_boiler_segs / n_segs in integer micros. The score feeds the same
    * curation funnel as quality/language filters — docs that are mostly
    * shared chrome get dropped before training.
    */
  def boilerplateSummary(docs: DataFrame, keyCol: String,
      textCol: String = "text", segTokens: Int = 12,
      maxDocFreq: Long = 1L): DataFrame =
    boilerplateSegments(docs, keyCol, textCol, segTokens, maxDocFreq)
      .groupBy(keyCol).agg(
        count(lit(1)).as("n_segs"),
        sum(when(col("is_boilerplate"), 1L).otherwise(0L)).as("n_boiler_segs"))
      .withColumn("boiler_micros", expr(
        """CAST(floor((CAST(n_boiler_segs AS DOUBLE) / CAST(n_segs AS DOUBLE))
          |  * 1e6 + 0.5) AS BIGINT)""".stripMargin))

  /** Rebuild each document's text from its NON-boilerplate segments, in
    * original segment order — the cleaning counterpart of
    * [[boilerplateSegments]]. Docs whose every segment is boilerplate
    * disappear (nothing left to keep). The collect_list is doc-bounded
    * (segments of one document), not corpus-bounded.
    */
  def stripBoilerplate(docs: DataFrame, keyCol: String,
      textCol: String = "text", segTokens: Int = 12,
      maxDocFreq: Long = 1L): DataFrame =
    boilerplateSegments(docs, keyCol, textCol, segTokens, maxDocFreq)
      .filter(!col("is_boilerplate"))
      .groupBy(keyCol)
      .agg(collect_list(struct(col("chunk_idx"), col("chunk"))).as("_kept"))
      .withColumn(textCol, expr(
        "concat_ws(' ', transform(array_sort(_kept), x -> x.chunk))"))
      .drop("_kept")

  /** Sentence-level exact deduplication — the line-dedup pass CCNet and
    * RefinedWeb run over web crawls (Wenzek 2020 §3.1; Penedo 2023 §4.2):
    * a sentence seen anywhere before in the corpus is dropped, keeping
    * ONLY its first occurrence in (keyCol, position) order, so repeated
    * chrome ("click here to subscribe") vanishes while its first carrier
    * keeps one copy. Document-grain dedup cannot see this duplication
    * (the surrounding text differs); segment-grain boilerplate
    * ([[boilerplateSummary]]) uses fixed token windows — this is the
    * punctuation-grain exact pass between them.
    *
    * Sentences = `[.!?]+`-delimited spans, trimmed, empties dropped; the
    * identity key is md5 of the trimmed span. First occurrence per key is
    * a groupBy-min (map-side combinable — the reduce state per key is ONE
    * (doc, idx) pair no matter how many million copies stream through,
    * exactly where a window row_number over a hot boilerplate key would
    * funnel a single task), then one keyed join marks survivors. Kept
    * text is rebuilt in original sentence order (doc-bounded
    * collect_list).
    *
    * Output: (keyCol, n_sentences, n_kept, kept_text) — docs whose every
    * sentence was seen earlier keep n_kept = 0 and an empty kept_text.
    */
  def sentenceDedup(docs: DataFrame, keyCol: String,
      textCol: String = "text"): DataFrame = {
    val sent = docs
      .select(col(keyCol), posexplode(split(col(textCol), "[.!?]+"))
        .as(Seq("idx", "raw")))
      .withColumn("sentence", trim(col("raw")))
      .filter(col("sentence") =!= "")
      .select(col(keyCol), col("idx").cast("long").as("idx"),
        col("sentence"), md5(col("sentence")).as("h"))
    val firstOcc = sent
      .groupBy("h")
      .agg(min(struct(col(keyCol).as("_k"), col("idx").as("_i"))).as("_f"))
      .select(col("h"), col("_f._k").as("_k"), col("_f._i").as("_i"))
    val kept = sent.join(firstOcc, Seq("h"))
      .withColumn("_keep", col(keyCol) === col("_k") && col("idx") === col("_i"))
    kept.groupBy(keyCol)
      .agg(count(lit(1)).as("n_sentences"),
        sum(when(col("_keep"), 1L).otherwise(0L)).as("n_kept"),
        sort_array(collect_list(when(col("_keep"),
          struct(col("idx"), col("sentence"))))).as("_ks"))
      .withColumn("kept_text",
        expr("concat_ws('. ', transform(_ks, x -> x.sentence))"))
      .drop("_ks")
  }

  /** Preference-pair construction for DPO/RLHF-style training: within
    * each stratum (e.g. language × length bucket, so pairs compare like
    * with like), pair the i-th BEST-scored doc with the i-th WORST for
    * i ≤ n/quarterDiv — top-quartile chosen vs bottom-quartile rejected
    * by default — keeping only pairs with a strictly positive score
    * margin. Total orders everywhere: best rank (score DESC, key ASC),
    * worst rank (score ASC, key DESC), so ties cannot flip pair
    * membership across engines or runs. Windows are stratum-sized; the
    * pair join is keyed on (stratum, i). Output: (strata..., pair_rank,
    * chosen_id, rejected_id, margin).
    */
  def preferencePairs(df: DataFrame, keyCol: String, scoreCol: String,
      strataCols: Seq[String], quarterDiv: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(strataCols.nonEmpty && quarterDiv >= 2)
    val part = strataCols.map(col)
    val wBest = Window.partitionBy(part: _*)
      .orderBy(col(scoreCol).desc, col(keyCol))
    val wWorst = Window.partitionBy(part: _*)
      .orderBy(col(scoreCol).asc, col(keyCol).desc)
    val wN = Window.partitionBy(part: _*)
    val r = df
      .withColumn("_rb", row_number().over(wBest).cast("long"))
      .withColumn("_rw", row_number().over(wWorst).cast("long"))
      .withColumn("_n", count(lit(1)).over(wN))
    val best = r.select(part :+ col(keyCol).as("chosen_id") :+
      col(scoreCol).as("_cs") :+ col("_rb").as("pair_rank") :+ col("_n"): _*)
    val worst = r.select(part :+ col(keyCol).as("rejected_id") :+
      col(scoreCol).as("_ws") :+ col("_rw").as("pair_rank"): _*)
    best.join(worst, strataCols :+ "pair_rank")
      .filter(col("pair_rank") <= expr(s"_n div $quarterDiv") &&
        col("_cs") > col("_ws"))
      .select(part :+ col("pair_rank") :+ col("chosen_id") :+
        col("rejected_id") :+ (col("_cs") - col("_ws")).as("margin"): _*)
  }

  /** T5/UL2-style span corruption (Raffel et al. 2020 §3.1.4) — the
    * denoising-objective data prep step: mask ~15% of tokens in short
    * spans, replace each masked span in the INPUT with one sentinel, and
    * emit the TARGET as the sentinel-prefixed dropped spans. Fully
    * deterministic and engine-replayable, with NO sequential scan: a
    * position i is masked iff SOME span start s ∈ [i−span+1, i] fires
    * the salted hash gate (`md5(salt:key:s) % startMod == 0`) — overlap
    * merging falls out of the ∃ formulation instead of a running state,
    * and the sentinel id is the span's start POSITION (unique in-doc,
    * order-preserving), so no prefix count is ever needed. One array
    * projection per doc: no shuffle, no UDF, no window.
    *
    * With startMod=20 and span=3 the expected mask rate is ≈ 14% — the
    * T5 default neighborhood. Output: (keyCol, n_tokens, n_masked,
    * n_spans, inputs, targets).
    */
  def spanCorruption(docs: DataFrame, keyCol: String,
      textCol: String = "text", span: Int = 3, startMod: Int = 20,
      salt: String = "sc0"): DataFrame = {
    require(span >= 1 && startMod >= 2)
    val fire = (s: String) =>
      s"CAST(conv(substr(md5(concat('$salt:', CAST($keyCol AS STRING), ':', CAST($s AS STRING))), 1, 8), 16, 10) AS BIGINT) % $startMod = 0"
    TextAnalysis.withTokens(docs, textCol)
      .filter(size(col("tokens")) > 0)
      .withColumn("_mk", expr(
        s"""transform(sequence(1, size(tokens)),
           |  i -> exists(sequence(greatest(1, i - ${span - 1}), i), s -> ${fire("s")}))""".stripMargin))
      .withColumn("_st", expr(
        """transform(sequence(1, size(tokens)),
          |  i -> element_at(_mk, i) AND (i = 1 OR NOT element_at(_mk, i - 1)))""".stripMargin))
      .select(col(keyCol),
        size(col("tokens")).cast("long").as("n_tokens"),
        expr("CAST(size(filter(_mk, x -> x)) AS BIGINT)").as("n_masked"),
        expr("CAST(size(filter(_st, x -> x)) AS BIGINT)").as("n_spans"),
        expr(
          """concat_ws(' ', filter(transform(sequence(1, size(tokens)),
            |  i -> CASE WHEN NOT element_at(_mk, i) THEN element_at(tokens, i)
            |            WHEN element_at(_st, i) THEN concat('<extra_', CAST(i AS STRING), '>')
            |       END), x -> x IS NOT NULL))""".stripMargin).as("inputs"),
        expr(
          """concat_ws(' ', filter(transform(sequence(1, size(tokens)),
            |  i -> CASE WHEN element_at(_st, i)
            |         THEN concat('<extra_', CAST(i AS STRING), '> ', element_at(tokens, i))
            |       WHEN element_at(_mk, i) THEN element_at(tokens, i)
            |       END), x -> x IS NOT NULL))""".stripMargin).as("targets"))
  }

  /** Blocklist screening — the safety-filter stage every released corpus
    * runs (badword/domain lists à la the C4 cleanup): count, per doc, how
    * many token instances and how many DISTINCT blocked terms appear, and
    * gate on a distinct-hit threshold (single stray hits are usually
    * noise; multiple distinct terms are signal). Matching is exact
    * lowercased-token equality via a JOIN against the blocklist table —
    * scale-safe where a `rlike` alternation of ten thousand terms is not
    * (the regex NFA grows with the list; the join does not), and the
    * list-side build stays AQE's choice (broadcast while it measures
    * small, shuffle join when a mega-list doesn't). Docs with no hits
    * keep zero counts via the left join.
    *
    * Output: (keyCol, n_hits, n_distinct_terms, blocked).
    */
  def blocklistScreen(docs: DataFrame, terms: DataFrame, keyCol: String,
      textCol: String = "text", maxDistinctTerms: Long = 1L): DataFrame = {
    val toks = TextAnalysis.withTokens(docs, textCol)
      .select(col(keyCol), explode(col("tokens")).as("_tok"))
      .withColumn("_tok", lower(col("_tok")))
    val hits = toks
      .join(terms.select(lower(col(terms.columns.head)).as("_tok")).distinct(),
        Seq("_tok"))
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n_hits"),
        countDistinct(col("_tok")).as("n_distinct_terms"))
    docs.select(col(keyCol))
      .join(hits, Seq(keyCol), "left")
      .na.fill(0L, Seq("n_hits", "n_distinct_terms"))
      .withColumn("blocked", col("n_distinct_terms") > maxDistinctTerms)
  }

  /** Deterministic stratified sampling: exactly `quota` documents per
    * stratum, chosen by a portable hash order (md5 of the doc key) —
    * reproducible across runs, partitionings and engines, unlike
    * rand()-based sampling. The row_number filter compiles to
    * WindowGroupLimit, so only per-partition top-quota rows reach the
    * stratum shuffle — the same map-side pruning as q_topk_grp.
    */
  def stratifiedSample(docs: DataFrame, strataCol: String, quota: Int,
      keyCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(quota > 0, "quota must be positive")
    docs.withColumn("_rk", md5(col(keyCol).cast("string").cast("binary")))
      .withColumn("_rn", row_number().over(
        Window.partitionBy(strataCol).orderBy(col("_rk"), col(keyCol))))
      .filter(col("_rn") <= quota)
      .drop("_rk", "_rn")
  }

  /** Deterministic weighted mixture sampling ("data mixture" balancing —
    * e.g. downsample the dominant language): per-stratum keep-rates applied
    * as a hash threshold on the doc key. The scale-safe alternative to
    * rand() sampling: bit-reproducible across retries and partitionings,
    * pure projection + filter (no shuffle, no join), and any engine can
    * replay the decision. The first 8 md5 hex chars of (salt ++ key) are
    * compared against floor(rate·2^32) as zero-padded lowercase hex —
    * equal-length hex compares lexicographically exactly like the number it
    * encodes. Documents in strata without a declared rate are dropped.
    */
  def mixtureSample(docs: DataFrame, strataCol: String, rates: Map[String, Double],
      keyCol: String = "doc_id", salt: String = "mix"): DataFrame = {
    val thrCol = rates.toSeq.sortBy(_._1).foldLeft(lit(null).cast("string")) {
      case (acc, (k, r)) => when(col(strataCol) === lit(k), lit(thresholdHex(r))).otherwise(acc)
    }
    docs
      .withColumn("_u", substring(
        md5(concat(lit(salt), col(keyCol).cast("string")).cast("binary")), 1, 8))
      .filter(col("_u") < thrCol)
      .drop("_u")
  }

  /** floor(rate·2^32) as 8-char lowercase hex; rate 1.0 maps to "g", which
    * sorts above every hex digit — keep-everything without a 33-bit edge.
    */
  private[text] def thresholdHex(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1]: $rate")
    if (rate >= 1.0) "g" else f"${(rate * 4294967296.0).toLong}%08x"
  }

  /** Temperature-based mixture rebalancing (the multilingual sampling
    * scheme of XLM-R / mT5: stratum sampled ∝ n^α, α = 1/T < 1, which
    * up-weights low-resource strata). Realized as per-document keep
    * rates derived IN-QUERY from the stratum counts — unlike
    * [[mixtureSample]] no rates are supplied: rate_s =
    * (n_ref / n_s)^(1−α) with n_ref the smallest stratum, so the
    * smallest stratum keeps everything and larger strata are
    * downsampled toward balance. The keep decision is the same salted
    * md5-threshold as [[mixtureSample]], compared numerically
    * (hash32 < floor(rate·2^32)).
    *
    * α = 0.5 computes the rate via `sqrt` — an IEEE correctly-rounded
    * single operation, bit-reproducible across engines; other α use
    * `power` (exp·ln), which libm implementations may round differently
    * in the last ulp.
    *
    * Scale shape: the rates table is one groupBy over the stratum column
    * (#strata rows — model-sized) cross-joined with its lazy 1-row min
    * and broadcast back onto the corpus; the filter itself is a pure
    * projection.
    */
  def temperatureMixture(docs: DataFrame, strataCol: String,
      alpha: Double = 0.5, keyCol: String = "doc_id",
      salt: String = "temp"): DataFrame = {
    docs.join(temperatureRates(docs, strataCol, alpha), Seq(strataCol))
      .filter(expr(
        s"""CAST(conv(substr(md5(concat('$salt', CAST($keyCol AS STRING))), 1, 8), 16, 10) AS BIGINT)
           |  < CAST(floor(_rate * 4294967296.0) AS BIGINT)""".stripMargin))
      .select(docs.columns.map(col).toIndexedSeq: _*)
  }

  /** Per-stratum audit of [[temperatureMixture]]:
    * (strataCol, n_total, n_kept, rate_micros). */
  def temperatureMixtureSummary(docs: DataFrame, strataCol: String,
      alpha: Double = 0.5, keyCol: String = "doc_id",
      salt: String = "temp"): DataFrame = {
    val rates = temperatureRates(docs, strataCol, alpha)
    val kept = temperatureMixture(docs, strataCol, alpha, keyCol, salt)
      .groupBy(strataCol).agg(count(lit(1)).as("n_kept"))
    docs.groupBy(strataCol).agg(count(lit(1)).as("n_total"))
      .join(rates, Seq(strataCol))
      .join(kept, Seq(strataCol), "left")
      .na.fill(0L, Seq("n_kept"))
      .withColumn("rate_micros",
        expr("CAST(floor(_rate * 1e6 + 0.5) AS BIGINT)"))
      .select(strataCol, "n_total", "n_kept", "rate_micros")
  }

  /** (strataCol, _rate): the temperature keep-rate per stratum. */
  private def temperatureRates(docs: DataFrame, strataCol: String,
      alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1]: $alpha")
    val counts = docs.groupBy(strataCol).agg(count(lit(1)).as("_n_s"))
    val ref = counts.agg(min(col("_n_s")).as("_n_ref"))
    val rate =
      if (alpha == 0.5) "sqrt(CAST(_n_ref AS DOUBLE) / CAST(_n_s AS DOUBLE))"
      else s"power(CAST(_n_ref AS DOUBLE) / CAST(_n_s AS DOUBLE), ${1.0 - alpha})"
    counts.crossJoin(ref).withColumn("_rate", expr(rate))
      .select(col(strataCol), col("_rate"))
  }

  /** Global token offsets for concat-then-chunk packing: each document,
    * taken in `orderCol` order, occupies the half-open token span
    * [start, end) of the concatenated corpus stream, where its width is
    * `weightCol + sepTokens` (the separator/EOS a tokenizer appends after
    * each document).
    *
    * The running sum is NOT a global `sum().over(Window.orderBy(...))` —
    * an unpartitioned window serializes the whole corpus through one task.
    * Instead: a distributed range-sort, a per-partition subtotal pass
    * (numPartitions values collected — bounded by cluster size, not data),
    * and a second pass adding each partition's driver-computed prefix
    * offset. Both passes run over the SAME materialized sort lineage (one
    * shuffle instance, map outputs reused), so spans are globally
    * consecutive and deterministic — the same mechanism as
    * [[graft.operators.SurrogateKeys.scalableKeys]].
    */
  def tokenSpans(docs: DataFrame, weightCol: String, orderCol: String = "doc_id",
      sepTokens: Int = 1): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    require(sepTokens >= 0, "sepTokens must be non-negative")
    val sorted = docs
      .select(col(orderCol).cast("long"),
        (col(weightCol).cast("long") + lit(sepTokens.toLong)).as("_w"))
      .orderBy(col(orderCol))
    val rdd = sorted.rdd.map(r => (r.getLong(0), r.getLong(1)))
    val perPart = rdd.mapPartitionsWithIndex(
        (i, it) => Iterator.single((i, it.foldLeft(0L)(_ + _._2))),
        preservesPartitioning = true)
      .collect().sortBy(_._1).map(_._2)
    val offsets = perPart.scanLeft(0L)(_ + _)
    val rows = rdd.mapPartitionsWithIndex { (i, it) =>
      var acc = offsets(i)
      it.map { case (k, w) => val st = acc; acc += w; Row(k, st, st + w) }
    }
    docs.sparkSession.createDataFrame(rows, StructType(Seq(
      StructField(orderCol, LongType, nullable = false),
      StructField("start", LongType, nullable = false),
      StructField("end", LongType, nullable = false))))
  }

  /** Sequence packing for LLM training (concat-then-chunk): the corpus
    * token stream from [[tokenSpans]] is cut into fixed `capacity`-token
    * training sequences; documents straddle sequence boundaries (the
    * standard GPT-style packing — no padding, no document loss). Returns
    * one row per sequence: (seq_id, n_docs touching it, n_tokens filled —
    * `capacity` everywhere except possibly the last sequence).
    *
    * Scale shape: one range-sort for the spans, then a pure
    * Project+Generate (each doc explodes into the 1..⌈w/capacity⌉+1
    * sequences it touches) and one aggregation on seq_id.
    */
  def packSequences(docs: DataFrame, capacity: Long, weightCol: String,
      orderCol: String = "doc_id", sepTokens: Int = 1): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    tokenSpans(docs, weightCol, orderCol, sepTokens)
      // zero-width spans (weight 0 with sepTokens = 0) contribute no
      // tokens; unfiltered, one whose start falls exactly on a capacity
      // boundary makes the sequence() below DESCEND (start > stop) and
      // emit phantom seq_ids, and any other zero-width doc inflates
      // n_docs with a 0-token row.
      .filter(col("end") > col("start"))
      .withColumn("seq_id", explode(expr(
        s"sequence(CAST(floor(start / $capacity) AS BIGINT), CAST(floor((`end` - 1) / $capacity) AS BIGINT))")))
      .withColumn("_toks",
        least(col("end"), (col("seq_id") + 1) * capacity)
          - greatest(col("start"), col("seq_id") * capacity))
      .groupBy("seq_id")
      .agg(count(lit(1)).as("n_docs"), sum(col("_toks")).as("n_tokens"))
  }

  /** The per-document packing map [[packSequences]] summarizes: one row
    * per (document × sequence it touches) with the token slice each side
    * contributes — exactly what a training-data writer needs to emit
    * packed sequences: `doc_offset` is where to start reading inside the
    * document's own token stream (0 unless the doc straddled INTO this
    * sequence), `seq_offset` is where the slice lands inside the
    * `capacity`-token sequence, `slice_len` is how many tokens to copy.
    * Pure Project+Generate over [[tokenSpans]] — no aggregation at all.
    */
  def packAssignments(docs: DataFrame, capacity: Long, weightCol: String,
      orderCol: String = "doc_id", sepTokens: Int = 1): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    tokenSpans(docs, weightCol, orderCol, sepTokens)
      // see packSequences: zero-width spans would emit phantom/empty slices
      .filter(col("end") > col("start"))
      .withColumn("seq_id", explode(expr(
        s"sequence(CAST(floor(start / $capacity) AS BIGINT), CAST(floor((`end` - 1) / $capacity) AS BIGINT))")))
      .withColumn("_from", greatest(col("start"), col("seq_id") * capacity))
      .withColumn("_to", least(col("end"), (col("seq_id") + 1) * capacity))
      .select(col(orderCol), col("seq_id"),
        (col("_from") - col("start")).as("doc_offset"),
        (col("_from") - col("seq_id") * capacity).as("seq_offset"),
        (col("_to") - col("_from")).as("slice_len"))
  }

  /** Length-bucketed batch grouping for inference/embedding serving:
    * documents padded to their bucket's ceiling rather than the global
    * max, so grouping by power-of-two token-length buckets bounds padding
    * waste at <50% (vs unbounded for one global batch) while keeping the
    * bucket count logarithmic. Returns per-bucket rows with the padding
    * accounting a batch scheduler needs: doc count, real tokens, padded
    * slots at the bucket ceiling, and the waste ratio. Pure projection +
    * one bounded-key aggregation.
    */
  def lengthBuckets(docs: DataFrame, weightCol: String,
      maxCeil: Long = 8192): DataFrame = {
    require(maxCeil >= 2, "maxCeil must be >= 2")
    docs
      .withColumn("_w", least(greatest(col(weightCol).cast("long"), lit(1L)), lit(maxCeil)))
      // smallest power of two >= w WITHOUT log2/ceil on doubles: a 1-ulp
      // log2 error at an exact power of two would flip the bucket, and
      // engines disagree in exactly that ulp. length(bin(w-1)) is
      // ceil(log2(w)) in pure integer/string ops, identical everywhere.
      .withColumn("bucket_ceil", expr(
        "CASE WHEN _w <= 1 THEN 1 ELSE CAST(power(2, length(bin(_w - 1))) AS BIGINT) END"))
      .groupBy("bucket_ceil")
      .agg(count(lit(1)).as("n_docs"), sum(col("_w")).as("n_tokens"))
      .withColumn("n_padded", col("bucket_ceil") * col("n_docs"))
      .withColumn("waste_ratio",
        (col("n_padded") - col("n_tokens")).cast("double") / col("n_padded"))
  }

  /** Deterministic corpus shuffle-and-shard for reproducible training
    * epochs: each document is assigned a shard by a salted portable hash
    * (change the salt to get an independent epoch ordering) and a position
    * within its shard by hash order. Bit-reproducible across runs,
    * partitionings and engines — unlike `repartition(n)` + `rand()`, whose
    * assignment changes with the physical partitioning.
    *
    * The shard index is the first two md5 hex digits (256 unbiased
    * buckets) mod `nShards`; `nShards` must divide 256 so every shard
    * gets an equal slice of hash space. Scale shape: the hash + shard is a
    * pure projection; the position is a window partitioned by shard —
    * parallel across shards, and each shard's sort is exactly the write
    * order a training job wants its shard files in.
    */
  def shuffleShards(docs: DataFrame, nShards: Int, keyCol: String = "doc_id",
      salt: String = "epoch0"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nShards > 0 && 256 % nShards == 0,
      s"nShards must divide 256 for unbiased hex-bucket assignment: $nShards")
    docs
      .withColumn("_h", md5(concat(lit(salt), col(keyCol).cast("string")).cast("binary")))
      .withColumn("shard", expr(
        """CAST((instr('0123456789abcdef', substr(_h, 1, 1)) - 1) * 16
          | + instr('0123456789abcdef', substr(_h, 2, 1)) - 1 AS BIGINT)""".stripMargin)
        % nShards)
      .withColumn("pos", row_number().over(
        Window.partitionBy("shard").orderBy(col("_h"), col(keyCol))).cast("long"))
      .drop("_h")
  }

  /** Weighted sampling WITHOUT replacement, k per stratum — the
    * Efraimidis–Spirakis reservoir realized as per-group Gumbel-top-k:
    * a document with weight w gets key ln(w) + Gumbel(u), and the top-k
    * keys per stratum are EXACTLY a weight-proportional draw without
    * replacement (the A-ES equivalence). The curation use: "keep the 10k
    * quality-weighted documents per language" with heavier documents
    * favored but light ones still reachable — unlike a deterministic
    * top-k by weight, which starves the tail.
    *
    * u comes from a salted md5 of the key — the [[graft.text.ImportanceSampling.gumbelTopK]]
    * determinism contract (reproducible across runs, partitionings and
    * engines; change the salt for an independent draw); both ln terms
    * are floored to integer micros so the per-row key is exact and
    * engine-portable. Rows with weight ≤ 0 (or null) cannot carry
    * probability mass and are excluded, matching A-ES.
    *
    * Shape: one projection + one per-stratum WindowGroupLimit (map-side
    * partial top-k per group) — a single shuffle on the stratum key; no
    * global sort.
    */
  def weightedStratumSample(docs: DataFrame, stratumCol: String, k: Int,
      weightCol: String, salt: String = "ws0",
      keyCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, "k must be positive")
    docs
      .filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("_u",
        (conv(substring(md5(concat(lit(salt), col(keyCol).cast("string")).cast("binary")),
          1, 4), 16, 10).cast("long") + lit(0.5)) / lit(65536.0))
      .withColumn("score_micros",
        expr(s"CAST(floor(ln(CAST($weightCol AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)")
          + expr("CAST(floor(-ln(-ln(_u)) * 1e6 + 0.5) AS BIGINT)"))
      .withColumn("smp_rank", row_number().over(
        Window.partitionBy(stratumCol)
          .orderBy(col("score_micros").desc, col(keyCol))).cast("long"))
      .filter(col("smp_rank") <= k)
      .select(col(stratumCol), col(keyCol), col(weightCol),
        col("score_micros"), col("smp_rank"))
  }

  /** Gopher-style composite quality rules (Rae et al. 2021, "Scaling
    * Language Models: ... Gopher", §A1.1 filtering heuristics — the
    * standard pre-training quality gate, adapted to what is computable
    * bit-exactly on two engines): per document,
    *
    *  - r_wordcount: token count in [minTokens, maxTokens]
    *  - r_mean_len:  mean token length in [3, 10] characters
    *  - r_alpha:     ≥ 80% of token occurrences contain a letter
    *  - r_repetition: most frequent token ≤ 20% of all tokens
    *  - keep = all rules pass
    *
    * All ratios are integer micros from exact long division (operands
    * non-negative, so div ≡ floor on both engines) — thresholds compare
    * bit-exactly, no IEEE boundary anywhere.
    *
    * Scale shape: two keyed shuffles — (doc, token) term frequencies,
    * then the per-doc rollup (max tf gives the top-token share without
    * materializing per-doc vocabularies). No windows, no corpus-wide
    * broadcast.
    *
    * Output: (keyCol, n_tokens, mean_len_micros, alpha_micros,
    * top_share_micros, r_wordcount, r_mean_len, r_alpha, r_repetition,
    * keep).
    */
  /** Per-domain frequency cap — the Common-Crawl curation step that stops
    * a handful of mega-domains from dominating a pretraining mix: keep at
    * most `cap` documents per domain, preferring high `qualityCol` (ties
    * broken on `keyCol`). Returns the kept rows as (keyCol, domainCol,
    * quota_rank ∈ 1..cap).
    *
    * Scale shape: a single `row_number().over(partitionBy(domain))` puts
    * an entire mega-domain in ONE task — the exact skew this operator
    * exists to fight. Instead, phase 1 ranks within (domain, salt) —
    * `preSalt` shards per domain — and keeps ≤ cap per shard, shrinking
    * every domain to ≤ preSalt·cap rows regardless of its raw size;
    * phase 2 ranks those survivors exactly. Correct because the global
    * per-domain top-cap is contained in the union of per-shard top-caps
    * (any row beaten by ≥ cap rows in its own shard is beaten by ≥ cap
    * rows in the domain). Two shuffles, both bounded.
    */
  def domainQuota(docs: DataFrame, domainCol: String, cap: Int,
      qualityCol: String, keyCol: String = "doc_id", preSalt: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(cap > 0, s"cap must be positive: $cap")
    require(preSalt > 0, s"preSalt must be positive: $preSalt")
    val ord = Seq(col(qualityCol).desc, col(keyCol).asc)
    val pre = docs.select(col(keyCol), col(domainCol), col(qualityCol))
      .withColumn("_salt", pmod(hash(col(keyCol)), lit(preSalt)))
      .withColumn("_pr", row_number().over(
        Window.partitionBy(col(domainCol), col("_salt")).orderBy(ord: _*)))
      .filter(col("_pr") <= cap)
    pre.withColumn("quota_rank", row_number().over(
        Window.partitionBy(col(domainCol)).orderBy(ord: _*)).cast("long"))
      .filter(col("quota_rank") <= cap)
      .select(col(keyCol), col(domainCol), col("quota_rank"))
  }

  def gopherQualityRules(docs: DataFrame, keyCol: String,
      textCol: String = "text", minTokens: Long = 50L,
      maxTokens: Long = 100000L): DataFrame = {
    require(minTokens >= 0 && maxTokens >= minTokens,
      s"bad token bounds: [$minTokens, $maxTokens]")
    TextAnalysis.withTokens(docs, textCol)
      .select(col(keyCol), explode(col("tokens")).as("token"))
      .groupBy(col(keyCol), col("token"))
      .agg(count(lit(1)).as("tf"))
      .groupBy(keyCol)
      .agg(
        sum(col("tf")).as("n_tokens"),
        max(col("tf")).as("top_cnt"),
        sum(expr("tf * length(token)")).as("n_chars"),
        sum(expr("CASE WHEN token RLIKE '[A-Za-z]' THEN tf ELSE 0 END"))
          .as("n_alpha"))
      .withColumn("mean_len_micros", expr("n_chars * 1000000L div n_tokens"))
      .withColumn("alpha_micros", expr("n_alpha * 1000000L div n_tokens"))
      .withColumn("top_share_micros", expr("top_cnt * 1000000L div n_tokens"))
      .withColumn("r_wordcount",
        col("n_tokens").between(minTokens, maxTokens))
      .withColumn("r_mean_len",
        col("mean_len_micros").between(3000000L, 10000000L))
      .withColumn("r_alpha", col("alpha_micros") >= 800000L)
      .withColumn("r_repetition", col("top_share_micros") <= 200000L)
      .withColumn("keep", col("r_wordcount") && col("r_mean_len") &&
        col("r_alpha") && col("r_repetition"))
      .select(keyCol, "n_tokens", "mean_len_micros", "alpha_micros",
        "top_share_micros", "r_wordcount", "r_mean_len", "r_alpha",
        "r_repetition", "keep")
  }

  /** Deterministic negative sampling for contrastive training data: for
    * each anchor document, k pseudo-random negatives drawn from the
    * corpus EXCLUDING the anchor itself and its near-duplicates (a
    * near-dup sampled as a "negative" is a false negative that poisons a
    * contrastive objective — the reason the near-dup pair graph feeds
    * this step). Selection is a salted-md5 rank per (anchor, candidate),
    * so the sample is reproducible across engines, partitionings and
    * runs, and changes wholesale with the salt (the q_dsir/q_wsample
    * determinism contract).
    *
    * Scale shape: anchors are a bounded query set (broadcast) crossed
    * with the corpus — |anchors|·N rows, linear in the corpus like any
    * per-anchor scoring pass; the near-dup exclusion is one anti-join on
    * the pair graph; per-anchor top-k compiles to WindowGroupLimit (map-
    * side k-cut, no global sort).
    *
    * Output: (anchor_id, neg_id, smp_rank), smp_rank 1..k.
    */
  def negativeSamples(docs: DataFrame, pairs: DataFrame, anchors: DataFrame,
      keyCol: String, k: Int, salt: String = "ns0"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, "k must be >= 1")
    val cands = broadcast(anchors.select(col(keyCol).as("anchor_id")))
      .crossJoin(docs.select(col(keyCol).as("neg_id")))
      .filter(col("anchor_id") =!= col("neg_id"))
    val excl = pairs.select(col("doc_a").as("anchor_id"), col("doc_b").as("neg_id"))
      .unionByName(pairs.select(col("doc_b").as("anchor_id"), col("doc_a").as("neg_id")))
    cands.join(excl, Seq("anchor_id", "neg_id"), "left_anti")
      .withColumn("_h", expr(
        s"CAST(conv(substr(md5(concat('$salt', CAST(anchor_id AS STRING), ':', " +
          "CAST(neg_id AS STRING))), 1, 8), 16, 10) AS BIGINT)"))
      .withColumn("smp_rank", row_number().over(
        Window.partitionBy("anchor_id").orderBy(col("_h"), col("neg_id"))).cast("long"))
      .filter(col("smp_rank") <= k)
      .select("anchor_id", "neg_id", "smp_rank")
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
