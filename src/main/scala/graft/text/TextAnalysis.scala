package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: tokenization, text
  * quality statistics, stopword ratios, n-gram language ID, document
  * fingerprinting, and term frequencies / TF-IDF.
  *
  * Everything is built-in expressions (split / regexp / higher-order array
  * functions) — fully codegen'd, no UDFs — so the whole stats projection is
  * one WholeStageCodegen pass over the scan and survives a 100 TB corpus:
  * per-document work is O(doc length), no shuffle until an aggregation asks
  * for one.
  */
object TextAnalysis {

  /** Small English stopword list (deterministic, fixed order). */
  val EnStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "on", "for")

  private def sqlList(ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString(", ")

  /** Whitespace tokenization of the trimmed text. */
  def withTokens(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("tokens", split(trim(col(textCol)), "\\s+"))

  /** Per-document quality statistics (token count, average token length,
    * punctuation ratio, stopword ratio, a BPE-ish token estimate, and a
    * composite quality score). One projection, no aggregation.
    */
  def stats(df: DataFrame, textCol: String = "text"): DataFrame =
    withTokens(df, textCol)
      .withColumn("n_tokens", size(col("tokens")))
      .withColumn("chars_alpha", length(regexp_replace(col(textCol), "\\s", "")))
      .withColumn("avg_token_len",
        round(col("chars_alpha").cast("double") / col("n_tokens"), 6))
      .withColumn("punct_chars", length(regexp_replace(col(textCol), "[\\w\\s]", "")))
      .withColumn("punct_ratio",
        round(col("punct_chars").cast("double") / length(col(textCol)), 6))
      .withColumn("stopword_count",
        expr(s"size(filter(tokens, t -> t IN (${sqlList(EnStopwords)})))"))
      .withColumn("stopword_ratio",
        round(col("stopword_count").cast("double") / col("n_tokens"), 6))
      // BPE-ish estimate: word pieces + punctuation marks each count as one.
      .withColumn("token_estimate",
        size(expr(s"regexp_extract_all($textCol, '\\\\w+|[^\\\\w\\\\s]', 0)")))
      .withColumn("quality_score",
        (when(length(col(textCol)).between(100, 10000), 0.4).otherwise(0.0)
          + when(col("punct_ratio") < 0.1, 0.3).otherwise(0.0)
          + when(col("stopword_ratio").between(0.01, 0.5), 0.3).otherwise(0.0)))
      .drop("tokens")

  /** Marker stopwords per language for the n-gram(1) heuristic. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "es" -> Seq("el", "los", "las", "y", "como"),
    "fr" -> Seq("le", "les", "et", "une", "dans"),
    "zh" -> Seq("的", "了", "是", "在", "我")
  )

  /** Language ID by marker-word counts, argmax with a fixed preference order
    * (en > de > es > fr > zh) and 'und' when no marker hits. Deterministic by
    * construction — an oracle can replicate it exactly.
    */
  def langId(df: DataFrame, textCol: String = "text"): DataFrame = {
    val scored = LangMarkers.foldLeft(withTokens(df, textCol)) { case (d, (lang, ws)) =>
      d.withColumn(s"_s_$lang", expr(s"size(filter(tokens, t -> t IN (${sqlList(ws)})))"))
    }
    val Seq(en, de, es, fr, zh) = LangMarkers.map { case (l, _) => col(s"_s_$l") }
    scored
      .withColumn("lang_guess",
        when(en + de + es + fr + zh === 0, "und")
          .when(en >= de && en >= es && en >= fr && en >= zh, "en")
          .when(de >= es && de >= fr && de >= zh, "de")
          .when(es >= fr && es >= zh, "es")
          .when(fr >= zh, "fr")
          .otherwise("zh"))
      .drop("tokens")
      .drop(LangMarkers.map { case (l, _) => s"_s_$l" }: _*)
  }

  /** Content fingerprint: md5 of the normalized (lower, trimmed) text —
    * the exact-dedup key. Hash is computed on UTF-8 bytes in any engine.
    */
  def fingerprint(textCol: Column): Column = md5(lower(trim(textCol)))

  /** Long-format term frequencies: (doc key, token, tf). */
  def termFrequencies(df: DataFrame, keyCol: String, textCol: String = "text"): DataFrame =
    withTokens(df, textCol)
      .select(col(keyCol), explode(col("tokens")).as("token"))
      .groupBy(keyCol, "token")
      .agg(count(lit(1)).as("tf"))

  /** Corpus document frequencies + idf = ln(N / df). N comes in as a lazy
    * 1-row aggregate broadcast into the plan (the A8 scalar idiom), NOT a
    * driver-side `count()` action — so TF-IDF is one composed job with no
    * extra pass over the corpus.
    */
  def docFrequencies(tf: DataFrame, keyCol: String, corpusN: DataFrame): DataFrame =
    tf.groupBy("token")
      .agg(countDistinct(col(keyCol)).as("df"))
      .crossJoin(broadcast(corpusN))
      .withColumn("idf", round(log(col("_corpus_n") / col("df")), 6))
      .drop("_corpus_n")

  /** [[docFrequencies]] with a caller-known corpus size (e.g. from table
    * statistics — avoids even the lazy count subtree). */
  def docFrequencies(tf: DataFrame, keyCol: String, corpusSize: Long): DataFrame =
    docFrequencies(tf, keyCol,
      tf.sparkSession.range(1).select(lit(corpusSize.toDouble).as("_corpus_n")))

  /** TF-IDF long format: join tf with idf. The vocabulary join is left
    * un-hinted on purpose — a web-scale corpus's distinct-token relation is
    * unbounded, so a forced broadcast would materialize it on the driver.
    * AQE picks broadcast when the vocabulary actually is small (as it is at
    * test scale) and falls back to a shuffled join when it isn't.
    *
    * The idf denominator N is folded into the plan as a broadcast 1-row
    * count of `df` — callers no longer pay a separate `count()` job.
    */
  def tfIdf(df: DataFrame, keyCol: String, textCol: String = "text"): DataFrame = {
    val tf = termFrequencies(df, keyCol, textCol)
    val n = df.agg(count(lit(1)).cast("double").as("_corpus_n"))
    tf.join(docFrequencies(tf, keyCol, n), Seq("token"))
      .withColumn("tf_idf", round(col("tf") * col("idf"), 6))
  }

  /** [[tfIdf]] with a caller-known corpus size. */
  def tfIdf(df: DataFrame, keyCol: String, textCol: String,
      corpusSize: Long): DataFrame = {
    val tf = termFrequencies(df, keyCol, textCol)
    tf.join(docFrequencies(tf, keyCol, corpusSize), Seq("token"))
      .withColumn("tf_idf", round(col("tf") * col("idf"), 6))
  }

  /** Token-window chunking with overlap — the standard LLM pre-training
    * prep step (split each document into `size`-token windows every
    * `stride` tokens; the tail window may be shorter). One projection +
    * explode, no shuffle: chunking stays embarrassingly parallel at any
    * corpus size. Output: (key, chunk_idx, chunk_tokens, chunk, chunk_hash).
    */
  def tokenChunks(df: DataFrame, keyCol: String, textCol: String = "text",
      chunkSize: Int = 16, stride: Int = 8): DataFrame = {
    require(chunkSize > 0 && stride > 0, "chunkSize and stride must be positive")
    withTokens(df, textCol)
      .select(col(keyCol), posexplode(expr(
        s"""transform(sequence(1, size(tokens), $stride),
           |  s -> named_struct(
           |    'chunk', concat_ws(' ', slice(tokens, s, $chunkSize)),
           |    'chunk_tokens', size(slice(tokens, s, $chunkSize))))""".stripMargin))
        .as(Seq("chunk_idx", "c")))
      .select(col(keyCol), col("chunk_idx"),
        col("c.chunk_tokens").as("chunk_tokens"), col("c.chunk").as("chunk"))
      .withColumn("chunk_hash", md5(col("chunk")))
  }

  /** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    * SIGMOD'03 — the MOSS algorithm): hash every token k-gram, slide a
    * window of `w` hashes over the sequence, and keep each window's
    * minimum. The winnowing guarantee: any token run of length >=
    * w + k - 1 shared between two documents contributes at least one
    * SHARED fingerprint — partial-overlap detection that whole-document
    * md5 (exact dedup) cannot provide.
    *
    * Two hash choices behind `portableHashes`:
    *   - true (default, the oracle form): the k-gram hash is the md5 hex
    *     string and the window minimum is lexicographic — deliberately
    *     engine-portable (the DuckDB oracle reproduces it bit-for-bit).
    *   - false (production): xxhash64 — a LONG fingerprint, ~4× narrower
    *     than the 32-char hex string in shuffle/storage and far cheaper to
    *     compute and compare at corpus scale; the window minimum is
    *     numeric. Any deterministic hash yields a valid winnowing (the
    *     shared-run guarantee is per-hash), so the two variants select
    *     different positions but both satisfy the MOSS contract.
    *
    * Shape (both variants): each k-gram is hashed ONCE in long format, then
    * the sliding minimum is a window-frame `min` over (key, position) and
    * the per-doc dedup a distinct — one shuffle on the key. (An earlier
    * pure-HOF array form had no shuffle but Catalyst's projection collapse
    * inlined the k-gram hashing expression into every window element,
    * recomputing the whole hash array per window: O(n²) md5 calls per doc,
    * ~30× slower at sf0.1. The long form hashes O(n) and compares O(n·w).)
    */
  def winnowFingerprints(df: DataFrame, keyCol: String, textCol: String = "text",
      k: Int = 3, w: Int = 4, portableHashes: Boolean = true): DataFrame =
    winnowSelections(df, keyCol, textCol, k, w, portableHashes)
      .select(col(keyCol), col("fingerprint")).distinct()

  /** Winnowing selections in long format — (keyCol, pos, fingerprint), one
    * row per window with pos = the window's start index (0-based over the
    * doc's k-gram sequence), BEFORE the per-doc distinct. Exposed so the
    * selection step itself is testable against an independent reference
    * for either hash choice.
    */
  def winnowSelections(df: DataFrame, keyCol: String, textCol: String = "text",
      k: Int = 3, w: Int = 4, portableHashes: Boolean = true): DataFrame = {
    require(k > 0 && w > 0, "k and w must be positive")
    import org.apache.spark.sql.expressions.Window
    val kgramHash =
      if (portableHashes) s"md5(concat_ws(' ', slice(tokens, i, $k)))"
      else s"xxhash64(concat_ws(' ', slice(tokens, i, $k)))"
    val kg = withTokens(df, textCol)
      .withColumn("_n_kg", size(col("tokens")) - (k - 1))
      .filter(col("_n_kg") > 0)
      .select(col(keyCol), col("_n_kg"), posexplode(expr(
        s"""transform(sequence(1, size(tokens) - ${k - 1}),
           |  i -> $kgramHash)""".stripMargin))
        .as(Seq("_idx", "_kh")))
    val frame = Window.partitionBy(col(keyCol)).orderBy(col("_idx"))
      .rowsBetween(Window.currentRow, w - 1)
    kg.withColumn("fingerprint", min(col("_kh")).over(frame))
      // keep only full windows; a doc shorter than w hashes keeps its one
      // all-covering window at position 0 (the frame clips to the doc end)
      .filter(col("_idx") <= greatest(col("_n_kg") - w, lit(0)))
      .select(col(keyCol), col("_idx").as("pos"), col("fingerprint"))
  }

  /** PII patterns for scrubbing/reporting. Deliberately lookaround-free so
    * the same regex runs identically under Java regex (Spark) and RE2
    * (DuckDB, the oracle) — cross-engine parity is part of the contract.
    * Order matters for scrubbing: emails first (their dots would otherwise
    * partially match the looser patterns' character classes).
    */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "phone" -> "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b",
    "ip"    -> "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  )

  /** PII scrub + report — the redaction pass every shared training corpus
    * needs: each pattern category is counted on the ORIGINAL text (a span
    * matching several categories counts in each) and then replaced with a
    * `[CATEGORY]` tag in pattern order. Pure projection (regexp_replace /
    * regexp_extract_all chains, codegen'd, no UDF): O(doc length) per row,
    * no shuffle. Output adds n_email / n_phone / n_ip, pii_total, and
    * `text_clean`.
    */
  def piiScrub(df: DataFrame, textCol: String = "text"): DataFrame = {
    val counted = PiiPatterns.foldLeft(df) { case (d, (cat, pat)) =>
      d.withColumn(s"n_$cat",
        size(regexp_extract_all(col(textCol), lit(pat), lit(0))).cast("long"))
    }
    val cleaned = PiiPatterns.foldLeft(counted.withColumn("text_clean", col(textCol))) {
      case (d, (cat, pat)) =>
        d.withColumn("text_clean",
          regexp_replace(col("text_clean"), pat, s"[${cat.toUpperCase}]"))
    }
    cleaned.withColumn("pii_total",
      PiiPatterns.map { case (c, _) => col(s"n_$c") }.reduce(_ + _))
  }

  /** Consistent PII pseudonymization — the referential-integrity-
    * preserving alternative to [[piiScrub]]'s flat `[EMAIL]` tags: every
    * occurrence of the SAME value maps to the SAME `CAT_<md5-prefix>`
    * token corpus-wide (same user ⇒ same pseudonym across documents, so
    * joins and dedup still work on the scrubbed corpus), without any
    * shared lookup table — the pseudonym is a pure hash of the value, so
    * consistency needs NO shuffle, no state, no coordination between
    * executors or even between runs. Per category the doc's matches fold
    * over the text as a sequential `aggregate(...)`/`list_reduce`
    * replace chain (codegen'd, same left fold both engines).
    *
    * Documented edge: literal replacement is global, so a PII value that
    * is a strict substring of ANOTHER PII value appearing later in the
    * same document rewrites inside the longer match too (both engines
    * identically — the fold order is appearance order).
    *
    * Output: original columns + n_pseudo (distinct values rewritten) +
    * `text_pseudo`.
    */
  def pseudonymizePii(df: DataFrame, textCol: String = "text"): DataFrame = {
    // Column API throughout: an expr() SQL literal would re-parse the
    // regex string and strip its backslash escapes.
    val withPseudo = PiiPatterns.foldLeft(
      df.withColumn("text_pseudo", col(textCol))) { case (d, (cat, pat)) =>
      val tag = cat.toUpperCase
      d.withColumn("text_pseudo", aggregate(
        regexp_extract_all(col(textCol), lit(pat), lit(0)),
        col("text_pseudo"),
        (acc, m) => replace(acc, m, concat(lit(s"${tag}_"), substring(md5(m), 1, 8)))))
    }
    withPseudo.withColumn("n_pseudo",
      PiiPatterns.map { case (_, pat) =>
        size(array_distinct(regexp_extract_all(col(textCol), lit(pat), lit(0))))
          .cast("long")
      }.reduce(_ + _))
  }

  /** Encoding-anomaly diagnostics — the ftfy-direction health check a
    * web-scraped corpus runs before any text op (mojibake is invisible to
    * token statistics but poisons tokenizers and dedup shingles). Three
    * codepoint signatures, each a pure counted regex (no UDF, codegen'd,
    * zero shuffle):
    *
    *  - `n_repl`: U+FFFD replacement characters — a decoder already gave
    *    up on those bytes upstream;
    *  - `n_moji`: the UTF-8-read-as-Latin-1 signature — a lead byte
    *    0xC2/0xC3 (“Â”/“Ã”) followed by a continuation codepoint in
    *    U+0080–U+00BF, the two-char shape every Latin-1-range mis-decode
    *    collapses to (“é” → “Ã©”, NBSP → “Â ”);
    *  - `n_ctrl`: C0 control characters other than tab/newline/CR —
    *    binary junk masquerading as text.
    *
    * `enc_clean` = all three are zero. Counting (not repairing): repair
    * is a lossy byte-level round-trip that belongs upstream of the lake;
    * the pipeline's job is to quarantine, which this flag drives.
    */
  def encodingAnomalies(df: DataFrame, keyCol: String,
      textCol: String = "text"): DataFrame = {
    def n(pat: String) =
      size(regexp_extract_all(col(textCol), lit(pat), lit(0))).cast("long")
    df.select(col(keyCol),
        n("\uFFFD").as("n_repl"),
        n("[\u00C2\u00C3][\u0080-\u00BF]").as("n_moji"),
        n("[\u0000-\u0008\u000B\u000C\u000E-\u001F]").as("n_ctrl"))
      .withColumn("enc_clean",
        col("n_repl") === 0L && col("n_moji") === 0L && col("n_ctrl") === 0L)
  }

  /** Bigram collocations scored by pointwise mutual information — phrase
    * mining for a training corpus (PMI >> 0 marks token pairs that
    * co-occur far above chance: named entities, fixed phrases, tokenizer
    * merge candidates). PMI = ln( P(xy) / (P(x)·P(y)) ) with bigram and
    * unigram distributions estimated from exact counts; the double
    * derivation follows one fixed op order mirrored in the oracle. Two
    * explodes + two counting aggregations + a broadcast vocabulary join —
    * the same shape (and broadcast rationale) as [[tfIdf]].
    */
  def collocations(df: DataFrame, textCol: String = "text",
      minCount: Long = 5): DataFrame = {
    val toks = withTokens(df, textCol)
    val uni = toks.select(explode(col("tokens")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val bi = toks.filter(size(col("tokens")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(tokens) - 1), i -> concat_ws(' ', slice(tokens, i, 2)))"))
        .as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("cxy"))
    val nUni = uni.agg(sum(col("c")).as("nu"))
    val nBi = bi.agg(sum(col("cxy")).as("nb"))
    // vocabulary joins carry NO broadcast hint: a web-scale corpus can
    // push the unigram table past any broadcast threshold — AQE
    // broadcasts when measured small, shuffles otherwise (the single-row
    // totals stay hinted)
    bi.filter(col("cxy") >= minCount)
      .withColumn("w1", split(col("bg"), " ").getItem(0))
      .withColumn("w2", split(col("bg"), " ").getItem(1))
      .join(uni.toDF("w1", "cx"), Seq("w1"))
      .join(uni.toDF("w2", "cy"), Seq("w2"))
      .crossJoin(broadcast(nUni)).crossJoin(broadcast(nBi))
      .withColumn("pmi", round(log(
        (col("cxy").cast("double") / col("nb"))
          / ((col("cx").cast("double") / col("nu"))
            * (col("cy").cast("double") / col("nu")))), 6))
      .select("w1", "w2", "cxy", "pmi")
  }

  /** BM25 relevance scoring against a bounded query-term set — the
    * retrieval primitive data curation leans on (nearest-prose lookup,
    * seed-document expansion, query-targeted corpus slicing). Uses the
    * Lucene idf form ln(1 + (N − df + ½)/(df + ½)) (never negative, the
    * variant every production engine ships) with the standard k1/b
    * length normalization. Output: one row per document containing at
    * least one term — (keyCol, n_terms_hit, bm25_micros).
    *
    * Scale shape: term frequencies only for the BOUNDED query-term set
    * (the isin filter prunes the explode before the aggregate), document
    * lengths as one partial-aggregated pass, N/avgdl as a lazily
    * broadcast 1-row aggregate (the A8 idiom), df as a tiny per-term
    * aggregate joined back. No driver actions.
    *
    * Determinism: each per-(doc, term) score is one fixed double
    * sequence from exact longs, floored to integer micros, then summed
    * exactly per doc — partition-order and engine independent.
    */
  def bm25(docs: DataFrame, queryTerms: Seq[String], keyCol: String = "doc_id",
      textCol: String = "text", k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val all = termFrequencies(docs, keyCol, textCol)
    val len = all.groupBy(keyCol).agg(sum("tf").as("dlen"))
    val tf = all.filter(col("token").isin(queryTerms: _*))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val tot = len.agg(count(lit(1)).as("n_docs"), sum("dlen").as("sum_len"))
    tf.join(len, Seq(keyCol))
      .join(df, Seq("token"))
      .crossJoin(broadcast(tot))
      .withColumn("_s", expr(
        s"""CAST(floor(ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
           |  * (CAST(tf AS DOUBLE) * ($k1 + 1.0))
           |  / (CAST(tf AS DOUBLE) + $k1 * (1.0 - $b + $b * (CAST(dlen AS DOUBLE)
           |      / (CAST(sum_len AS DOUBLE) / CAST(n_docs AS DOUBLE))))) * 1e6 + 0.5) AS BIGINT)""".stripMargin))
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n_terms_hit"), sum("_s").as("bm25_micros"))
  }

  /** Per-document token entropy — the diversity quality signal
    * complementing [[repetitionStats]] (concentration) and the unigram-LM
    * NLL (corpus-model fit): H = ln n − (Σ c·ln c)/n over the document's
    * OWN token counts — 0 for a single repeated token, ln(n_types) when
    * every token is distinct. Boilerplate scores low, diverse prose high.
    *
    * Determinism: each c·ln c term is one fixed double sequence from an
    * exact count, floored to INTEGER micros per (doc, type) and summed
    * exactly; H is then one fixed double sequence per doc —
    * partition-order and engine independent (the unigram-NLL contract).
    * Scale shape: one explode + two partial-aggregated groupBys.
    */
  def tokenEntropy(df: DataFrame, keyCol: String, textCol: String = "text"): DataFrame =
    termFrequencies(df, keyCol, textCol)
      .groupBy(keyCol)
      .agg(
        sum(col("tf")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(expr("CAST(floor(tf * ln(tf) * 1e6 + 0.5) AS BIGINT)")).as("_clnc_micros"))
      .withColumn("entropy_micros", expr(
        """CAST(floor((ln(CAST(n_tokens AS DOUBLE))
          |  - CAST(_clnc_micros AS DOUBLE) / 1e6 / CAST(n_tokens AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)""".stripMargin))
      .select(keyCol, "n_tokens", "n_types", "entropy_micros")

  /** Within-document repetition statistics — dedup/quality signals for a
    * training corpus: type-token ratio (distinct/total tokens) and the
    * share of the single most repeated token. One explode + two
    * aggregations, partial-aggregated map-side.
    */
  def repetitionStats(df: DataFrame, keyCol: String, textCol: String = "text"): DataFrame =
    termFrequencies(df, keyCol, textCol)
      .groupBy(keyCol)
      .agg(
        sum(col("tf")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        max(col("tf")).as("top_token_count"))
      .withColumn("type_token_ratio",
        round(col("n_types").cast("double") / col("n_tokens"), 6))
      .withColumn("top_token_share",
        round(col("top_token_count").cast("double") / col("n_tokens"), 6))

  /** Flesch reading-ease per document (Flesch 1948; the readability
    * screen document-quality pipelines run alongside length/repetition
    * gates): 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words).
    * Sentences = runs of terminal punctuation (min 1); syllables = vowel
    * GROUPS per word (min 1) — the standard regex heuristic, applied
    * identically on both engines. All counts are exact integers; the
    * score is ONE double expression evaluated with the same
    * parenthesization on both engines, so it compares bit-exactly.
    *
    * Shape: one token explode + per-doc aggregate, one projection for
    * the sentence count, one key join.
    */
  def readability(docs: DataFrame, keyCol: String,
      textCol: String = "text"): DataFrame = {
    val syl = withTokens(docs, textCol)
      .select(col(keyCol), explode(col("tokens")).as("token"))
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n_words"),
        sum(greatest(lit(1L),
          size(expr("regexp_extract_all(token, '[aeiouyAEIOUY]+', 0)")).cast("long")))
          .as("n_syllables"))
    docs.select(col(keyCol),
        greatest(lit(1L),
          size(expr(s"regexp_extract_all($textCol, '[.!?]+', 0)")).cast("long"))
          .as("n_sentences"))
      .join(syl, Seq(keyCol))
      .withColumn("flesch", expr(
        "round(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences) " +
          "- 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 6)"))
      .select(keyCol, "n_words", "n_sentences", "n_syllables", "flesch")
  }

  /** Zipf power-law fit over the top-`topN` corpus tokens — the standard
    * corpus-health diagnostic (natural text has log-log slope ≈ −1;
    * boilerplate-heavy or templated corpora flatten, deduplicated
    * near-uniform corpora steepen). Ordinary least squares of
    * ln(count) on ln(rank), computed the engine-portable way: per-row
    * logs as integer micros (floor(ln·10⁶ + 0.5)), ALL sums exact
    * integer arithmetic, and the closed-form slope/intercept each one
    * double division at the boundary — exact-int inputs, so the doubles
    * compare bit-identically across engines.
    *
    * Scale shape: one token-count shuffle, a TakeOrdered(topN) cut
    * (never a global sort), then a model-sized (topN-row) unpartitioned
    * window and a 1-row aggregate.
    *
    * Output: one row (n_fit, zipf_slope, zipf_intercept).
    */
  def zipfSlope(docs: DataFrame, textCol: String = "text",
      topN: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(topN >= 2, "topN must be >= 2")
    val top = withTokens(docs, textCol)
      .select(explode(col("tokens")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(topN)
    top
      .withColumn("rk", row_number().over(
        Window.orderBy(col("cnt").desc, col("token"))).cast("long"))
      .withColumn("x", expr("CAST(floor(ln(CAST(rk AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)"))
      .withColumn("y", expr("CAST(floor(ln(CAST(cnt AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(expr("x * y")).as("sxy"), sum(expr("x * x")).as("sxx"))
      .select(col("n").as("n_fit"),
        round(expr("CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)"), 6)
          .as("zipf_slope"),
        // intercept via means (ȳ − slope·x̄): the direct closed form's
        // sy·sxx term overflows 64-bit; every operand here is an exact
        // ≤2⁶³ integer and the double expression tree is identical on
        // both engines, so the result still compares bit-exactly
        round(expr("((CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) - " +
          "(CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)) * " +
          "(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))) / 1e6"), 6)
          .as("zipf_intercept"))
  }

  /** Top-`vocabSize` corpus tokens by frequency — the tokenizer-vocab
    * selection step. Deterministic tie-break (count desc, token asc) so
    * the vocabulary is reproducible across runs and engines. The sort is
    * a TakeOrdered (top-V heap per partition + merge), never a global
    * sort of the distinct-token domain.
    */
  def topVocabulary(docs: DataFrame, vocabSize: Int,
      textCol: String = "text"): DataFrame = {
    require(vocabSize > 0, "vocabSize must be positive")
    withTokens(docs, textCol)
      .select(explode(col("tokens")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(vocabSize)
  }

  /** Per-document out-of-vocabulary rate against [[topVocabulary]] — the
    * coverage check run before committing to a tokenizer vocab (how much
    * of each document would tokenize to UNK). Output: (keyCol, n_tokens,
    * n_oov, oov_micros). Scale shape: the vocab is bounded by vocabSize
    * (model-sized), so its membership join broadcasts; one shuffle for
    * the per-doc aggregate.
    */
  def vocabCoverage(docs: DataFrame, keyCol: String, vocabSize: Int,
      textCol: String = "text"): DataFrame = {
    val toks = withTokens(docs, textCol)
      .select(col(keyCol), explode(col("tokens")).as("token"))
    val vocab = topVocabulary(docs, vocabSize, textCol)
      .select(col("token"), lit(1).as("_in_vocab"))
    toks.join(vocab, Seq("token"), "left")
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("_in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_micros", expr(
        """CAST(floor(CAST(n_oov AS DOUBLE) / CAST(n_tokens AS DOUBLE)
          |  * 1e6 + 0.5) AS BIGINT)""".stripMargin))
  }

  /** Vocabulary-DRIFT monitor against a STANDING vocabulary — the
    * retrain-trigger signal a production tokenizer pipeline watches on
    * its nightly loop: how much of the incoming batch falls outside the
    * vocabulary the tokenizer was committed on (OOV rate), and how many
    * genuinely NEW token types the batch introduces (type growth). Both
    * rising together means the corpus moved under the tokenizer; OOV
    * rising alone with flat type growth means a few novel types are
    * heavy (one new domain's jargon). `standingVocab` is any
    * (tok, …) frame — e.g. the suffix store's token dict
    * ([[SuffixIndexStore]]), which is exactly the distinct-token set of
    * the corpus the index was committed on.
    *
    * Output: ONE row — (n_docs, n_tokens, n_oov, oov_micros,
    * n_new_types), all BIGINT. Scale shape: one batch explode, one
    * keyed membership join against the vocab (corpus-type-sized keyed
    * table, not broadcast-assumed), one aggregate; nothing reaches the
    * driver.
    */
  def vocabDrift(batch: DataFrame, keyCol: String,
      standingVocab: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = withTokens(batch, textCol)
      .filter(size(col("tokens")) > 0)
      .select(col(keyCol), explode(col("tokens")).as("tok"))
    toks.join(standingVocab.select(col("tok"), lit(1).as("_in_vocab")),
        Seq("tok"), "left")
      .agg(countDistinct(col(keyCol)).as("n_docs"),
        count(lit(1)).as("n_tokens"),
        coalesce(sum(when(col("_in_vocab").isNull, 1L).otherwise(0L)), lit(0L))
          .as("n_oov"),
        countDistinct(when(col("_in_vocab").isNull, col("tok")))
          .as("n_new_types"))
      // an empty batch yields the all-zero row, not nulls (0/0 → 0)
      .withColumn("oov_micros", expr(
        """CAST(CASE WHEN n_tokens = 0 THEN 0 ELSE
          |  floor(CAST(n_oov AS DOUBLE) / CAST(n_tokens AS DOUBLE)
          |    * 1e6 + 0.5) END AS BIGINT)""".stripMargin))
      .select("n_docs", "n_tokens", "n_oov", "oov_micros", "n_new_types")
  }

  /** Inverted-index build: one row per index term with its document
    * frequency and the SORTED posting list of doc keys — the retrieval
    * artifact BM25/boolean search serve from. `maxDfRatio` drops
    * stopword-grade terms (df > ratio·N) the way production indexes
    * stop-list them — without the cutoff a term like "the" would carry a
    * corpus-sized posting row, which no single row should at 100 TB.
    * Postings are doc-distinct and sorted, so the output is
    * partition-order independent. Scale shape: explode → (token, key)
    * distinct → per-token collect_list bounded by df ≤ ratio·N; the
    * corpus size joins in as a lazily-broadcast 1-row aggregate (A8
    * idiom, no separate count job).
    */
  def invertedIndex(docs: DataFrame, keyCol: String,
      textCol: String = "text", maxDfRatio: Double = 0.5): DataFrame =
    applyDfCap(invertedIndexStats(docs, keyCol, textCol),
      docs.agg(count(lit(1)).as("_n")), maxDfRatio)

  /** The UNFILTERED posting stats — (token, df, postings) with no df
    * cap: the form the standing index artifact persists, because the
    * stop-list threshold depends on the CURRENT corpus size (df ≤ N·r)
    * and must re-apply at read time as the corpus grows. Mergeable:
    * [[appendInvertedIndex]] folds a batch in without touching corpus
    * text.
    */
  def invertedIndexStats(docs: DataFrame, keyCol: String,
      textCol: String = "text"): DataFrame =
    withTokens(docs, textCol)
      .select(col(keyCol), explode(col("tokens")).as("token"))
      .distinct()
      .groupBy("token")
      .agg(count(lit(1)).as("df"),
        sort_array(collect_list(col(keyCol))).as("postings"))

  /** The read-time stop-list: df ≤ N·maxDfRatio against a 1-row corpus
    * count frame. */
  def applyDfCap(stats: DataFrame, nDocs: DataFrame,
      maxDfRatio: Double): DataFrame = {
    require(maxDfRatio > 0.0 && maxDfRatio <= 1.0,
      s"maxDfRatio must be in (0,1]: $maxDfRatio")
    stats.crossJoin(broadcast(nDocs))
      .filter(col("df") <= col("_n") * lit(maxDfRatio))
      .drop("_n")
  }

  /** Incremental maintenance of the standing posting stats: batch keys
    * are NEW (unique across corpus ∪ batch), so per-token df ADDS and
    * postings concatenate — re-sorted once, which equals a full rebuild
    * over the union exactly (q_incinvidx oracle-gates it). Work: one
    * batch-sized token pass + a merge keyed on the token.
    */
  def appendInvertedIndex(standing: DataFrame, batch: DataFrame,
      keyCol: String, textCol: String = "text"): DataFrame =
    standing.select("token", "df", "postings")
      .unionByName(invertedIndexStats(batch, keyCol, textCol))
      .groupBy("token")
      .agg(sum("df").as("df"),
        sort_array(flatten(collect_list(col("postings")))).as("postings"))

  /** A deterministic stand-in weight table for [[hashedQualityScore]]:
    * one row per bucket in [0, nBuckets) with a pseudo-weight in
    * [-1000000, 1000000] micros derived from md5 of the seeded bucket
    * index. In production the table comes from a TRAINED linear model —
    * [[graft.text.QualityTraining.trainQualityWeights]] produces one in
    * exactly this format from spark.ml logistic regression; this
    * generator exists so the ORACLE-CHECKED scoring path has a portable,
    * engine-reproducible fixture (DuckDB can replay md5 pseudo-weights,
    * not an LBFGS fit).
    */
  def hashWeightTable(spark: org.apache.spark.sql.SparkSession, nBuckets: Int,
      seed: String = "w"): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    spark.range(nBuckets).toDF("bucket")
      .withColumn("w_micros", expr(
        s"CAST(conv(substr(md5(concat('$seed', CAST(bucket AS STRING))), 1, 8), 16, 10) AS BIGINT) % 2000001 - 1000000"))
  }

  /** fastText-style linear quality classifier over hashed token features
    * (the "quality filter" step of GPT-3/CCNet-style curation: score
    * every document against a trained linear model, keep what clears the
    * threshold). The hashing trick folds an unbounded vocabulary into
    * `nBuckets` fixed buckets — md5-based, so bucket assignment is
    * engine- and partition-independent — and the model is
    * `score = bias + (Σ w[bucket(token)]) / n_tokens`, i.e. mean bucket
    * weight: a linear model over L1-normalized hashed counts.
    *
    * `weights` is (bucket, w_micros) with integer-micros coefficients;
    * missing buckets score 0 (left join + fill — a trained model may be
    * sparse). The per-doc weight sum is an exact integer sum (no
    * double-accumulation order dependence); ONE double division at the
    * end produces the score. Output: (key, n_tokens, score_micros, keep).
    *
    * Scale shape: token explode is a projection; the weights join keys on
    * the bucket id — the weight side is bounded by nBuckets (model-sized,
    * not corpus-sized), so AQE broadcasts it; one shuffle for the per-doc
    * sum with map-side partials.
    */
  def hashedQualityScore(docs: DataFrame, keyCol: String, weights: DataFrame,
      nBuckets: Int, biasMicros: Long, thresholdMicros: Long,
      textCol: String = "text"): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    withTokens(docs, textCol)
      .select(col(keyCol), explode(col("tokens")).as("token"))
      .withColumn("bucket", expr(
        s"CAST(conv(substr(md5(token), 1, 8), 16, 10) AS BIGINT) % $nBuckets"))
      .join(weights.select(col("bucket"), col("w_micros")), Seq("bucket"), "left")
      .na.fill(0L, Seq("w_micros"))
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n_tokens"), sum(col("w_micros")).as("_sw"))
      .withColumn("score_micros", lit(biasMicros) + expr(
        "CAST(floor(CAST(_sw AS DOUBLE) / CAST(n_tokens AS DOUBLE) + 0.5) AS BIGINT)"))
      .withColumn("keep", col("score_micros") >= thresholdMicros)
      .select(keyCol, "n_tokens", "score_micros", "keep")
  }

  /** Vocabulary-richness estimators — how much vocabulary the corpus has
    * NOT yet seen, the coverage-planning signal for crawl scheduling and
    * tokenizer sizing: Chao1 (Chao 1984, bias-corrected form — estimated
    * true vocabulary size from the singleton/doubleton counts) and the
    * Good–Turing unseen mass (the probability the next token is novel,
    * p₀ = f₁/N). A corpus whose Chao1 estimate far exceeds its observed
    * vocabulary is still discovering its domain; one whose unseen mass
    * approaches zero has saturated.
    *
    * Exactness: f₁, f₂, S, N are exact Longs from two keyed aggregates;
    * both estimators round ONCE via `div` micros. Chao1 uses the
    * bias-corrected f₁(f₁−1)/(2(f₂+1)) so the f₂ = 0 corpus is total.
    * Overflow bound: the f₁(f₁−1)·10⁶ numerator is exact while
    * f₁ ≤ 3·10⁶ singletons (the [[graft.graph.Graph.degreeAssortativity]]
    * convention: stated, and two orders above anything the test corpora
    * produce — re-derive before pointing at a web-scale vocabulary).
    *
    * Scale shape: one token explode + two map-side-combinable groupBys
    * (token counts, then count-of-counts) + a 1-row aggregate.
    */
  def vocabRichness(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val counts = withTokens(docs, textCol)
      .select(explode(col("tokens")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("c"))
    counts.agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("f2"))
      // loud-failure guard on the stated f₁(f₁−1)·10⁶ exactness bound:
      // beyond 3e6 singletons the Chao1 numerator would overflow Long.
      .filter(expr("assert_true(f1 <= 3000000L, " +
        "'vocabRichness: f1 > 3e6 singletons exceeds the exact Chao1 Long bound') IS NULL"))
      .withColumn("chao1_extra_micros",
        expr("f1 * (f1 - 1) * 1000000L div (2L * (f2 + 1))"))
      .withColumn("gt_unseen_micros", expr("f1 * 1000000L div n_tokens"))
  }

  /** The Luhn mod-10 validity predicate over a digit-string column —
    * pure integer arithmetic (right-to-left, every second digit doubled,
    * >9 reduced by 9), identical as a Spark `aggregate` and a DuckDB
    * `list_sum(list_transform(...))`, so the verdicts replay exactly.
    */
  def luhnValidExpr(c: String): org.apache.spark.sql.Column = expr(
    s"""aggregate(sequence(0, length($c) - 1), 0L, (acc, i) -> acc +
       |  CASE WHEN i % 2 = 1
       |    THEN CASE WHEN CAST(substring($c, length($c) - i, 1) AS BIGINT) * 2 > 9
       |      THEN CAST(substring($c, length($c) - i, 1) AS BIGINT) * 2 - 9
       |      ELSE CAST(substring($c, length($c) - i, 1) AS BIGINT) * 2 END
       |    ELSE CAST(substring($c, length($c) - i, 1) AS BIGINT) END) % 10 = 0""".stripMargin)

  /** Luhn-validated payment-card candidates (the checksum upgrade to
    * [[piiScrub]]'s pattern-only card regex): every 13–19 digit run in
    * the text, with its mod-10 verdict — the standard false-positive
    * filter (a random digit run passes Luhn ~10% of the time; an order
    * id or timestamp masquerading as a PAN almost never does). One
    * regexp projection + explode; candidates-per-doc bounded by text
    * length.
    *
    * Output: (keyCol, candidate, luhn_valid).
    */
  def luhnCandidates(docs: DataFrame, keyCol: String,
      textCol: String = "text"): DataFrame =
    docs.select(col(keyCol),
        explode(expr(s"regexp_extract_all($textCol, '[0-9]{13,19}', 0)"))
          .as("candidate"))
      .withColumn("luhn_valid", luhnValidExpr("candidate"))
}
