package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE merge-pair learning — the tokenizer-training step a
  * pipeline runs between corpus curation and packing (Sennrich et al.,
  * "Neural Machine Translation of Rare Words with Subword Units", ACL'16):
  * start from characters, repeatedly count adjacent symbol pairs across
  * the corpus and merge the most frequent pair, emitting the learned merge
  * table that [[TextAnalysis.topVocabulary]]-style consumers apply.
  *
  * Determinism contract (identical on the DuckDB oracle side):
  *  - words are whitespace tokens; symbols start as characters; no
  *    end-of-word marker (merges never cross word boundaries because
  *    each word is processed independently).
  *  - the round's winner is (count DESC, lhs ASC, rhs ASC) — a total
  *    order, so ties cannot make engines diverge.
  *  - within a round, merging is canonical GREEDY LEFT-TO-RIGHT
  *    NON-OVERLAPPING: "aaaa" under merge (a,a) → "aa aa" (disjoint
  *    occurrences all merge), "aaa" → "aa a" (the overlap is skipped).
  *    BOTH engines implement the round as one string replace over the
  *    encoding " s1  s2  ...  sn " (symbols joined by TWO spaces,
  *    single-space sentinels at the ends): the pattern ' lhs  rhs ' →
  *    ' lhsrhs ' consumes exactly one space of each boundary gap, which
  *    reproduces greedy non-overlapping scanning exactly, and the
  *    double-space gap makes a symbol's delimiters unshareable so
  *    multi-char symbols can never false-match inside a neighbor
  *    ("xab ab" has no ' ab ' hit inside 'xab').
  *
  * Scale shape: the corpus collapses ONCE into the distinct-word
  * frequency table (one shuffle over the full token stream), and every
  * round thereafter runs on that table — pair counts are occurrence
  * counts because each pair row is weighted by its word's frequency, so
  * the numbers are identical to streaming the corpus, but the per-round
  * cost is VOCABULARY-sized (Heaps' law: ~√corpus), not corpus-sized.
  * Distinct raw words stay distinct under merging (the character
  * sequence is recoverable from any encoding), so the table never needs
  * re-grouping. Per round: one model-sized pair-count shuffle + one
  * TakeOrdered(1) + one broadcast-1-row rewrite projection; the word
  * table is localCheckpoint-truncated per round so the plan does not
  * re-embed all previous rounds (the kCore pattern). No driver collect
  * of anything corpus-sized.
  *
  * Output: (merge_round, lhs, rhs, pair_count) — `pair_count` is the pair's
  * corpus frequency at the START of its round. Named lhs/rhs because
  * left/right are SQL keywords on the oracle side.
  */
object BpeLearning {

  def learnBpeMerges(docs: DataFrame, rounds: Int,
      textCol: String = "text"): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    var words = TextAnalysis.withTokens(docs, textCol)
      .select(explode(col("tokens")).as("tok"))
      .filter(length(col("tok")) > 0)
      .select(concat(lit(" "), concat_ws("  ", split(col("tok"), "")), lit(" "))
        .as("w"))
      .groupBy("w").agg(count(lit(1)).as("wc"))
      .localCheckpoint()
    var out: Option[DataFrame] = None
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val top = words
        .select(col("wc"), expr("split(trim(w), '  ')").as("s"))
        .filter(size(col("s")) >= 2)
        .select(col("wc"), explode(expr(
          "transform(sequence(1, size(s) - 1), " +
            "i -> struct(element_at(s, i) AS l, element_at(s, i + 1) AS r))"))
          .as("p"))
        .groupBy(col("p.l").as("lhs"), col("p.r").as("rhs"))
        .agg(sum(col("wc")).as("pair_count"))
        .orderBy(col("pair_count").desc, col("lhs"), col("rhs"))
        .limit(1)
        .withColumn("merge_round", lit(r))
        .localCheckpoint() // the winner is re-used by rewrite AND output
      if (top.isEmpty) {
        exhausted = true // fewer distinct pairs than requested rounds
      } else {
        words = words.crossJoin(broadcast(top))
          .select(expr(
            "replace(w, concat(' ', lhs, '  ', rhs, ' '), " +
              "concat(' ', lhs, rhs, ' '))").as("w"), col("wc"))
          .localCheckpoint()
        out = Some(out.map(_.union(top)).getOrElse(top))
        r += 1
      }
    }
    out.map(_.select("merge_round", "lhs", "rhs", "pair_count"))
      .getOrElse(docs.sparkSession.emptyDataFrame
        .withColumn("merge_round", lit(0))
        .withColumn("lhs", lit("")).withColumn("rhs", lit(""))
        .withColumn("pair_count", lit(0L))
        .limit(0).select("merge_round", "lhs", "rhs", "pair_count"))
  }

  /** Apply a learned merge table to a corpus: segment every word with the
    * merges in round order and account the result per document — the
    * tokenizer-application step whose outputs (BPE token counts) feed
    * packing and length-bucketed batching.
    *
    * Applying the R merges sequentially to the fresh character encoding
    * reproduces the learning-time final state exactly (both are the same
    * deterministic rewrites in the same order), so the oracle can replay
    * learning and application in one CTE chain. The merge table is
    * model-sized (R rows — bounded-by-contract driver collect, the MMR
    * pool pattern); the application itself is ONE codegen'd projection:
    * the R replaces fold into a single nested expression, one pass over
    * the corpus, no joins and no per-round materialization.
    *
    * Output: (keyCol, n_words, n_chars, n_bpe_tokens, seg_hash) where
    * seg_hash is md5 of the words' segmentations joined in word order —
    * a bit-exact witness that the full segmentation (not just counts)
    * matches across engines.
    */
  def applyBpeMerges(docs: DataFrame, keyCol: String, mergeTable: DataFrame,
      textCol: String = "text"): DataFrame = {
    val ms = mergeTable.orderBy("merge_round").collect()
      .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs")))
    val words = TextAnalysis.withTokens(docs, textCol)
      .select(col(keyCol), posexplode(col("tokens")).as(Seq("pos", "tok")))
      .filter(length(col("tok")) > 0)
    val w0: Column = concat(lit(" "), concat_ws("  ", split(col("tok"), "")), lit(" "))
    val encoded = ms.foldLeft(w0) { case (c, (l, r)) =>
      // functions.replace (literal, non-regex) keeps symbols with regex
      // metacharacters or quotes safe — no string-built expression
      replace(c, lit(s" $l  $r "), lit(s" $l$r "))
    }
    words
      .withColumn("w", trim(encoded))
      .groupBy(keyCol)
      .agg(
        count(lit(1)).as("n_words"),
        sum(length(replace(col("w"), lit(" "), lit("")))).as("n_chars"),
        sum(size(expr("split(w, '  ')"))).as("n_bpe_tokens"),
        md5(concat_ws(" | ", expr(
          "transform(sort_array(collect_list(struct(pos, w))), s -> s.w)")))
          .as("seg_hash"))
  }

  /** DuckDB oracle for [[learnBpeMerges]]: the rounds unrolled as chained
    * CTEs (the q_pagerank pattern), each round repeating the identical
    * pair-count → (count DESC, lhs, rhs) top-1 → double-space-delimited
    * replace over the `documents` table.
    */
  def bpeOracleSql(rounds: Int): String = {
    require(rounds >= 1)
    val w0 =
      """w0 AS (SELECT ' ' || array_to_string(list_transform(range(1, len(tok) + 1), i -> tok[i]), '  ') || ' ' AS w
        |  FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok FROM documents)
        |  WHERE len(tok) > 0)""".stripMargin
    val roundsSql = (1 to rounds).map { r =>
      s"""p$r AS (SELECT pr.l AS lhs, pr.r AS rhs, count(*) AS c
         |  FROM (SELECT unnest(list_transform(range(1, len(s)), i -> struct_pack(l := s[i], r := s[i + 1]))) AS pr
         |        FROM (SELECT string_split(trim(w), '  ') AS s FROM w${r - 1}))
         |  GROUP BY 1, 2),
         |t$r AS (SELECT lhs, rhs, c FROM p$r ORDER BY c DESC, lhs, rhs LIMIT 1),
         |w$r AS (SELECT replace(w, ' ' || t$r.lhs || '  ' || t$r.rhs || ' ', ' ' || t$r.lhs || t$r.rhs || ' ') AS w
         |  FROM w${r - 1}, t$r)""".stripMargin
    }.mkString(",\n")
    val unions = (1 to rounds).map { r =>
      s"SELECT $r AS merge_round, lhs, rhs, CAST(c AS BIGINT) AS pair_count FROM t$r"
    }.mkString("\nUNION ALL ")
    s"WITH $w0,\n$roundsSql\n$unions"
  }

  /** Tokenizer fertility by group (typically language) — the fairness
    * metric tokenizer work reports (e.g. XLM-R §3.1: high fertility =
    * the tokenizer fragments that language's words into many subwords,
    * inflating its sequence lengths and training cost): apply the learned
    * merges, then per `groupCol` aggregate chars-per-BPE-token and
    * BPE-tokens-per-word as exact integer-micros floor divisions
    * (non-negative, so Spark `div` ≡ DuckDB `//`). Scale shape: the
    * [[applyBpeMerges]] projection + its per-doc aggregate, one broadcast
    * join for the group column, one bounded-key aggregate.
    */
  def tokenizerFertility(docs: DataFrame, keyCol: String, mergeTable: DataFrame,
      groupCol: String, textCol: String = "text"): DataFrame =
    applyBpeMerges(docs, keyCol, mergeTable, textCol)
      .join(docs.select(col(keyCol), col(groupCol)), Seq(keyCol))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_docs"),
        sum("n_words").as("n_words"),
        sum("n_chars").as("n_chars"),
        sum("n_bpe_tokens").as("n_bpe_tokens"))
      .withColumn("chars_per_token_micros",
        expr("n_chars * 1000000L div n_bpe_tokens"))
      .withColumn("tokens_per_word_micros",
        expr("n_bpe_tokens * 1000000L div n_words"))

  /** DuckDB oracle for learn-then-[[applyBpeMerges]]: the same unrolled
    * round CTEs, but the word table carries (doc_id, pos) so the final
    * state w{rounds} — which IS the applied segmentation — can be
    * re-aggregated per document, including the order-sensitive seg_hash.
    */
  def bpeApplyOracleSql(rounds: Int): String = {
    require(rounds >= 1)
    val w0 =
      """w0 AS (SELECT doc_id, pr.pos AS pos,
        |    ' ' || array_to_string(list_transform(range(1, len(pr.tok) + 1), i -> pr.tok[i]), '  ') || ' ' AS w
        |  FROM (SELECT doc_id, unnest(list_transform(range(1, len(toks) + 1), i -> struct_pack(pos := i, tok := toks[i]))) AS pr
        |        FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents))
        |  WHERE len(pr.tok) > 0)""".stripMargin
    val roundsSql = (1 to rounds).map { r =>
      s"""p$r AS (SELECT pr.l AS lhs, pr.r AS rhs, count(*) AS c
         |  FROM (SELECT unnest(list_transform(range(1, len(s)), i -> struct_pack(l := s[i], r := s[i + 1]))) AS pr
         |        FROM (SELECT string_split(trim(w), '  ') AS s FROM w${r - 1}))
         |  GROUP BY 1, 2),
         |t$r AS (SELECT lhs, rhs, c FROM p$r ORDER BY c DESC, lhs, rhs LIMIT 1),
         |w$r AS (SELECT doc_id, pos, replace(w, ' ' || t$r.lhs || '  ' || t$r.rhs || ' ', ' ' || t$r.lhs || t$r.rhs || ' ') AS w
         |  FROM w${r - 1}, t$r)""".stripMargin
    }.mkString(",\n")
    s"""WITH $w0,
       |$roundsSql
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(len(replace(trim(w), ' ', ''))) AS BIGINT) AS n_chars,
       |  CAST(sum(len(string_split(trim(w), '  '))) AS BIGINT) AS n_bpe_tokens,
       |  md5(string_agg(trim(w), ' | ' ORDER BY pos)) AS seg_hash
       |FROM w$rounds GROUP BY 1""".stripMargin
  }

  /** DuckDB oracle for [[tokenizerFertility]]: the [[bpeApplyOracleSql]]
    * per-doc table re-aggregated by the grouping column (DuckDB nests the
    * inner WITH inside the CTE body).
    */
  def fertilityOracleSql(rounds: Int, groupCol: String = "lang"): String =
    s"""WITH per AS (${bpeApplyOracleSql(rounds)})
       |SELECT d.$groupCol AS $groupCol, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(per.n_words) AS BIGINT) AS n_words,
       |  CAST(sum(per.n_chars) AS BIGINT) AS n_chars,
       |  CAST(sum(per.n_bpe_tokens) AS BIGINT) AS n_bpe_tokens,
       |  CAST(sum(per.n_chars) * 1000000 // sum(per.n_bpe_tokens) AS BIGINT) AS chars_per_token_micros,
       |  CAST(sum(per.n_bpe_tokens) * 1000000 // sum(per.n_words) AS BIGINT) AS tokens_per_word_micros
       |FROM per JOIN documents d USING (doc_id) GROUP BY 1""".stripMargin
}
