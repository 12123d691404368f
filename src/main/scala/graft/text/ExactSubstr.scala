package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed ExactSubstr duplicated-span coverage (Lee et al. 2022,
  * "Deduplicating Training Data Makes Language Models Better", §4.1) via
  * PREFIX-DOUBLING suffix classes — the hash-free exact sibling of
  * [[CorpusCuration.duplicatedSpanCoverage]] (whose stride-1 k-grams are
  * compared through md5; collision probability is negligible but not
  * zero, and the gram strings themselves are shuffled).
  *
  * The Manber–Myers/DC-style observation, restricted to what dedup needs:
  * suffix-array construction needs ORDERED ranks (a global sort per
  * round — the thing that does not distribute), but duplicate detection
  * only needs EQUALITY classes. Equality classes double with a keyed
  * groupBy: class id of the 2k-token prefix at position p = any
  * canonical representative of the pair (id_k(p), id_k(p+k)) — here
  * min over the group of the packed (doc, pos) position, which is
  * deterministic, injective per class, and needs one shuffle keyed on
  * the pair. log₂(L) rounds replace the global sort entirely; every
  * shuffle is corpus-positions-sized with 3-long rows (no token strings
  * after round 1), so the 100 TB shape is log₂(L) keyed shuffles of
  * ~24 bytes/token — the same scale class as the k-gram hash pass, with
  * exactness instead of a collision argument.
  *
  * For a window length L that is not a power of two, the standard
  * overlap trick finishes the job: with h = the largest power of two
  * ≤ L, the L-token window at p is identified by the pair
  * (id_h(p), id_h(p + L − h)) — the two h-prefixes overlap but together
  * determine exactly tokens p … p+L−1. Short suffixes (fewer than k
  * tokens remaining) carry a −1 sentinel component and can never equal
  * a full-length class, so padding never conflates windows.
  *
  * Output contract is [[CorpusCuration.duplicatedSpanCoverage]]'s:
  * (keyCol, n_tokens, n_dup_spans, covered_tokens, dup_micros) over docs
  * with ≥ L tokens — covered tokens from the same doc-partitioned
  * LEAD-merge of duplicated window starts. The two operators implement
  * the same semantics through disjoint algorithms, which
  * ExactSubstrSpec exploits as a cross-check.
  */
object ExactSubstr {

  /** Packed position: doc_id · 2²⁰ + pos. Injective while docs stay under
    * 2²⁰ tokens (a million-token document is not a training document);
    * [[adjacentLcpPairs]]/[[maxDupSpanExact]] — which compute the corpus
    * max doc length anyway — assert it loudly.
    */
  private val PosBits = 20

  /** Loud-failure guard on the packed-position injectivity bound: a
    * ≥ 2²⁰-token doc entering [[suffixClassRounds]]/[[orderedSuffixRounds]]
    * directly would silently alias pk values. One per-doc check,
    * filter-hosted so column pruning cannot drop it.
    */
  private def guardDocLen(tokenized: DataFrame): DataFrame =
    tokenized.filter(expr(s"assert_true(size(tokens) < ${1L << PosBits}, " +
      "'ExactSubstr: document exceeds the 2^20-token packed-position bound') IS NULL"))

  /** (keyCol, pos, len, pk, id) — equality-class ids for token-prefixes of
    * length min(`prefixLen`, tokens remaining); `prefixLen` must be a
    * power of two. pos is 1-based; len is the doc's token count.
    */
  def suffixClasses(docs: DataFrame, keyCol: String, textCol: String = "text",
      prefixLen: Int = 8): DataFrame =
    suffixClassRounds(docs, keyCol, textCol, prefixLen).last._2

  /** Every doubling round: Seq of (prefix length, class frame) for
    * lengths 1, 2, 4, …, `prefixLen` — callers that need the whole
    * ladder (e.g. [[maxPow2DupLen]]) reuse one pass instead of
    * re-doubling per length.
    */
  def suffixClassRounds(docs: DataFrame, keyCol: String,
      textCol: String = "text",
      prefixLen: Int = 8): Seq[(Int, DataFrame)] = {
    require(prefixLen >= 1 && (prefixLen & (prefixLen - 1)) == 0,
      s"prefixLen must be a power of two: $prefixLen")
    val p0 = guardDocLen(TextAnalysis.withTokens(docs, textCol)
      .filter(size(col("tokens")) > 0))
      .select(col(keyCol), size(col("tokens")).cast("long").as("len"),
        posexplode(col("tokens")).as(Seq("pos0", "tok")))
      .select(col(keyCol), (col("pos0") + 1).cast("long").as("pos"), col("len"),
        (col(keyCol).cast("long") * (1L << PosBits) + col("pos0") + 1).as("pk"),
        col("tok"))
    // round 1: class = the token itself, represented by its min position
    val ids1 = p0.groupBy("tok").agg(min("pk").as("id"))
    var r = p0.join(ids1, Seq("tok"))
      .select(col(keyCol), col("pos"), col("len"), col("pk"), col("id"))
      .localCheckpoint()
    val rounds = scala.collection.mutable.ArrayBuffer[(Int, DataFrame)]((1, r))
    var k = 1
    while (k < prefixLen) {
      // class(2k)(p) = representative of (class(k)(p), class(k)(p+k));
      // a missing right half (suffix shorter than 2k) is the -1 sentinel
      // class, distinct from every real class by construction (pk >= 0)
      val right = r.select(col(keyCol), (col("pos") - k).as("pos"),
        col("id").as("_ib"))
      val paired = r.join(right, Seq(keyCol, "pos"), "left")
        .withColumn("_ib", coalesce(col("_ib"), lit(-1L)))
      val ids = paired.groupBy("id", "_ib").agg(min("pk").as("_nid"))
      r = paired.join(ids, Seq("id", "_ib"))
        .select(col(keyCol), col("pos"), col("len"), col("pk"),
          col("_nid").as("id"))
        .localCheckpoint() // truncate per round (the kCore pattern)
      k *= 2
      rounds += ((k, r))
    }
    rounds.toSeq
  }

  /** Longest-duplicated-span bracket per document (the longest-match
    * statistic ExactSubstr work reports): the maximal power-of-two h
    * such that the doc contains a FULL h-token window whose equality
    * class occurs more than once anywhere in the corpus. The true
    * maximal duplicated span length M satisfies
    * max_dup_pow2 ≤ M ≤ 2·max_dup_pow2 − 1 (a duplicated M-window
    * contains a duplicated h-window for every h ≤ M; were M ≥ 2h, the
    * 2h round would have fired): an exactly-defined statistic that
    * BRACKETS M within a factor of two, from the same doubling ladder
    * [[duplicatedSpanCoverageExact]] already runs — no extra rounds,
    * one count-per-class aggregate per ladder step. 0 when nothing
    * (not even a single token) recurs.
    *
    * Output: (keyCol, n_tokens, max_dup_pow2).
    */
  def maxPow2DupLen(docs: DataFrame, keyCol: String, textCol: String = "text",
      maxLen: Int = 64,
      rounds: Option[Seq[(Int, DataFrame)]] = None): DataFrame = {
    val ladder = rounds.map(_.filter(_._1 <= maxLen)
        .map { case (h, df) => (h, df.withColumnRenamed("rank", "id")) })
      .getOrElse(suffixClassRounds(docs, keyCol, textCol, maxLen))
    val flags = ladder.map { case (h, r) =>
      val full = r.filter(col("pos") + (h - 1) <= col("len"))
      val dup = full.groupBy("id").agg(count(lit(1)).as("_n"))
        .filter(col("_n") > 1).select("id")
      full.join(dup, Seq("id"))
        .select(col(keyCol)).distinct()
        .withColumn("h", lit(h.toLong))
    }.reduce(_ unionByName _)
    TextAnalysis.withTokens(docs, textCol)
      .filter(size(col("tokens")) > 0)
      .select(col(keyCol), size(col("tokens")).cast("long").as("n_tokens"))
      .join(flags.groupBy(keyCol).agg(max("h").as("max_dup_pow2")),
        Seq(keyCol), "left")
      .na.fill(0L, Seq("max_dup_pow2"))
  }

  /** Dense 0-based index of `df`'s rows in (orderCols) order — the
    * distributed substitute for a global dense_rank window: one
    * range-partitioned sort + RDD zipWithIndex (two passes, no
    * single-task stage). Deterministic whenever (orderCols) is a total
    * order on the rows: the index is the row's position in the total
    * order, independent of partition boundaries.
    */
  private def denseIndex(df: DataFrame, orderCols: Seq[String],
      out: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val spark = df.sparkSession
    val sorted = df.orderBy(orderCols.map(col): _*)
    val schema = StructType(sorted.schema.fields :+
      StructField(out, LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
    }
    spark.createDataFrame(rdd, schema)
  }

  /** ORDER-PRESERVING suffix ranks by prefix doubling — the full
    * distributed suffix-array construction ([[suffixClassRounds]] gives
    * equality only; this also gives lexicographic ORDER): each round
    * sorts the distinct (rankₖ(p), rankₖ(p+k)) pairs with a distributed
    * range-partitioned sort and assigns dense indices via
    * [[denseIndex]]. The −1 sentinel for a missing right half sorts
    * below every real rank, which is exactly the end-of-string
    * terminator convention (a shorter suffix that is a prefix of a
    * longer one sorts first). After the round at h ≥ the longest doc's
    * token count, equal rank ⟺ identical suffix and rank order ⟺
    * lexicographic suffix order.
    */
  def orderedSuffixRounds(docs: DataFrame, keyCol: String,
      textCol: String = "text", prefixLen: Int): Seq[(Int, DataFrame)] = {
    require(prefixLen >= 1 && (prefixLen & (prefixLen - 1)) == 0,
      s"prefixLen must be a power of two: $prefixLen")
    val p0 = guardDocLen(TextAnalysis.withTokens(docs, textCol)
      .filter(size(col("tokens")) > 0))
      .select(col(keyCol), size(col("tokens")).cast("long").as("len"),
        posexplode(col("tokens")).as(Seq("pos0", "tok")))
      .select(col(keyCol), (col("pos0") + 1).cast("long").as("pos"), col("len"),
        (col(keyCol).cast("long") * (1L << PosBits) + col("pos0") + 1).as("pk"),
        col("tok"))
    val t1 = denseIndex(p0.select("tok").distinct(), Seq("tok"), "rank")
    var r = p0.join(t1, Seq("tok"))
      .select(col(keyCol), col("pos"), col("len"), col("pk"), col("rank"))
      .localCheckpoint()
    val rounds = scala.collection.mutable.ArrayBuffer[(Int, DataFrame)]((1, r))
    var k = 1
    while (k < prefixLen) {
      val right = r.select(col(keyCol), (col("pos") - k).as("pos"),
        col("rank").as("_rb"))
      val paired = r.join(right, Seq(keyCol, "pos"), "left")
        .withColumn("_rb", coalesce(col("_rb"), lit(-1L)))
      val keys = denseIndex(paired.select("rank", "_rb").distinct(),
        Seq("rank", "_rb"), "_nr")
      r = paired.join(keys, Seq("rank", "_rb"))
        .select(col(keyCol), col("pos"), col("len"), col("pk"),
          col("_nr").as("rank"))
        .localCheckpoint()
      k *= 2
      rounds += ((k, r))
    }
    rounds.toSeq
  }

  /** EXACT longest duplicated span per document — the full ExactSubstr
    * longest-match statistic ([[maxPow2DupLen]] gives its power-of-two
    * bracket): M(doc) = max length of a token window in the doc whose
    * content occurs at least twice anywhere in the corpus.
    *
    * Algorithm (all distributed, no single-task stage):
    *  1. ordered suffix ranks ([[orderedSuffixRounds]]) up to the
    *     corpus's longest doc (next power of two — one bounded scalar
    *     aggregate decides the ladder height);
    *  2. the suffix ARRAY = positions dense-indexed by (final rank, pk)
    *     — ties (identical suffixes) ordered by packed position, the
    *     same tie-break a lexicographic (suffix, doc, pos) sort gives;
    *  3. adjacent pairs by index (idx+1 self-join — the distributed
    *     lead());
    *  4. LCP of each adjacent pair by BINARY DESCENT over the rank
    *     ladder: for h from the top, advance both cursors by h when
    *     both windows are full and their rank_h matches (any LCP value
    *     < 2·ladder-top is a sum of distinct powers, so one pass
    *     suffices);
    *  5. maxmatch(suffix) = max LCP against its sorted neighbors (the
    *     classic suffix-array property: the lexicographic neighbor
    *     maximizes LCP), M(doc) = max over the doc's suffixes.
    *
    * Output: (keyCol, n_tokens, max_dup_span);
    * max_dup_span ∈ [bracket, 2·bracket − 1] vs [[maxPow2DupLen]].
    */
  def maxDupSpanExact(docs: DataFrame, keyCol: String,
      textCol: String = "text",
      prebuilt: Option[Seq[(Int, DataFrame)]] = None): DataFrame =
    maxDupSpanFromPairs(docs, keyCol, textCol,
      adjacentLcpPairs(docs, keyCol, textCol, prebuilt))

  /** [[maxDupSpanExact]]'s aggregation tail over a prebuilt (possibly
    * materialized) [[adjacentLcpPairs]] frame — the suffix-LCP pair
    * table is a standing corpus artifact the way the pair graph is.
    */
  def maxDupSpanFromPairs(docs: DataFrame, keyCol: String,
      textCol: String, pairs: DataFrame): DataFrame = {
    val mm = pairs.select(col("ka").as(keyCol), col("lcp"))
      .unionByName(pairs.select(col("kb").as(keyCol), col("lcp")))
      .groupBy(keyCol).agg(max("lcp").as("max_dup_span"))
    TextAnalysis.withTokens(docs, textCol)
      .filter(size(col("tokens")) > 0)
      .select(col(keyCol), size(col("tokens")).cast("long").as("n_tokens"))
      .join(mm, Seq(keyCol), "left")
      .na.fill(0L, Seq("max_dup_span"))
  }

  /** Adjacent-suffix LCP pairs (ka, pa, kb, pb, lcp) — the shared core
    * of [[maxDupSpanExact]] and the corpus LCP distribution: suffix
    * array order + binary-descent LCP (see [[maxDupSpanExact]] for the
    * construction).
    */
  def adjacentLcpPairs(docs: DataFrame, keyCol: String,
      textCol: String = "text",
      prebuilt: Option[Seq[(Int, DataFrame)]] = None): DataFrame = {
    val toks = TextAnalysis.withTokens(docs, textCol)
      .filter(size(col("tokens")) > 0)
    val maxLen = toks.agg(max(size(col("tokens")))).head.getInt(0)
    require(maxLen < (1 << PosBits),
      s"packed-position contract: longest doc $maxLen >= 2^$PosBits tokens")
    val upTo = Integer.highestOneBit(math.max(1, maxLen)) *
      (if (Integer.bitCount(math.max(1, maxLen)) == 1) 1 else 2)
    prebuilt.foreach(r => require(r.last._1 >= upTo,
      s"provided ladder top ${r.last._1} < required $upTo (longest doc $maxLen)"))
    val rounds = prebuilt.getOrElse(
      orderedSuffixRounds(docs, keyCol, textCol, upTo))
    val last = rounds.last._2
    val suff = denseIndex(last.select(col(keyCol), col("pos"), col("len"),
      col("pk"), col("rank")), Seq("rank", "pk"), "idx")
    var pairs = suff.select(col(keyCol).as("ka"), col("pos").as("pa"),
        col("len").as("la"), col("idx"))
      .join(suff.select(col(keyCol).as("kb"), col("pos").as("pb"),
        col("len").as("lb"), (col("idx") - 1).as("idx")), Seq("idx"))
      .select("ka", "pa", "la", "kb", "pb", "lb")
      .withColumn("lcp", lit(0L))
      .withColumn("pa0", col("pa")).withColumn("pb0", col("pb"))
      .localCheckpoint()
    rounds.reverse.foreach { case (h, rh) =>
      val ca = rh.select(col(keyCol).as("ka"), col("pos").as("pa"),
        col("rank").as("_ra"))
      val cb = rh.select(col(keyCol).as("kb"), col("pos").as("pb"),
        col("rank").as("_rb2"))
      pairs = pairs
        .join(ca, Seq("ka", "pa"), "left")
        .join(cb, Seq("kb", "pb"), "left")
        .withColumn("_adv",
          col("pa") + (h - 1) <= col("la") && col("pb") + (h - 1) <= col("lb") &&
            col("_ra").isNotNull && col("_rb2").isNotNull &&
            col("_ra") === col("_rb2"))
        .withColumn("lcp", when(col("_adv"), col("lcp") + h).otherwise(col("lcp")))
        .withColumn("pa", when(col("_adv"), col("pa") + h).otherwise(col("pa")))
        .withColumn("pb", when(col("_adv"), col("pb") + h).otherwise(col("pb")))
        .drop("_ra", "_rb2")
        .localCheckpoint()
    }
    pairs.select(col("ka"), col("pa0").as("pa"), col("kb"),
      col("pb0").as("pb"), col("lcp"))
  }

  /** Corpus LCP distribution: log₂ histogram of adjacent-suffix LCPs —
    * the dedup-health diagnostic the suffix array gives for free (a
    * heavy right tail = long exact repeats = candidates for ExactSubstr
    * removal; mass at 0-1 = healthy novelty). bucket 0 = lcp 0,
    * bucket b ≥ 1 covers [2^(b−1), 2^b). Output: (bucket, cnt).
    */
  def lcpHistogram(docs: DataFrame, keyCol: String,
      textCol: String = "text",
      prebuilt: Option[Seq[(Int, DataFrame)]] = None): DataFrame =
    lcpHistogramFromPairs(adjacentLcpPairs(docs, keyCol, textCol, prebuilt))

  /** [[lcpHistogram]]'s aggregation over a prebuilt pairs frame. */
  def lcpHistogramFromPairs(pairs: DataFrame): DataFrame =
    pairs
      .select(expr(
        "CAST(CASE WHEN lcp <= 0 THEN 0 ELSE length(bin(lcp)) END AS BIGINT)")
        .as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))

  /** DuckDB oracle for [[lcpHistogram]]: the independent string-suffix
    * sort + first-mismatch LCP (the [[maxDupSpanOracleSql]] core) with
    * the bit-length bucket of the q_loghist/q_degdist convention.
    */
  def lcpHistogramOracleSql: String =
    """WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
      |s AS (SELECT doc_id, pos, toks[pos:] AS suf
      |      FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS pos FROM d WHERE len(toks) > 0)),
      |o AS (SELECT doc_id, pos, suf, row_number() OVER (ORDER BY suf, doc_id, pos) AS idx FROM s),
      |p AS (SELECT a.suf AS sa, b.suf AS sb
      |      FROM o a JOIN o b ON b.idx = a.idx + 1),
      |l AS (SELECT
      |        CAST(coalesce(
      |          nullif(list_position(list_transform(range(1, least(len(sa), len(sb)) + 1),
      |            i -> sa[i] = sb[i]), false), 0) - 1,
      |          least(len(sa), len(sb))) AS BIGINT) AS lcp
      |      FROM p)
      |SELECT CAST(CASE WHEN lcp <= 0 THEN 0 ELSE length(bin(lcp)) END AS BIGINT) AS bucket,
      |  CAST(count(*) AS BIGINT) AS cnt
      |FROM l GROUP BY 1""".stripMargin

  /** DuckDB oracle for [[maxDupSpanExact]] — an INDEPENDENT algorithm:
    * materialize the token-list suffixes, sort them lexicographically
    * (DuckDB list comparison is element-wise — identical semantics to
    * the rank order incl. the shorter-prefix-first terminator), take
    * adjacent pairs with the same (suffix, doc, pos) tie-break, LCP via
    * first-mismatch position, max per doc.
    */
  def maxDupSpanOracleSql: String =
    """WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
      |s AS (SELECT doc_id, pos, toks[pos:] AS suf
      |      FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS pos FROM d WHERE len(toks) > 0)),
      |o AS (SELECT doc_id, pos, suf, row_number() OVER (ORDER BY suf, doc_id, pos) AS idx FROM s),
      |p AS (SELECT a.doc_id AS da, a.suf AS sa, b.doc_id AS db, b.suf AS sb
      |      FROM o a JOIN o b ON b.idx = a.idx + 1),
      |l AS (SELECT da, db,
      |        CAST(coalesce(
      |          nullif(list_position(list_transform(range(1, least(len(sa), len(sb)) + 1),
      |            i -> sa[i] = sb[i]), false), 0) - 1,
      |          least(len(sa), len(sb))) AS BIGINT) AS lcp
      |      FROM p),
      |mm AS (SELECT da AS doc_id, lcp FROM l UNION ALL SELECT db, lcp FROM l)
      |SELECT d.doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
      |  coalesce(max(mm.lcp), 0) AS max_dup_span
      |FROM d LEFT JOIN mm ON mm.doc_id = d.doc_id
      |WHERE len(toks) > 0
      |GROUP BY 1, 2""".stripMargin

  /** DuckDB oracle for [[maxPow2DupLen]]: per ladder length h the
    * independent md5 h-gram formulation (same answer as the suffix
    * classes absent md5 collisions — the q_dupspan caveat), union, max.
    */
  def maxPow2OracleSql(maxLen: Int = 64): String = {
    val hs = Iterator.iterate(1)(_ * 2).takeWhile(_ <= maxLen).toSeq
    val blocks = hs.map { h =>
      s"""g$h AS (SELECT doc_id, md5(array_to_string(toks[s : s + ${h - 1}], ' ')) AS gh
         |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - ${h - 2})) AS s
         |        FROM d WHERE len(toks) >= $h)),
         |d$h AS (SELECT gh FROM g$h GROUP BY 1 HAVING count(*) > 1),
         |f$h AS (SELECT DISTINCT doc_id, CAST($h AS BIGINT) AS h
         |  FROM g$h JOIN d$h USING (gh))""".stripMargin
    }.mkString(",\n")
    val unions = hs.map(h => s"SELECT doc_id, h FROM f$h").mkString("\nUNION ALL ")
    s"""WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents),
       |$blocks,
       |fl AS ($unions)
       |SELECT d.doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
       |  coalesce(max(fl.h), 0) AS max_dup_pow2
       |FROM d LEFT JOIN fl ON fl.doc_id = d.doc_id
       |WHERE len(toks) > 0
       |GROUP BY 1, 2""".stripMargin
  }

  /** Duplicated L-window start positions (keyCol, pos): every position
    * whose L-token window occurs at least twice anywhere in the corpus —
    * the shared core of span coverage ([[duplicatedSpanCoverageExact]])
    * and span removal ([[removeDuplicatedSpans]]). Window identity is
    * the (h-prefix class at p, h-prefix class at p + L − h) pair with
    * h = the highest power of two ≤ L; both halves are full h-prefixes
    * whenever the window fits (pos + L − 1 ≤ len), so the pair equals
    * the L-gram exactly.
    */
  private def dupWindowStarts(docs: DataFrame, keyCol: String,
      textCol: String, L: Int,
      rounds: Option[Seq[(Int, DataFrame)]]): DataFrame = {
    require(L > 1, "span size must be > 1")
    val h = Integer.highestOneBit(L)
    // a prebuilt ladder (e.g. the session-materialized ORDERED ladder —
    // ordered ranks are equality classes too) supplies level h; else
    // build the equality ladder live
    val r = rounds.map(_.find(_._1 == h).getOrElse(throw new IllegalArgumentException(
        s"provided ladder lacks level $h")). _2)
      .getOrElse(suffixClasses(docs, keyCol, textCol, h))
      .withColumnRenamed("rank", "id") // ordered ladders name it rank
    val off = L - h
    val right = r.select(col(keyCol), (col("pos") - off).as("pos"),
      col("id").as("_ib"))
    val wins =
      (if (off == 0) r.withColumn("_ib", col("id"))
       else r.join(right, Seq(keyCol, "pos")))
        .filter(col("pos") + (L - 1) <= col("len"))
        .select(col(keyCol), col("pos"), col("id").as("_ia"), col("_ib"))
    val dup = wins.groupBy("_ia", "_ib").agg(count(lit(1)).as("_n"))
      .filter(col("_n") > 1).select("_ia", "_ib")
    wins.join(dup, Seq("_ia", "_ib")).select(col(keyCol), col("pos"))
  }

  /** Exact duplicated-span coverage at window length `L` — positions
    * covered by an L-token window occurring more than once anywhere in
    * the corpus, merged per doc. See object doc for the contract.
    */
  def duplicatedSpanCoverageExact(docs: DataFrame, keyCol: String,
      textCol: String = "text", L: Int = 13,
      rounds: Option[Seq[(Int, DataFrame)]] = None): DataFrame =
    coverageFromStarts(docs, keyCol, textCol, L,
      dupWindowStarts(docs, keyCol, textCol, L, rounds))

  /** The shared coverage tail: LEAD-merge duplicated window starts into
    * per-doc covered-token counts over docs with ≥ L tokens. `starts` is
    * (keyCol, pos) — from [[dupWindowStarts]] (whole-corpus path) or the
    * incremental batch-vs-corpus path.
    */
  private def coverageFromStarts(docs: DataFrame, keyCol: String,
      textCol: String, L: Int, starts: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy("pos")
    val cov = starts
      .withColumn("_next", lead(col("pos"), 1).over(w))
      .withColumn("_c", when(col("_next").isNull, lit(L.toLong))
        .otherwise(least(lit(L.toLong), col("_next") - col("pos"))))
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n_dup_spans"), sum(col("_c")).as("covered_tokens"))
    TextAnalysis.withTokens(docs, textCol)
      .filter(size(col("tokens")) >= L)
      .select(col(keyCol), size(col("tokens")).cast("long").as("n_tokens"))
      .join(cov, Seq(keyCol), "left")
      .na.fill(0L, Seq("n_dup_spans", "covered_tokens"))
      .withColumn("dup_micros", expr(
        """CAST(floor(CAST(covered_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE)
          |  * 1e6 + 0.5) AS BIGINT)""".stripMargin))
  }

  /** Remove every token covered by a duplicated L-window — the actual
    * ExactSubstr dedup TRANSFORM (Lee et al. 2022 §4.2 cut the spans;
    * the coverage statistic above only measures them). All copies of a
    * duplicated span are removed (the paper's choice: the text
    * reappearing verbatim elsewhere is boilerplate wherever it sits);
    * remaining tokens are reassembled in position order.
    *
    * Output: (keyCol, n_tokens, kept_tokens, removed_tokens,
    * clean_text) for every doc with ≥ 1 token — a fully-duplicated doc
    * keeps 0 tokens and an empty clean_text (the downstream length gate
    * drops it).
    *
    * Scale shape: the shared [[dupWindowStarts]] pass, an explode of
    * the start positions into covered positions (× L, the shingle-
    * explode budget) + distinct, one anti-join at the token grain, and
    * a per-doc (doc-bounded) sorted reassembly.
    */
  def removeDuplicatedSpans(docs: DataFrame, keyCol: String,
      textCol: String = "text", L: Int = 13,
      rounds: Option[Seq[(Int, DataFrame)]] = None): DataFrame =
    removalFromStarts(docs, keyCol, textCol, L,
      dupWindowStarts(docs, keyCol, textCol, L, rounds))

  /** The shared removal tail over a (keyCol, pos) duplicated-start frame
    * — from [[dupWindowStarts]] (whole-corpus path) or the incremental
    * batch-vs-corpus path ([[batchSpanRemovalVsCorpus]]). */
  private def removalFromStarts(docs: DataFrame, keyCol: String,
      textCol: String, L: Int, starts: DataFrame): DataFrame = {
    val covered = starts
      .select(col(keyCol),
        explode(expr(s"sequence(pos, pos + ${L - 1})")).as("pos"))
      .distinct()
    val toks = TextAnalysis.withTokens(docs, textCol)
      .filter(size(col("tokens")) > 0)
      .select(col(keyCol), size(col("tokens")).cast("long").as("n_tokens"),
        posexplode(col("tokens")).as(Seq("pos0", "tok")))
      .select(col(keyCol), col("n_tokens"),
        (col("pos0") + 1).cast("long").as("pos"), col("tok"))
    val kept = toks.join(covered, Seq(keyCol, "pos"), "left_anti")
      .groupBy(keyCol)
      .agg(count(lit(1)).as("kept_tokens"),
        // positions are unique per doc, so the struct sort is a total
        // order and the reassembly is deterministic; lists are
        // doc-bounded
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok")), " ").as("clean_text"))
    toks.select(col(keyCol), col("n_tokens")).distinct()
      .join(kept, Seq(keyCol), "left")
      .na.fill(0L, Seq("kept_tokens")).na.fill("", Seq("clean_text"))
      .withColumn("removed_tokens", col("n_tokens") - col("kept_tokens"))
      .select(keyCol, "n_tokens", "kept_tokens", "removed_tokens", "clean_text")
  }

  /** The shared L=13 CTE chain (three doublings 1→2→4→8 with the
    * min-packed-position class representative, the h=8/off=5 overlap
    * pair, and the duplicated-window filter) — both oracles below
    * append their tails to it.
    */
  private val chain13: String =
    """WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
      |p0 AS (SELECT doc_id, CAST(pr.pos AS BIGINT) AS pos, CAST(len(toks) AS BIGINT) AS len,
      |    doc_id * 1048576 + pr.pos AS pk, pr.tok AS tok
      |  FROM (SELECT doc_id, toks, unnest(list_transform(range(1, len(toks) + 1),
      |          i -> struct_pack(pos := i, tok := toks[i]))) AS pr
      |        FROM d WHERE len(toks) > 0)),
      |i1 AS (SELECT tok, min(pk) AS id FROM p0 GROUP BY 1),
      |r1 AS (SELECT doc_id, pos, len, pk, id FROM p0 JOIN i1 USING (tok)),
      |p2 AS (SELECT a.doc_id, a.pos, a.len, a.pk, a.id AS ia, coalesce(b.id, -1) AS ib
      |  FROM r1 a LEFT JOIN r1 b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1),
      |i2 AS (SELECT ia, ib, min(pk) AS id FROM p2 GROUP BY 1, 2),
      |r2 AS (SELECT doc_id, pos, len, pk, id FROM p2 JOIN i2 USING (ia, ib)),
      |p4 AS (SELECT a.doc_id, a.pos, a.len, a.pk, a.id AS ia, coalesce(b.id, -1) AS ib
      |  FROM r2 a LEFT JOIN r2 b ON b.doc_id = a.doc_id AND b.pos = a.pos + 2),
      |i4 AS (SELECT ia, ib, min(pk) AS id FROM p4 GROUP BY 1, 2),
      |r4 AS (SELECT doc_id, pos, len, pk, id FROM p4 JOIN i4 USING (ia, ib)),
      |p8 AS (SELECT a.doc_id, a.pos, a.len, a.pk, a.id AS ia, coalesce(b.id, -1) AS ib
      |  FROM r4 a LEFT JOIN r4 b ON b.doc_id = a.doc_id AND b.pos = a.pos + 4),
      |i8 AS (SELECT ia, ib, min(pk) AS id FROM p8 GROUP BY 1, 2),
      |r8 AS (SELECT doc_id, pos, len, pk, id FROM p8 JOIN i8 USING (ia, ib)),
      |w AS (SELECT a.doc_id, a.pos, a.id AS ia, b.id AS ib
      |  FROM r8 a JOIN r8 b ON b.doc_id = a.doc_id AND b.pos = a.pos + 5
      |  WHERE a.pos + 12 <= a.len),
      |dup AS (SELECT ia, ib FROM w GROUP BY 1, 2 HAVING count(*) > 1)""".stripMargin

  /** DuckDB oracle for [[duplicatedSpanCoverageExact]] at L = 13: the
    * shared [[chain13]] doublings plus the same LEAD-merge coverage
    * tail as q_dupspan's oracle.
    */
  def oracleSql13: String = chain13 +
    """,
      |cc AS (SELECT w.doc_id, w.pos, least(13, coalesce(
      |    lead(w.pos) OVER (PARTITION BY w.doc_id ORDER BY w.pos), w.pos + 13) - w.pos) AS c
      |  FROM w JOIN dup USING (ia, ib)),
      |cov AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_spans,
      |    CAST(sum(c) AS BIGINT) AS covered_tokens FROM cc GROUP BY 1),
      |n AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens
      |  FROM d WHERE len(toks) >= 13)
      |SELECT n.doc_id, n_tokens,
      |  coalesce(n_dup_spans, 0) AS n_dup_spans,
      |  coalesce(covered_tokens, 0) AS covered_tokens,
      |  CAST(floor(CAST(coalesce(covered_tokens, 0) AS DOUBLE)
      |    / CAST(n_tokens AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS dup_micros
      |FROM n LEFT JOIN cov ON n.doc_id = cov.doc_id""".stripMargin

  /** DuckDB oracle for [[removeDuplicatedSpans]] at L = 13: the shared
    * [[chain13]] doublings plus the covered-position expansion,
    * token-grain anti-join and position-ordered reassembly.
    */
  def removalOracleSql13: String = chain13 +
    """,
      |cwu AS (SELECT w.doc_id, unnest(range(w.pos, w.pos + 13)) AS pos
      |  FROM w JOIN dup USING (ia, ib)),
      |cw AS (SELECT DISTINCT doc_id, pos FROM cwu),
      |kept AS (SELECT p.doc_id, p.pos, p.tok FROM p0 p
      |  LEFT JOIN cw ON cw.doc_id = p.doc_id AND cw.pos = p.pos
      |  WHERE cw.pos IS NULL),
      |ag AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS kept_tokens,
      |    string_agg(tok, ' ' ORDER BY pos) AS clean_text FROM kept GROUP BY 1),
      |nn AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens
      |  FROM d WHERE len(toks) > 0)
      |SELECT nn.doc_id, nn.n_tokens,
      |  coalesce(ag.kept_tokens, 0) AS kept_tokens,
      |  nn.n_tokens - coalesce(ag.kept_tokens, 0) AS removed_tokens,
      |  coalesce(ag.clean_text, '') AS clean_text
      |FROM nn LEFT JOIN ag USING (doc_id)""".stripMargin

  /** Exact-substring patch over a SQL constant that must actually fire:
    * these oracles derive their batch-restricted variants by patching the
    * full-corpus constant, and formatting drift in the source would
    * otherwise turn the replace into a silent no-op — leaving the
    * UNRESTRICTED oracle registered and a confusing gate failure far
    * from the cause. */
  private def patchedSql(src: String, from: String, to: String): String = {
    val out = src.replace(from, to)
    require(out != src,
      s"oracle patch was a no-op — the source SQL no longer contains: $from")
    out
  }

  /** DuckDB oracle for [[batchSpanRemovalVsCorpus]] under the registry's
    * crawl split: the FULL-union [[removalOracleSql13]] restricted to
    * the batch docs (doc_id % 10 = 0) — duplication judged over the
    * whole union, output rows only for the batch.
    */
  def incRemovalOracleSql13: String = patchedSql(removalOracleSql13,
    "nn AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens\n" +
      "  FROM d WHERE len(toks) > 0)",
    "nn AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens\n" +
      "  FROM d WHERE len(toks) > 0 AND doc_id % 10 = 0)")

  // ===== Incremental batch-vs-corpus (standing-ladder extension) =====
  //
  // The ladder's position rows alone cannot rank NEW documents — class
  // ids are corpus-relative. What makes the standing ladder an
  // incremental INDEX is its dictionaries: the level-1 token→rank map
  // and, per doubling, the (rank_h(p), rank_h(p+h)) → rank_2h map. With
  // those, a nightly batch acquires ranks EQUALITY-consistent with the
  // corpus by pure dictionary probes (batch-sized keyed joins) — known
  // content adopts the corpus rank, novel content gets fresh ranks
  // appended above the corpus maximum. Extended ranks preserve equality
  // (equal content ⟺ equal rank, across the batch/corpus boundary), not
  // lexicographic order — sufficient for duplicate detection; a use that
  // needs ORDER (LCP descent) still requires the periodic full re-sort,
  // which is the honest rebuild-cost contract for that statistic.

  /** Level-1 token dictionary of a standing corpus ladder — (tok, rank),
    * the same dense index over distinct tokens [[orderedSuffixRounds]]
    * assigns internally (deterministic, hence materializable as standing
    * state alongside the ladder).
    */
  def corpusTokenDict(corpus: DataFrame, keyCol: String,
      textCol: String = "text"): DataFrame =
    denseIndex(
      guardDocLen(TextAnalysis.withTokens(corpus, textCol)
          .filter(size(col("tokens")) > 0))
        .select(explode(col("tokens")).as("tok")).distinct(),
      Seq("tok"), "rank")

  /** The (ra, rb) → r2 doubling dictionary implicit in a standing
    * ladder, rederived from its materialized levels h and 2h: one
    * projection + distinct over corpus positions — index-build-time
    * work paid once per level when the standing state is refreshed,
    * not a re-sort or re-rank.
    */
  def pairDictFromLadder(levelH: DataFrame, level2H: DataFrame, h: Int,
      keyCol: String): DataFrame = {
    val left = levelH.select(col(keyCol), col("pos"), col("rank").as("ra"))
    val right = levelH.select(col(keyCol), (col("pos") - h).as("pos"),
      col("rank").as("rb"))
    left.join(right, Seq(keyCol, "pos"), "left")
      .withColumn("rb", coalesce(col("rb"), lit(-1L)))
      .join(level2H.select(col(keyCol), col("pos"), col("rank").as("r2")),
        Seq(keyCol, "pos"))
      .select("ra", "rb", "r2").distinct()
  }

  private def maxOrMinus1(df: DataFrame, c: String): Long = {
    val v = df.agg(max(col(c))).head.get(0)
    if (v == null) -1L else v.asInstanceOf[Long]
  }

  /** Max rank of a dictionary column (−1 on empty) — the value
    * `knownMaxRanks` forwards so probes skip the per-level 1-row max
    * actions ([[extendLadder]]'s driver-job note). Public so callers
    * holding MATERIALIZED dicts can compute the maxima once and memoize
    * them (deterministic and bounded: one long per ladder level).
    */
  def dictMaxRank(df: DataFrame, c: String): Long = maxOrMinus1(df, c)

  /** The result of extending a standing ladder index with one batch
    * ([[extendLadder]]): `batchRounds` are the batch's per-level rank
    * frames (the probe surface — what [[batchRanksVsCorpus]] returns);
    * `rounds`/`tokenDict`/`pairDicts` are the GROWN standing index over
    * corpus ∪ batch — the same shapes that came in, so tomorrow's batch
    * extends today's extension (the nightly-maintenance loop for the
    * suffix-index family, mirroring [[graft.dedup.PairGraph.appendBatch]]
    * for the pair graph).
    */
  final case class LadderExtension(
      rounds: Seq[(Int, DataFrame)],
      tokenDict: DataFrame,
      pairDicts: Map[Int, DataFrame],
      batchRounds: Seq[(Int, DataFrame)])

  /** Extend a standing ladder index with a batch — equality-consistent
    * maintenance of the suffix-index ARTIFACTS, not just a probe: batch
    * positions acquire extended ranks by dictionary probes (novel
    * content above the standing maximum, see section note), and the
    * standing levels, token dict, and pair dicts each grow by exactly
    * the batch's contribution (levels union the batch frames; dicts
    * union the novel entries). Extension composes: extending the
    * extension with a second batch is equality-consistent with a
    * one-shot index over the whole union — every pair occurring in
    * corpus ∪ batch is either a standing entry or a novel entry added
    * here, and novel ids stay strictly above the grown maximum, so
    * probes through the grown index are exact (q_incladder's gate).
    *
    * Work: batch positions × log₂(prefixLen) keyed dictionary probes +
    * batch-sized unions. No corpus position is re-ranked or re-sorted;
    * order-needing statistics keep the priced rebuild cadence.
    *
    * The standing ladder must top out AT `prefixLen` (loud require) —
    * silently dropping higher standing levels here would hand a caller
    * who adopts the extension as new standing state a ladder that lost
    * its top rungs. Probe-only callers that want a shallower extension
    * over a taller ladder go through [[batchRanksVsCorpus]], which
    * filters the levels itself (safe there: only `batchRounds` is
    * returned, nothing standing is adopted).
    *
    * `knownMaxRanks` (level → max standing rank; level 1 = the token
    * dict's max, level 2k = pair dict 2k's max r2) skips the 1-row
    * driver `max()` actions novel-id assignment otherwise needs — a
    * persisted index records these in its commit metadata
    * ([[SuffixIndexStore]]), so the nightly probe pays zero standing
    * scans.
    */
  def extendLadder(batch: DataFrame, keyCol: String,
      textCol: String, corpusRounds: Seq[(Int, DataFrame)],
      tokenDict: DataFrame, prefixLen: Int,
      pairDicts: Map[Int, DataFrame] = Map.empty,
      knownMaxRanks: Map[Int, Long] = Map.empty): LadderExtension = {
    require(prefixLen >= 1 && (prefixLen & (prefixLen - 1)) == 0,
      s"prefixLen must be a power of two: $prefixLen")
    require(corpusRounds.isEmpty || corpusRounds.last._1 <= prefixLen,
      s"standing ladder tops out at ${corpusRounds.last._1} > prefixLen " +
        s"$prefixLen — extending would silently drop standing levels; " +
        "probe-only callers use batchRanksVsCorpus")
    val levels = corpusRounds
    val byLevel = levels.toMap
    require(byLevel.contains(prefixLen) || prefixLen == 1,
      s"standing ladder lacks level $prefixLen")
    // every doubling step without a materialized pairDict dereferences
    // ladder levels k and 2k — state the contract for ALL of them up
    // front, not with a bare NoSuchElementException mid-loop
    var lvl = 1
    while (lvl < prefixLen) {
      if (!pairDicts.contains(2 * lvl)) {
        require(byLevel.contains(lvl),
          s"standing ladder lacks level $lvl")
        require(byLevel.contains(2 * lvl),
          s"standing ladder lacks level ${2 * lvl}")
      }
      lvl *= 2
    }
    val p0 = guardDocLen(TextAnalysis.withTokens(batch, textCol)
      .filter(size(col("tokens")) > 0))
      .select(col(keyCol), size(col("tokens")).cast("long").as("len"),
        posexplode(col("tokens")).as(Seq("pos0", "tok")))
      .select(col(keyCol), (col("pos0") + 1).cast("long").as("pos"), col("len"),
        (col(keyCol).cast("long") * (1L << PosBits) + col("pos0") + 1).as("pk"),
        col("tok"))
    // Novel-id assignment is ORDER-FREE: a novel class's id is
    // standing-max + 1 + the class's minimum packed position (min pk is
    // injective per class — classes partition positions, the same
    // representative trick suffixClassRounds uses). Compared to a dense
    // index this (a) needs no distributed sort / zipWithIndex — the
    // whole per-level probe fuses into ONE eager job (the r checkpoint),
    // and (b) stays deterministic under re-derivation (groupBy-min), so
    // the maintenance path re-deriving the novel frames for the dict
    // growth gets identical ids. Ids are sparse (pk-ranged), which is
    // fine — ranks are only ever compared for equality and for the
    // above-standing-max adoption test; the periodic full rebuild the
    // order statistics already pay re-compacts them (see
    // [[SuffixIndexStore]]'s headroom guard).
    val maxTok = knownMaxRanks.getOrElse(1, maxOrMinus1(tokenDict, "rank"))
    val novelToks = p0.groupBy("tok").agg(min("pk").as("_mp"))
      .join(tokenDict.select("tok"), Seq("tok"), "left_anti")
      .select(col("tok"), (col("_mp") + maxTok + 1).as("rank"))
    var r = p0
      .join(tokenDict.withColumnRenamed("rank", "_rd"), Seq("tok"), "left")
      .join(novelToks.withColumnRenamed("rank", "_rn"), Seq("tok"), "left")
      .select(col(keyCol), col("pos"), col("len"), col("pk"),
        coalesce(col("_rd"), col("_rn")).as("rank"))
      // LAZY local checkpoint: still truncates lineage to a flat leaf (the
      // kCore pattern's purpose — r is referenced 4× per doubling), but
      // materializes inside the FIRST consuming action instead of its own
      // eager job: the per-level probes fuse into one job per query
      // instead of one per level (measured: the probes were job-count
      // bound, ~0.3 s fixed cost per tiny job)
      .localCheckpoint(eager = false)
    val out = scala.collection.mutable.ArrayBuffer[(Int, DataFrame)]((1, r))
    val grownDicts = scala.collection.mutable.Map.empty[Int, DataFrame]
    var k = 1
    while (k < prefixLen) {
      val dict = pairDicts.getOrElse(2 * k,
        pairDictFromLadder(byLevel(k), byLevel(2 * k), k, keyCol))
      val maxR2 = knownMaxRanks.getOrElse(2 * k, maxOrMinus1(dict, "r2"))
      val right = r.select(col(keyCol), (col("pos") - k).as("pos"),
        col("rank").as("_rb"))
      val paired = r.join(right, Seq(keyCol, "pos"), "left")
        .withColumn("_rb", coalesce(col("_rb"), lit(-1L)))
      // novel pairs: batch (rank, rb) keys the standing dict lacks,
      // id'd by min pk — `paired` appears twice in r's plan (here and
      // in the final join) but both sit on the CHECKPOINTED r, so the
      // re-derivation is a cheap self-join of materialized state, not
      // a doubling lineage
      val novelPairs = paired.groupBy("rank", "_rb").agg(min("pk").as("_mp"))
        .join(dict.select(col("ra").as("rank"), col("rb").as("_rb")),
          Seq("rank", "_rb"), "left_anti")
        .select(col("rank"), col("_rb"), (col("_mp") + maxR2 + 1).as("_rn"))
      grownDicts(2 * k) = dict.unionByName(
        novelPairs.select(col("rank").as("ra"), col("_rb").as("rb"),
          col("_rn").as("r2")))
      r = paired
        .join(dict.toDF("rank", "_rb", "_rd"), Seq("rank", "_rb"), "left")
        .join(novelPairs, Seq("rank", "_rb"), "left")
        .select(col(keyCol), col("pos"), col("len"), col("pk"),
          coalesce(col("_rd"), col("_rn")).as("rank"))
        .localCheckpoint(eager = false) // lazy: see the level-1 note
      k *= 2
      out += ((k, r))
    }
    val batchRounds = out.toSeq
    val batchByLevel = batchRounds.toMap
    LadderExtension(
      rounds = levels.map { case (h, df) => (h, df.unionByName(batchByLevel(h))) },
      tokenDict = tokenDict.unionByName(novelToks),
      pairDicts = grownDicts.toMap,
      batchRounds = batchRounds)
  }

  /** Batch suffix ranks equality-consistent with a standing corpus
    * ladder (see section note): per level 1, 2, …, `prefixLen`, the
    * batch's (keyCol, pos, len, pk, rank) frame. `pairDicts` optionally
    * injects materialized doubling dictionaries keyed by target level;
    * absent entries are derived live via [[pairDictFromLadder]].
    * The probe half of [[extendLadder]].
    *
    * A standing ladder TALLER than `prefixLen` is fine here (levels
    * above it are filtered before extension — safe because only the
    * batch's own rank frames are returned, no standing state is
    * adopted); [[extendLadder]] itself refuses that truncation.
    * `knownMaxRanks` forwards persisted per-level maxima so the probe
    * runs zero standing-dict scans (see [[extendLadder]]).
    *
    * Work: batch positions × log₂(prefixLen) keyed dictionary probes.
    * No corpus position is re-ranked or re-sorted.
    */
  def batchRanksVsCorpus(batch: DataFrame, keyCol: String,
      textCol: String, corpusRounds: Seq[(Int, DataFrame)],
      tokenDict: DataFrame, prefixLen: Int,
      pairDicts: Map[Int, DataFrame] = Map.empty,
      knownMaxRanks: Map[Int, Long] = Map.empty): Seq[(Int, DataFrame)] =
    extendLadder(batch, keyCol, textCol,
      corpusRounds.filter(_._1 <= prefixLen), tokenDict,
      prefixLen, pairDicts.filter(_._1 <= prefixLen),
      knownMaxRanks).batchRounds

  /** Grow the standing L-window occurrence counts by a batch's windows —
    * the [[corpusWindowCounts]] artifact's append: counts ADD on the
    * window identity (ia, ib), which is stable across the extension
    * because extended ranks are equality-consistent. The batch's
    * level-h frame comes from [[extendLadder]]'s `batchRounds`.
    */
  def appendWindowCounts(standing: DataFrame, batchLevelH: DataFrame,
      keyCol: String, L: Int): DataFrame =
    standing.select("ia", "ib", "ccnt")
      .unionByName(windowKeys(batchLevelH, keyCol, L)
        .groupBy("ia", "ib").agg(count(lit(1)).as("ccnt")))
      .groupBy("ia", "ib").agg(sum("ccnt").as("ccnt"))

  /** Full-L-window keys (keyCol, pos, ia, ib) from a level-h rank frame:
    * h = 2^⌊log₂L⌋, the window at p identified by (rank(p), rank(p+L−h))
    * — the standard overlap pair (see object doc).
    */
  private def windowKeys(r: DataFrame, keyCol: String, L: Int): DataFrame = {
    val h = Integer.highestOneBit(L)
    val off = L - h
    val base = r.select(col(keyCol), col("pos"), col("len"),
      col("rank").as("ia"))
    val right = r.select(col(keyCol), (col("pos") - off).as("pos"),
      col("rank").as("ib"))
    (if (off == 0) base.withColumn("ib", col("ia"))
     else base.join(right, Seq(keyCol, "pos")))
      .filter(col("pos") + (L - 1) <= col("len"))
      .select(col(keyCol), col("pos"), col("ia"), col("ib"))
  }

  /** Corpus L-window occurrence counts — (ia, ib, ccnt): the standing
    * artifact incremental coverage probes. One projection + keyed count
    * over the materialized ladder's level h, refreshed with the ladder.
    */
  def corpusWindowCounts(corpusLevelH: DataFrame, keyCol: String,
      L: Int): DataFrame =
    windowKeys(corpusLevelH, keyCol, L).groupBy("ia", "ib")
      .agg(count(lit(1)).as("ccnt"))

  /** Incremental ExactSubstr coverage: EXACTLY
    * [[duplicatedSpanCoverageExact]] over corpus ∪ batch RESTRICTED to
    * the batch docs, computed without re-ranking a single corpus
    * position. A batch L-window is duplicated iff its content occurs in
    * the standing corpus (ccnt ≥ 1 — the batch copy makes it ≥ 2 in the
    * union) or at ≥ 2 batch positions. Batch windows acquire
    * corpus-consistent identities via [[batchRanksVsCorpus]]; novel-rank
    * windows can never probe a corpus row (their ranks exceed the
    * corpus maximum), which is exactly right — novel content has no
    * corpus twin. Same LEAD-merge coverage tail as the full path.
    */
  def batchSpanCoverageVsCorpus(batch: DataFrame, keyCol: String,
      textCol: String = "text", L: Int = 13,
      corpusRounds: Seq[(Int, DataFrame)], tokenDict: DataFrame,
      corpusWinCounts: DataFrame,
      pairDicts: Map[Int, DataFrame] = Map.empty,
      knownMaxRanks: Map[Int, Long] = Map.empty): DataFrame =
    coverageFromStarts(batch, keyCol, textCol, L,
      batchDupStartsVsCorpus(batch, keyCol, textCol, L, corpusRounds,
        tokenDict, corpusWinCounts, pairDicts, knownMaxRanks))

  /** Incremental ExactSubstr REMOVAL (the Lee et al. §4.2 transform on a
    * nightly batch): EXACTLY [[removeDuplicatedSpans]] over
    * corpus ∪ batch RESTRICTED to the batch docs — the cleaning a crawl
    * pipeline actually applies to new documents before they enter the
    * corpus — from the same incremental duplicated-start core as
    * [[batchSpanCoverageVsCorpus]] (no corpus position re-ranked) and
    * the same cut/reassemble tail as the full path.
    */
  def batchSpanRemovalVsCorpus(batch: DataFrame, keyCol: String,
      textCol: String = "text", L: Int = 13,
      corpusRounds: Seq[(Int, DataFrame)], tokenDict: DataFrame,
      corpusWinCounts: DataFrame,
      pairDicts: Map[Int, DataFrame] = Map.empty,
      knownMaxRanks: Map[Int, Long] = Map.empty): DataFrame =
    removalFromStarts(batch, keyCol, textCol, L,
      batchDupStartsVsCorpus(batch, keyCol, textCol, L, corpusRounds,
        tokenDict, corpusWinCounts, pairDicts, knownMaxRanks))

  /** The shared incremental duplicated-start core: batch L-window starts
    * whose content occurs in the standing corpus (ccnt ≥ 1 — the batch
    * copy makes it ≥ 2 in the union) or at ≥ 2 batch positions. Batch
    * windows acquire corpus-consistent identities via
    * [[batchRanksVsCorpus]]; novel-rank windows can never probe a corpus
    * row (their ranks exceed the corpus maximum) — novel content has no
    * corpus twin.
    */
  private def batchDupStartsVsCorpus(batch: DataFrame, keyCol: String,
      textCol: String, L: Int, corpusRounds: Seq[(Int, DataFrame)],
      tokenDict: DataFrame, corpusWinCounts: DataFrame,
      pairDicts: Map[Int, DataFrame],
      knownMaxRanks: Map[Int, Long] = Map.empty): DataFrame = {
    val h = Integer.highestOneBit(L)
    val br = batchRanksVsCorpus(batch, keyCol, textCol, corpusRounds,
      tokenDict, h, pairDicts, knownMaxRanks).last._2
    val bw = windowKeys(br, keyCol, L)
      .localCheckpoint(eager = false) // starts + counts (lazy: extendLadder note)
    val dupKeys = bw.groupBy("ia", "ib").agg(count(lit(1)).as("bcnt"))
      .join(corpusWinCounts, Seq("ia", "ib"), "left")
      .filter(col("bcnt") >= 2 || coalesce(col("ccnt"), lit(0L)) >= 1)
      .select("ia", "ib")
    bw.join(dupKeys, Seq("ia", "ib"), "left_semi")
      .select(col(keyCol), col("pos"))
  }

  /** Incremental longest-duplicated-span BRACKET for a batch vs a
    * standing corpus ladder: EXACTLY [[maxPow2DupLen]] over
    * corpus ∪ batch RESTRICTED to the batch docs, computed without
    * re-ranking a corpus position. A full batch h-window is duplicated
    * in the union iff its content occurs in the corpus — by the
    * extension's equality consistency, iff its extended level-h rank
    * was ADOPTED from the corpus dictionaries (novel ranks sit strictly
    * above the corpus maximum, so `rank ≤ corpus max` IS the occurrence
    * test; the sentinel-chain argument in the section note makes
    * adoption by a full window imply a full corpus twin) — or at ≥ 2
    * batch positions (same-doc repeats included, as in the full path).
    * Work: the log₂(maxLen) dictionary-probe extension plus one
    * batch-sized class count per level. The ORDER-needing exact span
    * (maxDupSpanExact) keeps the priced periodic-rebuild cadence
    * (IncScaleBench ladder rows); this is the bracket statistic
    * q_maxdup registers, made incremental.
    */
  def batchMaxPow2VsCorpus(batch: DataFrame, keyCol: String,
      textCol: String = "text", corpusRounds: Seq[(Int, DataFrame)],
      tokenDict: DataFrame, maxLen: Int = 64,
      pairDicts: Map[Int, DataFrame] = Map.empty,
      knownMaxRanks: Map[Int, Long] = Map.empty): DataFrame = {
    val levels = corpusRounds.filter(_._1 <= maxLen)
    require(levels.nonEmpty && levels.last._1 == Integer.highestOneBit(maxLen),
      s"standing ladder lacks the level-$maxLen rungs")
    val byLevel = levels.toMap
    val br = batchRanksVsCorpus(batch, keyCol, textCol, levels, tokenDict,
      levels.last._1, pairDicts, knownMaxRanks)
    val flags = br.map { case (h, r) =>
      val full = r.filter(col("pos") + (h - 1) <= col("len"))
      // the corpus-max scalar: from the persisted index's commit
      // metadata when given (zero standing scans — the production probe
      // path, [[SuffixIndexStore]]), else a 1-row corpus-max broadcast
      // (the A8 scalar pattern — no collect)
      val adopted = knownMaxRanks.get(h) match {
        case Some(cm) => full.filter(col("rank") <= cm).select(col(keyCol))
        case None =>
          val corpusMax = byLevel(h).agg(max("rank").as("_cm"))
          full.crossJoin(broadcast(corpusMax))
            .filter(col("rank") <= col("_cm")).select(col(keyCol))
      }
      val dupBatch = full.groupBy("rank").agg(count(lit(1)).as("_n"))
        .filter(col("_n") > 1).select("rank")
      // no per-level distinct: the consumer is groupBy(key).max(h), for
      // which duplicate (key, h) rows are value-neutral — dropping the
      // seven per-level exchanges the distincts cost (guide §2.4)
      full.join(dupBatch, Seq("rank"), "left_semi").select(col(keyCol))
        .unionByName(adopted)
        .withColumn("h", lit(h.toLong))
    }.reduce(_ unionByName _)
    TextAnalysis.withTokens(batch, textCol)
      .filter(size(col("tokens")) > 0)
      .select(col(keyCol), size(col("tokens")).cast("long").as("n_tokens"))
      .join(flags.groupBy(keyCol).agg(max("h").as("max_dup_pow2")),
        Seq(keyCol), "left")
      .na.fill(0L, Seq("max_dup_pow2"))
  }

  /** DuckDB oracle for [[batchMaxPow2VsCorpus]] under the registry's
    * crawl split: the FULL-union [[maxPow2OracleSql]] restricted to the
    * batch docs (doc_id % 10 = 0) — a green row proves the incremental
    * bracket ≡ the full rebuild on the union, restricted to the batch.
    */
  def incMaxPow2OracleSql(maxLen: Int = 64): String =
    patchedSql(maxPow2OracleSql(maxLen),
      "WHERE len(toks) > 0",
      "WHERE len(toks) > 0 AND d.doc_id % 10 = 0")

  /** DuckDB oracle for [[batchSpanCoverageVsCorpus]] under the registry's
    * crawl split: the FULL-corpus [[oracleSql13]] chain restricted to the
    * batch docs (doc_id % 10 = 0) — a green row proves the incremental
    * path ≡ the full rebuild on the union, restricted to the batch.
    */
  def incOracleSql13: String = chain13 +
    """,
      |cc AS (SELECT w.doc_id, w.pos, least(13, coalesce(
      |    lead(w.pos) OVER (PARTITION BY w.doc_id ORDER BY w.pos), w.pos + 13) - w.pos) AS c
      |  FROM w JOIN dup USING (ia, ib) WHERE w.doc_id % 10 = 0),
      |cov AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_spans,
      |    CAST(sum(c) AS BIGINT) AS covered_tokens FROM cc GROUP BY 1),
      |n AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens
      |  FROM d WHERE len(toks) >= 13 AND doc_id % 10 = 0)
      |SELECT n.doc_id, n_tokens,
      |  coalesce(n_dup_spans, 0) AS n_dup_spans,
      |  coalesce(covered_tokens, 0) AS covered_tokens,
      |  CAST(floor(CAST(coalesce(covered_tokens, 0) AS DOUBLE)
      |    / CAST(n_tokens AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS dup_micros
      |FROM n LEFT JOIN cov ON n.doc_id = cov.doc_id""".stripMargin
}
