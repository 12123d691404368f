package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SentencePiece-style UNIGRAM-LM tokenizer (Kudo, "Subword
  * Regularization", ACL'18) — the second of the two tokenizer-learning
  * algorithms a training-data pipeline ships (the BPE merge learner is
  * [[BpeLearning]]): pieces carry probabilities, EM refines them against
  * the corpus, and segmentation is the Viterbi-best path rather than a
  * greedy merge replay.
  *
  * Distribution shape: the corpus collapses ONCE into the distinct-word
  * frequency table (the [[BpeLearning]] argument — per-round cost is
  * vocabulary-sized, not corpus-sized). Candidate generation and count
  * aggregation are relational; the per-word lattice DP (forward-backward
  * for EM, Viterbi for apply) is genuinely imperative per row, so it runs
  * as a scalar function over the word table with the MODEL-SIZED piece
  * table broadcast — the documented `mapPartitions`-as-last-resort case:
  * no shuffle is introduced, the model is bounded by `maxVocab`, and the
  * expensive object (the piece map) is built once per executor.
  *
  * Determinism contract:
  *  - model state is integer micros end-to-end: piece probabilities
  *    (Σ ≈ 1e6) and per-word expected counts are quantized to micros
  *    BEFORE the cross-word sum, so aggregation is exact long arithmetic
  *    — partitioning cannot move a result by an ulp;
  *  - inside one word the DP is a fixed sequential double loop (same
  *    order everywhere);
  *  - every selection (candidate cut, EM renormalization, Viterbi
  *    tie-break) carries a total order: candidates by (count DESC, piece
  *    ASC); Viterbi ties prefer the LONGER last piece, then the
  *    lexicographically smaller one.
  */
object UnigramLm {

  /** Distinct-word frequency table: (word, wc). */
  private[text] def wordTable(docs: DataFrame, textCol: String): DataFrame =
    TextAnalysis.withTokens(docs, textCol)
      .select(explode(col("tokens")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("wc"))

  /** Candidate piece inventory: every substring of length ≤ `maxPieceLen`
    * of every corpus word, weighted by word frequency; ALL single
    * characters are kept unconditionally (the cover guarantee — every
    * word stays segmentable), multi-char candidates are cut to the
    * `maxVocab` most frequent with the (count DESC, piece ASC) total
    * order. Initial probabilities ∝ occurrence count, in micros (≥ 1).
    * Output: (piece, cnt, p_micros).
    */
  def candidatePieces(docs: DataFrame, maxPieceLen: Int = 4,
      maxVocab: Int = 200, textCol: String = "text"): DataFrame = {
    require(maxPieceLen >= 1 && maxVocab >= 1)
    val words = wordTable(docs, textCol)
    val subs = words.select(col("wc"), explode(expr(
      s"""flatten(transform(sequence(1, length(word)),
         |  i -> transform(sequence(i, least(length(word), i + ${maxPieceLen - 1})),
         |    j -> substr(word, i, j - i + 1))))""".stripMargin)).as("piece"))
      .groupBy("piece").agg(sum("wc").as("cnt"))
    val chars = subs.filter(length(col("piece")) === 1)
    val multi = subs.filter(length(col("piece")) > 1)
      .orderBy(col("cnt").desc, col("piece")).limit(maxVocab)
    val kept = chars.unionByName(multi)
    val total = kept.agg(sum("cnt").as("_t"))
    kept.crossJoin(broadcast(total))
      .withColumn("p_micros", greatest(lit(1L), expr("cnt * 1000000L div _t")))
      .select("piece", "cnt", "p_micros")
  }

  /** Fixed-point lattice base for the EM E-step: alpha/beta masses live
    * in units of 10⁻¹⁵ (alpha(0) = 10¹⁵), each lattice term floors ONCE
    * (`alpha·p div 10⁶`) — ~15 significant digits, double-precision
    * class, but INTEGER-exact: the quantized DP is the defined engine
    * statistic, order-free (integer sums commute) and replayable
    * anywhere with 128-bit arithmetic (DuckDB HUGEINT: every
    * intermediate ≤ ~10³⁶ by the α ≤ B, Σ_l p_l ≤ 10⁶ mass bounds).
    */
  private val LatticeBase = BigInt(10).pow(15)
  private val Micros = BigInt(1000000)

  /** One EM round over the word table: E-step runs forward–backward on
    * each word's segmentation lattice against the broadcast piece model
    * in EXACT fixed-point integers ([[LatticeBase]] — no float anywhere,
    * so the round is deterministic, partition-order independent, and a
    * DuckDB oracle replays it term for term); per-piece expected counts
    * quantize once to micros (round-half-up against the word's lattice
    * mass z) and weight by word frequency; M-step renormalizes to
    * probabilities in micros. A word whose quantized z underflows to 0
    * (possible only for very long words made of rare pieces) contributes
    * nothing — identically on every replaying engine. Pieces whose
    * expected count rounds to zero keep p_micros = 1 if single-char
    * (cover guarantee) and drop otherwise — the Kudo prune, driven by
    * the data. Output: (piece, ec_micros, p_micros).
    */
  def emRound(words: DataFrame, pieces: Map[String, Long]): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(pieces)
    val maxLen = pieces.keys.map(_.length).max
    val ec = words.select(col("word"), col("wc")).as[(String, Long)]
      .flatMap { case (w, wc) =>
        val m = bc.value
        val L = w.length
        val alpha = Array.fill(L + 1)(BigInt(0)); alpha(0) = LatticeBase
        val beta = Array.fill(L + 1)(BigInt(0)); beta(L) = LatticeBase
        for (i <- 1 to L; l <- 1 to math.min(maxLen, i)) {
          m.get(w.substring(i - l, i)).foreach { p =>
            alpha(i) += alpha(i - l) * p / Micros // floor once per term
          }
        }
        for (i <- L - 1 to 0 by -1; l <- 1 to math.min(maxLen, L - i)) {
          m.get(w.substring(i, i + l)).foreach { p =>
            beta(i) += beta(i + l) * p / Micros
          }
        }
        val z = alpha(L)
        if (z.signum <= 0) Iterator.empty
        else {
          val acc = scala.collection.mutable.Map.empty[String, BigInt]
          for (i <- 0 until L; l <- 1 to math.min(maxLen, L - i)) {
            val s = w.substring(i, i + l)
            m.get(s).foreach { p =>
              // edge mass in lattice units, floored once by 10⁶ so every
              // term ≤ B² div 10⁶ = 10²⁴ and per-piece sums stay far
              // inside 128-bit for ANY word length (the replay bound)
              val t = alpha(i) * p * beta(i + l) / Micros
              if (t.signum > 0) acc(s) = acc.getOrElse(s, BigInt(0)) + t
            }
          }
          val den = (LatticeBase / Micros) * z // 10⁹·z — the e_micros unit
          acc.iterator.map { case (s, num) =>
            // E_micros = round(num / (10⁹·z)): round-half-up in integers
            (s, ((num * 2 + den) / (den * 2)).toLong * wc)
          }
        }
      }
      .toDF("piece", "ec")
      .groupBy("piece").agg(sum("ec").as("ec_micros"))
    val total = ec.agg(sum("ec_micros").as("_t"))
    ec.crossJoin(broadcast(total))
      // internal DECIMAL hop: ec·10⁶ exceeds Long past ~9·10¹² expected
      // micros (a corpus-scale round gets there); div floors, output is
      // BIGINT — no decimal column escapes (the oracle-compare contract)
      .withColumn("p_micros", expr(
        "CAST((CAST(ec_micros AS DECIMAL(28, 0)) * 1000000) div CAST(_t AS DECIMAL(28, 0)) AS BIGINT)"))
      .withColumn("p_micros",
        when(length(col("piece")) === 1, greatest(lit(1L), col("p_micros")))
          .otherwise(col("p_micros")))
      .filter(col("p_micros") >= 1L)
      .select("piece", "ec_micros", "p_micros")
  }

  /** One EM round straight from the docs under a given model — the
    * registry surface q_unigram_em oracle-gates (the last learner whose
    * refinement step was spec-only). */
  def emRoundOnDocs(docs: DataFrame, model: Map[String, Long],
      textCol: String = "text"): DataFrame =
    emRound(wordTable(docs, textCol), model)

  /** Train: candidate init + `rounds` EM refinements. Returns the final
    * (piece, ec_micros, p_micros) model table. The piece map collected to
    * the driver between rounds is MODEL-sized (≤ maxVocab + alphabet),
    * the bounded-by-contract collect this package already uses for merge
    * tables and centroids.
    */
  def trainUnigram(docs: DataFrame, rounds: Int = 2, maxPieceLen: Int = 4,
      maxVocab: Int = 200, textCol: String = "text"): DataFrame = {
    require(rounds >= 1)
    val words = wordTable(docs, textCol).localCheckpoint()
    var model = candidatePieces(docs, maxPieceLen, maxVocab, textCol)
      .select("piece", "p_micros")
    var out: DataFrame = null
    for (_ <- 1 to rounds) {
      val m = model.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      out = emRound(words, m).localCheckpoint()
      model = out.select("piece", "p_micros")
    }
    out
  }

  /** Viterbi-best segmentation of each document under a trained model:
    * per word, the min-NLL path (piece NLL = −ln(p) in micros, computed
    * once on the driver from the exact integer model — identical on every
    * executor). Output: (keyCol, n_words, n_pieces, fertility_micros,
    * seg_hash) where seg_hash digests the full in-order piece stream.
    */
  def viterbiSegment(docs: DataFrame, model: DataFrame, keyCol: String,
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    val pieces = model.select("piece", "p_micros").collect()
      .map(r => r.getString(0) ->
        math.floor(-math.log(r.getLong(1) / 1e6) * 1e6 + 0.5).toLong).toMap
    val bc = spark.sparkContext.broadcast(pieces)
    val maxLen = pieces.keys.map(_.length).max
    val seg = udf { (w: String) =>
      val m = bc.value
      val L = w.length
      val best = Array.fill(L + 1)(Long.MaxValue); best(0) = 0L
      val from = new Array[Int](L + 1)
      val via = new Array[String](L + 1)
      for (i <- 1 to L; l <- 1 to math.min(maxLen, i)) {
        val s = w.substring(i - l, i)
        m.get(s).foreach { nll =>
          if (best(i - l) != Long.MaxValue) {
            val c = best(i - l) + nll
            // total order on ties: longer last piece, then lex smaller
            val better = c < best(i) || (c == best(i) &&
              (via(i) == null || l > via(i).length ||
                (l == via(i).length && s < via(i))))
            if (better) { best(i) = c; from(i) = i - l; via(i) = s }
          }
        }
      }
      if (best(L) == Long.MaxValue) Seq.empty[String]
      else {
        var i = L
        var acc = List.empty[String]
        while (i > 0) { acc = via(i) :: acc; i = from(i) }
        acc
      }
    }
    TextAnalysis.withTokens(docs, textCol)
      .filter(size(col("tokens")) > 0)
      .select(col(keyCol), posexplode(col("tokens")).as(Seq("_ord", "word")))
      .withColumn("_pieces", seg(col("word")))
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n_words"),
        sum(size(col("_pieces")).cast("long")).as("n_pieces"),
        sort_array(collect_list(struct(col("_ord"), col("_pieces")))).as("_ps"))
      .withColumn("seg_hash",
        md5(expr("concat_ws(' ', flatten(transform(_ps, x -> x._pieces)))")))
      .withColumn("fertility_micros", expr(
        "CAST(floor(CAST(n_pieces AS DOUBLE) / CAST(n_words AS DOUBLE) * 1e6 + 0.5) AS BIGINT)"))
      .select(keyCol, "n_words", "n_pieces", "fertility_micros", "seg_hash")
  }

  /** DuckDB oracle for [[candidatePieces]]-init + [[viterbiSegment]]: the
    * candidate-piece model replayed relationally (pure integer counts,
    * same (cnt DESC, piece ASC) cut and `greatest(1, cnt·10⁶ div total)`
    * quantization), NLL conversion with the identical
    * floor(−ln(p/10⁶)·10⁶ + 0.5) micros rounding, then the per-word
    * Viterbi DP as a RECURSIVE CTE: each step appends position i's best
    * state — argmin over last-piece length l of cost(i−l) + nll(piece),
    * ties broken by (cost, −l, piece) exactly like the engine's
    * longer-then-lex-smaller rule (struct list_sort is lexicographic by
    * field order, a total order, so the [1] pick is deterministic).
    * Per-doc aggregation replays n_words/n_pieces/fertility and the
    * order-sensitive seg_hash; empty-token docs (whitespace-only text)
    * fall through the LEFT JOIN with an empty segmentation, matching the
    * engine's empty-word DP result.
    */
  def segOracleSql(maxPieceLen: Int = 4, maxVocab: Int = 200): String = {
    val lm1 = maxPieceLen - 1
    val head =
      """WITH RECURSIVE toks0 AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
        |),
        |occ AS (
        |  SELECT doc_id, pr.pos AS pos, pr.tok AS tok
        |  FROM (SELECT doc_id,
        |          unnest(list_transform(range(1, len(toks) + 1),
        |            i -> struct_pack(pos := i, tok := toks[i]))) AS pr
        |        FROM toks0 WHERE len(toks) > 0)
        |),
        |wt AS (
        |  SELECT tok AS word, count(*) AS wc FROM occ WHERE len(tok) > 0 GROUP BY 1
        |),""".stripMargin
    val model = s"""
        |subs AS (
        |  SELECT piece, CAST(sum(wc) AS BIGINT) AS cnt FROM (
        |    SELECT wc, unnest(flatten(list_transform(range(1, len(word) + 1),
        |      i -> list_transform(range(i, least(len(word), i + $lm1) + 1),
        |        j -> word[i:j])))) AS piece
        |    FROM wt) GROUP BY 1
        |),
        |kept AS (
        |  SELECT piece, cnt FROM subs WHERE len(piece) = 1
        |  UNION ALL
        |  SELECT piece, cnt FROM (SELECT piece, cnt FROM subs WHERE len(piece) > 1
        |    ORDER BY cnt DESC, piece LIMIT $maxVocab)
        |),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM kept),
        |nll AS (
        |  SELECT piece,
        |    CAST(floor(-ln(greatest(1, cnt * 1000000 // t) / 1000000.0) * 1e6 + 0.5) AS BIGINT) AS nll
        |  FROM kept, tot
        |),
        |mp AS (SELECT map(list(piece), list(nll)) AS m FROM nll),""".stripMargin



  val dp = s"""
        |rec AS (
        |  SELECT word, 0 AS i,
        |    [struct_pack(c := CAST(0 AS BIGINT), negl := CAST(0 AS BIGINT), piece := '', seg := '')] AS st
        |  FROM (SELECT word FROM wt)
        |  UNION ALL
        |  SELECT word, i + 1,
        |    list_append(st, list_sort(list_filter(list_transform(range(1, least($maxPieceLen, i + 1) + 1),
        |          l -> struct_pack(
        |            c := st[i + 2 - l].c + map_extract(mp.m, word[i + 2 - l : i + 1])[1],
        |            negl := -l,
        |            piece := word[i + 2 - l : i + 1],
        |            seg := CASE WHEN i + 1 - l = 0 THEN word[i + 2 - l : i + 1]
        |                        ELSE st[i + 2 - l].seg || ' ' || word[i + 2 - l : i + 1] END)),
        |          x -> x.c IS NOT NULL))[1])
        |  FROM rec, mp
        |  WHERE i < len(word)
        |),
        |fin AS (
        |  SELECT word, st[len(word) + 1].seg AS seg,
        |    CAST(len(string_split(st[len(word) + 1].seg, ' ')) AS BIGINT) AS np
        |  FROM rec WHERE i = len(word)
        |),
        |j AS (
        |  SELECT occ.doc_id, occ.pos,
        |    coalesce(f.seg, '') AS seg, coalesce(f.np, 0) AS np
        |  FROM occ LEFT JOIN fin f ON f.word = occ.tok
        |)
        |SELECT doc_id,
        |  CAST(count(*) AS BIGINT) AS n_words,
        |  CAST(sum(np) AS BIGINT) AS n_pieces,
        |  CAST(floor(CAST(sum(np) AS DOUBLE) / CAST(count(*) AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS fertility_micros,
        |  md5(string_agg(seg, ' ' ORDER BY pos)) AS seg_hash
        |FROM j GROUP BY 1""".stripMargin
    head + model + dp
  }

  /** Shared oracle head: tokenization, word table, candidate-init model
    * in micros ([[segOracleSql]]'s replay), plus the model-independent
    * (position, length) grid the edge-mass scan reuses every round. */
  private def emHeadSql: String =
    """WITH RECURSIVE toks0 AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
      |),
      |occ AS (
      |  SELECT doc_id, pr.pos AS pos, pr.tok AS tok
      |  FROM (SELECT doc_id,
      |          unnest(list_transform(range(1, len(toks) + 1),
      |            i -> struct_pack(pos := i, tok := toks[i]))) AS pr
      |        FROM toks0 WHERE len(toks) > 0)
      |),
      |wt AS (
      |  SELECT tok AS word, count(*) AS wc FROM occ WHERE len(tok) > 0 GROUP BY 1
      |),
      |subs AS (
      |  SELECT piece, CAST(sum(wc) AS BIGINT) AS cnt FROM (
      |    SELECT wc, unnest(flatten(list_transform(range(1, len(word) + 1),
      |      i -> list_transform(range(i, least(len(word), i + 3) + 1),
      |        j -> word[i:j])))) AS piece
      |    FROM wt) GROUP BY 1
      |),
      |kept AS (
      |  SELECT piece, cnt FROM subs WHERE len(piece) = 1
      |  UNION ALL
      |  SELECT piece, cnt FROM (SELECT piece, cnt FROM subs WHERE len(piece) > 1
      |    ORDER BY cnt DESC, piece LIMIT 200)
      |),
      |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM kept),
      |pm AS (SELECT piece, CAST(greatest(1, cnt * 1000000 // t) AS HUGEINT) AS p FROM kept, tot),
      |mp AS (SELECT map(list(piece), list(p)) AS m FROM pm),
      |g0 AS (SELECT word, unnest(range(0, len(word))) AS gi FROM wt),
      |g AS (SELECT word, gi, unnest(range(1, least(4, len(word) - gi) + 1)) AS gl FROM g0)""".stripMargin

  /** One EM round's lattice + E-step + count aggregation as a CTE block,
    * parameterized by the model map CTE `mp` and a name suffix `s` —
    * the integer fixed-point forward lattice as a recursive CTE (alpha
    * appended per position, each term `alpha·p // 10⁶` — HUGEINT, the
    * same floor the engine takes in BigInt), the backward lattice as
    * the SAME recursion on the reversed word with reversed-piece
    * lookups (beta(i) = alphaRev(L−i), exact because integer sums are
    * order-free), per-occurrence edge masses `alpha·p·beta // 10⁶`,
    * round-half-up expected micros against 10⁹·z, and word-frequency
    * weighting into `ecx<s>`/`tot2<s>`. Words whose quantized z
    * underflows to 0 drop identically on both sides. */
  private def emRoundSql(mp: String, s: String): String =
    s"""af$s AS (
      |  SELECT word, 0 AS i, [CAST(1000000000000000 AS HUGEINT)] AS st FROM wt
      |  UNION ALL
      |  SELECT word, i + 1,
      |    list_append(st, coalesce(list_sum(list_filter(list_transform(range(1, least(4, i + 1) + 1),
      |        l -> st[i + 2 - l] * map_extract($mp.m, word[i + 2 - l : i + 1])[1] // 1000000),
      |      x -> x IS NOT NULL)), CAST(0 AS HUGEINT)))
      |  FROM af$s, $mp WHERE i < len(word)
      |),
      |ab$s AS (
      |  SELECT word, reverse(word) AS rw, 0 AS i, [CAST(1000000000000000 AS HUGEINT)] AS st FROM wt
      |  UNION ALL
      |  SELECT word, rw, i + 1,
      |    list_append(st, coalesce(list_sum(list_filter(list_transform(range(1, least(4, i + 1) + 1),
      |        l -> st[i + 2 - l] * map_extract($mp.m, reverse(rw[i + 2 - l : i + 1]))[1] // 1000000),
      |      x -> x IS NOT NULL)), CAST(0 AS HUGEINT)))
      |  FROM ab$s, $mp WHERE i < len(rw)
      |),
      |ff$s AS (SELECT word, st FROM af$s WHERE i = len(word)),
      |bb$s AS (SELECT word, st FROM ab$s WHERE i = len(word)),
      |zt$s AS (SELECT word, st[len(word) + 1] AS z FROM ff$s),
      |terms$s AS (
      |  SELECT g.word, g.word[g.gi + 1 : g.gi + g.gl] AS piece,
      |    ff$s.st[g.gi + 1] * map_extract($mp.m, g.word[g.gi + 1 : g.gi + g.gl])[1]
      |      * bb$s.st[len(g.word) - g.gi - g.gl + 1] // 1000000 AS tm
      |  FROM g JOIN ff$s USING (word) JOIN bb$s USING (word), $mp
      |),
      |tf$s AS (SELECT word, piece, tm FROM terms$s WHERE tm IS NOT NULL AND tm > 0),
      |ew$s AS (
      |  SELECT tf$s.word, tf$s.piece,
      |    (2 * sum(tf$s.tm) + 1000000000 * zt$s.z) // (2 * 1000000000 * zt$s.z) AS e
      |  FROM tf$s JOIN zt$s USING (word)
      |  WHERE zt$s.z > 0
      |  GROUP BY tf$s.word, tf$s.piece, zt$s.z
      |),
      |ecx$s AS (SELECT ew$s.piece, CAST(sum(ew$s.e * wt.wc) AS BIGINT) AS ec_micros
      |  FROM ew$s JOIN wt USING (word) GROUP BY 1),
      |tot2$s AS (SELECT CAST(sum(ec_micros) AS HUGEINT) AS t2 FROM ecx$s)""".stripMargin

  /** The engine M-step as a SELECT over `ecx<s>`/`tot2<s>`: integer
    * renormalization to micros with the single-char cover floor and the
    * ≥ 1 survival filter. */
  private def emRenormSql(s: String): String =
    s"""SELECT ecx$s.piece, ec_micros,
      |  CAST(CASE WHEN len(ecx$s.piece) = 1
      |    THEN greatest(1, CAST(ec_micros AS HUGEINT) * 1000000 // t2)
      |    ELSE CAST(ec_micros AS HUGEINT) * 1000000 // t2 END AS BIGINT) AS p_micros
      |FROM ecx$s, tot2$s
      |WHERE CASE WHEN len(ecx$s.piece) = 1
      |    THEN greatest(1, CAST(ec_micros AS HUGEINT) * 1000000 // t2)
      |    ELSE CAST(ec_micros AS HUGEINT) * 1000000 // t2 END >= 1""".stripMargin

  /** DuckDB oracle for ONE [[emRound]] under the candidate-init model
    * (maxPieceLen = 4, maxVocab = 200 — the registry's fixed model):
    * [[emHeadSql]] + one [[emRoundSql]] lattice + the [[emRenormSql]]
    * M-step. */
  def emOracleSql: String =
    emHeadSql + ",\n" + emRoundSql("mp", "") + "\n" + emRenormSql("")

  /** DuckDB oracle for TWO CHAINED [[emRound]]s — the composition a real
    * tokenizer-training loop runs: round 1's renormalized model (the
    * full M-step, cover floor and survival filter included) becomes
    * round 2's lattice model, so a green row proves the engine's
    * round-to-round hand-off (collect → broadcast → re-lattice) exactly,
    * not just one isolated E/M pass. Same fixed-point bounds each round
    * (p ≤ ~10⁶ micros, terms ≤ 10²⁴ ≪ HUGEINT). */
  def em2OracleSql: String =
    emHeadSql + ",\n" + emRoundSql("mp", "") + ",\n" +
      "r1 AS MATERIALIZED (" + emRenormSql("") + "),\n" +
      """pm2 AS (SELECT piece, CAST(p_micros AS HUGEINT) AS p FROM r1),
        |mp2 AS (SELECT map(list(piece), list(p)) AS m FROM pm2),""".stripMargin +
      "\n" + emRoundSql("mp2", "2") + "\n" + emRenormSql("2")
}
