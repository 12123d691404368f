package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

/** Deduplication operators for a training-data corpus.
  *
  *  - Exact dedup: hash-groupBy on a content fingerprint — one shuffle on
  *    the md5 key, no text comparison.
  *  - Exact n-gram Jaccard: shingle explode + equi-join on the shingle —
  *    quadratic in colliding docs, so callers cap the candidate set; the
  *    scale path is MinHash-LSH.
  *  - MinHash-LSH: banded minhash signatures via spark.ml — candidate pairs
  *    come from bucket joins (never all-pairs), which is the only shape that
  *    survives 100 TB.
  *  - SimHash: 64-bit signature from per-token hash bit votes — one
  *    aggregation pass; near-dup candidates by band equality.
  */
object Dedup {

  /** Exact-duplicate statistics by normalized-content fingerprint. */
  def exactStats(df: DataFrame, textCol: String = "text"): DataFrame =
    df.select(TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .groupBy("fp").agg(count(lit(1)).as("n"))
      .agg(
        sum(col("n")).as("total_docs"),
        count(lit(1)).as("distinct_texts"),
        sum(col("n") - 1).as("duplicate_rows"))

  /** Distinct word n-gram shingle ARRAYS per document — one row per doc.
    * The array form is the scale anchor: signatures and set sizes derive
    * from it with pure projections (zero shuffle); only code that truly
    * needs the long format (the candidate re-rank intersection) explodes,
    * and then only for candidate docs.
    */
  def shingleArrays(df: DataFrame, keyCol: String, textCol: String = "text",
      n: Int = 3): DataFrame = {
    // graft_shingles is the native one-pass kernel of the HOF form
    // array_distinct(transform(sequence(..), i -> concat_ws(' ', slice(..))))
    // — identical output (ShingleExpressionsSpec), ~10× cheaper per doc and
    // codegen-friendly (the HOF lambda is interpreted per gram).
    graft.functions.GraftFunctions.register(df.sparkSession)
    TextAnalysis.withTokens(df, textCol)
      .withColumn("sh",
        expr(s"""CASE WHEN size(tokens) >= $n
          | THEN graft_shingles(tokens, $n)
          | ELSE array() END""".stripMargin))
      .select(col(keyCol), col("sh"))
  }

  /** Distinct word n-gram shingles per document, long format. */
  def shingles(df: DataFrame, keyCol: String, textCol: String = "text",
      n: Int = 3): DataFrame =
    shingleArrays(df, keyCol, textCol, n)
      .select(col(keyCol), explode(col("sh")).as("shingle"))

  /** Exact pairwise n-gram Jaccard similarity via shingle equi-join.
    * Returns (doc_a, doc_b, inter, size_a, size_b, jaccard) for
    * jaccard >= minJaccard, doc_a < doc_b.
    */
  def jaccardPairs(df: DataFrame, keyCol: String, textCol: String = "text",
      n: Int = 3, minJaccard: Double = 0.05): DataFrame = {
    val sh = shingles(df, keyCol, textCol, n).cache()
    val sizes = sh.groupBy(keyCol).agg(count(lit(1)).as("sz"))
    val pairs = sh.toDF("doc_a", "shingle")
      .join(sh.toDF("doc_b", "shingle"), Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.toDF("doc_a", "size_a"), Seq("doc_a"))
      .join(sizes.toDF("doc_b", "size_b"), Seq("doc_b"))
      .withColumn("jaccard",
        round(col("inter").cast("double")
          / (col("size_a") + col("size_b") - col("inter")), 6))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "inter", "size_a", "size_b", "jaccard")
  }

  /** Exact Jaccard of candidate pairs from a pre-built (cached) shingle
    * ARRAY frame — linear in candidate-pair shingles, never corpus×corpus.
    *
    * Scale shape: set sizes are `size(sh)` (projection, no counting
    * shuffle); only CANDIDATE docs are exploded to long format (left-semi
    * restriction first), so the intersection join touches candidate
    * shingles, not the corpus's. The candidate set is unbounded at scale
    * (a 100 TB web corpus yields billions of banding pairs), so no
    * broadcast hint: AQE picks the join strategy — broadcast when the
    * candidates are measured small, shuffle hash join otherwise. Pairs
    * with an empty intersection drop out, which is correct for any
    * minJaccard > 0.
    */
  private def exactJaccardFromArrays(arr: DataFrame, candidates: DataFrame,
      keyCol: String, minJaccard: Double): DataFrame = {
    // Pair-local intersection: two key-joins attach each side's shingle
    // ARRAY and `array_intersect` (exact string equality — no hashing
    // caveat) computes `inter` as a per-row projection. The former
    // explode-the-shingles + join-on-shingle + groupBy form fanned each
    // doc's shingles across ALL its candidate pairs — measured 82k
    // candidates × ~48 shingles ≈ 4M shuffled join rows at sf0.1 on the
    // low-entropy corpus; here the shuffled row count IS the candidate
    // count. The inter > 0 filter preserves the omit-zero-overlap contract
    // at minJaccard = 0.0.
    // shingle-less docs (< n tokens) are outside the contract ("never
    // appear in the output") — and MUST be dropped before the division:
    // a pair of two empty-shingle docs makes the denominator 0, and under
    // ANSI mode the optimizer can merge the inter > 0 filter with the
    // jaccard filter and evaluate the division first → DIVIDE_BY_ZERO
    // (caught by the randomized property spec).
    // Hashed PRE-VERIFY (guide §2.3 — shuffle narrow longs, not n-token
    // string arrays): candidates are first screened against 8-byte
    // xxhash64 shingle sets, and only survivors pay the exact string-array
    // re-rank. Exactness is unconditional, not probabilistic: cross-doc
    // collisions only ADD hashed intersection (false positives the exact
    // re-rank removes), and within-intersection collisions can shrink it by
    // at most lossA + lossB (loss = sz − |distinct hashes|, computed per
    // doc), which the acceptance slack covers — so a true pair with
    // i·(10⁶+tμ) ≥ tμ·(szA+szB) always passes the screen. Measured: the
    // re-rank on 310k sf0.1 candidates dropped 14.2 s → 2.0 s.
    val tMicros = math.round(minJaccard * 1e6)
    val sized = arr.filter(size(col("sh")) > 0)
      .select(col(keyCol), col("sh"), size(col("sh")).cast("long").as("sz"))
    val hsized = sized.select(col(keyCol),
      array_distinct(expr("transform(sh, s -> xxhash64(s))")).as("hs"),
      col("sz"))
      .withColumn("loss", col("sz") - size(col("hs")).cast("long"))
      .select(keyCol, "hs", "sz", "loss")
    // Par.spread: the screen is per-PAIR compute over 16-byte rows — AQE's
    // byte-based coalescing ran it on 1-2 partitions (guide §2.6)
    val screened = graft.core.Par.spread(candidates.select("doc_a", "doc_b"))
      .join(hsized.toDF("doc_a", "hs_a", "size_a", "loss_a"), Seq("doc_a"))
      .join(hsized.toDF("doc_b", "hs_b", "size_b", "loss_b"), Seq("doc_b"))
      .withColumn("_ih", size(array_intersect(col("hs_a"), col("hs_b"))).cast("long"))
      .filter(col("_ih") + col("loss_a") + col("loss_b") > 0 &&
        (col("_ih") + col("loss_a") + col("loss_b")) * lit(1000000L + tMicros) >=
          lit(tMicros) * (col("size_a") + col("size_b")))
      .select("doc_a", "doc_b")
    screened
      .join(sized.toDF("doc_a", "sh_a", "size_a"), Seq("doc_a"))
      .join(sized.toDF("doc_b", "sh_b", "size_b"), Seq("doc_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .filter(col("inter") > 0)
      .withColumn("jaccard",
        round(col("inter").cast("double")
          / (col("size_a") + col("size_b") - col("inter")), 6))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "inter", "size_a", "size_b", "jaccard")
  }

  /** Jaccard ACCEPTANCE filter over a large candidate pair set — the
    * high-fan-out sibling of [[exactJaccardForPairs]]. That form explodes
    * candidate docs' shingles and re-joins on the shingle, which fans each
    * doc's shingles across ALL its candidate pairs: fine for the few
    * thousand pairs MinHash banding emits, ruinous for a loose generator
    * (a wide SimHash hamming cut on a low-entropy corpus emits millions).
    * Here the pair list stays one-row-per-pair: two key-joins attach each
    * side's shingle array hashed to 64-bit (narrow rows — longs, not
    * n-token strings), and the intersection size is a per-row
    * `array_intersect` projection. No shuffle grows with candidate count ×
    * shingle count.
    *
    * Sizes come from the ORIGINAL distinct-shingle arrays (exact); the
    * intersection is on xxhash64 values, so a cross-doc hash collision
    * could in principle inflate `inter` — P ≈ |a|·|b|/2⁶⁴ per pair,
    * negligible even across millions of candidates, and only observable
    * if it flips a pair exactly at `minJaccard`. Use this as a pair
    * accept/reject gate; use [[exactJaccardForPairs]] when the inter/size
    * values themselves are the output.
    */
  def acceptPairsByJaccard(df: DataFrame, candidates: DataFrame, keyCol: String,
      textCol: String = "text", n: Int = 3, minJaccard: Double = 0.5): DataFrame =
    acceptPairsByJaccardHashed(hashedShingleArrays(df, keyCol, textCol, n),
      candidates, keyCol, minJaccard)

  /** Per-doc hashed shingle sets — (keyCol, hs: array<long>, sz): the
    * standing-artifact form of [[shingleArrays]] (xxhash64 per shingle,
    * narrow long rows instead of n-token strings) that
    * [[acceptPairsByJaccardHashed]] consumes. Deterministic, so a
    * materialized copy ≡ recomputing (see
    * [[graft.dedup.PairGraph.documentsHashedShingles]]).
    */
  def hashedShingleArrays(df: DataFrame, keyCol: String,
      textCol: String = "text", n: Int = 3): DataFrame =
    shingleArrays(df, keyCol, textCol, n)
      .select(col(keyCol), expr("transform(sh, s -> xxhash64(s))").as("hs"),
        size(col("sh")).cast("long").as("sz"))

  /** [[acceptPairsByJaccard]] over a pre-built (keyCol, hs, sz) hashed
    * shingle frame — lets callers inject the session's standing artifact
    * instead of re-shingling the corpus per invocation.
    */
  def acceptPairsByJaccardHashed(hashed: DataFrame, candidates: DataFrame,
      keyCol: String, minJaccard: Double = 0.5): DataFrame = {
    val arr = hashed.select(col(keyCol), col("hs"), col("sz"))
    candidates.select("doc_a", "doc_b")
      .join(arr.toDF("doc_a", "hs_a", "size_a"), Seq("doc_a"))
      .join(arr.toDF("doc_b", "hs_b", "size_b"), Seq("doc_b"))
      .withColumn("inter", size(array_intersect(col("hs_a"), col("hs_b"))).cast("long"))
      .withColumn("jaccard", round(col("inter").cast("double")
        / (col("size_a") + col("size_b") - col("inter")), 6))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b")
  }

  /** Exact n-gram Jaccard restricted to a given candidate pair set.
    *
    * Note: pairs whose shingle sets do not intersect (and docs with fewer
    * than `n` tokens, which have no shingles) never appear in the output —
    * correct for any `minJaccard > 0`; at `minJaccard = 0.0` true
    * zero-overlap pairs are still omitted rather than returned with
    * jaccard 0.
    */
  def exactJaccardForPairs(df: DataFrame, candidates: DataFrame, keyCol: String,
      textCol: String = "text", n: Int = 3, minJaccard: Double = 0.5): DataFrame =
    // cached: the array frame feeds both intersection sides AND the sizes
    exactJaccardFromArrays(shingleArrays(df, keyCol, textCol, n).cache(),
      candidates, keyCol, minJaccard)

  /** Native banded MinHash candidates from the shingle ARRAY frame: per
    * table t the signature is `array_min(transform(sh, s -> xxhash64(s, t)))`
    * — a pure per-row projection, so signatures need NO shuffle at all
    * (the previous form exploded every shingle and shuffled the corpus
    * into numTables fused min-aggs; spark.ml's MinHashLSH pays the same
    * through a per-row UDF). The only signature-side shuffle left is the
    * candidate bucket equi-join on (table_id, sig) — never all-pairs;
    * P(miss) = (1−j)^numTables for a pair at Jaccard j.
    */
  private def minHashCandidatesFromArrays(arr: DataFrame, keyCol: String,
      numTables: Int): DataFrame = {
    val long = arr.select(col(keyCol), posexplode(expr(
      s"transform(sequence(0, ${numTables - 1}), t -> array_min(transform(sh, s -> xxhash64(s, t))))"))
      .as(Seq("table_id", "sig")))
    long.toDF("doc_a", "table_id", "sig")
      .join(long.toDF("doc_b", "table_id", "sig"), Seq("table_id", "sig"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** Scale-safe exact Jaccard near-dup pairs: native banded-MinHash
    * candidates + exact re-rank, all from ONE cached shingle-array pass.
    * Same output as [[jaccardPairs]] at `minJaccard` provided the banding
    * catches every pair at that similarity (more tables raise recall).
    * Docs with fewer than n tokens have no shingles and can never pair —
    * consistent with the exact form.
    */
  def jaccardPairsScalable(df: DataFrame, keyCol: String, textCol: String = "text",
      n: Int = 3, minJaccard: Double = 0.5, numHashTables: Int = 4): DataFrame = {
    // Par.boost: the per-row shingle + numTables min-hash projections ran
    // on one local scan split (guide §2.6; no-op at production widths)
    val arr = shingleArrays(graft.core.Par.boost(df), keyCol, textCol, n)
      .filter(size(col("sh")) > 0).cache()
    exactJaccardFromArrays(arr,
      minHashCandidatesFromArrays(arr, keyCol, numHashTables), keyCol, minJaccard)
  }

  /** EXACT set-similarity join via prefix filtering (the SSJoin/PPJoin
    * family — Chaudhuri et al. ICDE'06, Xiao et al. WWW'08): provably the
    * same result as the all-pairs scan, with no probabilistic caveat.
    * Where [[jaccardPairsScalable]]'s MinHash banding has P(miss) =
    * (1−j^r)^b per pair, this candidate generator CANNOT miss:
    *
    * Order all shingles globally by (document frequency asc, shingle) —
    * rarest first. A doc with n shingles keeps a PREFIX of its sorted set
    * of length p = n − ceil(t·n) + 1. For any pair with Jaccard ≥ t the
    * smallest common shingle w (in the global order) sits inside BOTH
    * prefixes: each side has at most n − i non-shared shingles ranked
    * below w (i = intersection ≥ ceil(t·n) on both sides, since
    * J ≥ t forces min-size ≥ t·max-size), so w's position ≤
    * n − ceil(t·n) + 1 = p. Hence candidates = pairs sharing ≥ 1 PREFIX
    * shingle ⊇ all true pairs, and the exact pair-local re-rank does the
    * rest. ceil(t·n) is computed in integer micros
    * ((tμ·n + 999999) div 10⁶) — no float ceil at an exact-integer
    * boundary can shrink a prefix below the guarantee.
    *
    * Scale shape: rare-first ordering is what bounds the candidate join —
    * prefixes are each doc's RAREST shingles, so bucket sizes are the df
    * of rare shingles (corpus-wide stopword-grade shingles sort LAST and
    * enter no long doc's prefix); the size-band filter
    * (min·10⁶ ≥ tμ·max) prunes cross-length pairs before the distinct.
    * Shuffles: df count, df join, per-doc re-sort, candidate bucket join,
    * pair-local re-rank — all keyed, none all-pairs, no broadcast of
    * anything corpus-sized. Same output contract as [[jaccardPairs]].
    *
    * `maxDfRatio` caps candidate volume on boilerplate-heavy corpora
    * WITHOUT giving up exactness. Shingles with df > maxDfRatio·N are
    * stop-listed out of the candidate-generation universe, and each
    * doc's prefix is recomputed on its REDUCED (non-stop) shingle set
    * with an ADJUSTED requirement: J ≥ t forces full-set intersection
    * ≥ ceil(t·sz), of which at most sStop (the doc's stop-shingle count)
    * can be stop shingles, so reduced-set intersection ≥ req =
    * ceil(t·sz) − sStop. While req ≥ 1 the pigeonhole argument holds on
    * the reduced universe verbatim — the smallest common reduced shingle
    * sits inside both reduced prefixes of length szRed − req + 1 — so
    * these docs emit SHORT prefixes of rare shingles only. A doc whose
    * req drops ≤ 0 (made almost entirely of stopword-grade shingles: the
    * only class the cap cannot shorten) falls back to its UNCAPPED
    * full-order prefix — which for such a doc provably contains all its
    * non-stop shingles (see [[Dedup.emittedPrefixShingles]]). Exactness:
    * every qualifying pair still co-emits ≥ 1 shingle — R×R via the
    * smallest common reduced shingle in both reduced prefixes, R×H via
    * the R side's guaranteed reduced-prefix shingle (non-stop, common,
    * hence inside the H side's non-stop-complete prefix), H×H via the
    * original full-universe pigeonhole on two uncapped prefixes — and
    * the exact re-rank is unchanged. Default 1.0 = cap off (identical
    * to the uncapped algorithm).
    *
    * `capHeavyDocs` is the SCALE mode for corpora where mostly-stopword
    * docs are not a residue but the norm (web boilerplate): a corpus
    * whose docs share a boilerplate block larger than (1−t) of their
    * shingles has a QUADRATIC-sized exact answer — every pair of such
    * docs qualifies — so no exact algorithm is sub-quadratic there.
    * With capHeavyDocs=true, heavy (req ≤ 0) docs emit ALL their
    * non-stop shingles instead of their uncapped prefix, making every
    * emitted shingle's df ≤ maxDfRatio·N and the candidate volume
    * ≤ Σ_shingle df² ≤ maxDfRatio·N · (total postings) — an explicit,
    * tunable sub-quadratic bound. The price is a DOCUMENTED BOUNDED
    * RECALL CUT: pairs whose qualifying overlap consists entirely of
    * stopword-grade shingles (boilerplate-only duplication) are not
    * surfaced; every surfaced pair still carries its EXACT full-set
    * score (the re-rank never drops shingles), so precision is
    * unaffected. Default false = exact.
    */
  def prefixFilterJaccardPairs(df: DataFrame, keyCol: String,
      textCol: String = "text", n: Int = 3, minJaccard: Double = 0.5,
      maxDfRatio: Double = 1.0, capHeavyDocs: Boolean = false,
      precomputedDf: Option[DataFrame] = None): DataFrame = {
    require(minJaccard > 0 && minJaccard <= 1, s"minJaccard in (0,1]: $minJaccard")
    require(maxDfRatio > 0 && maxDfRatio <= 1, s"maxDfRatio in (0,1]: $maxDfRatio")
    val tMicros = math.round(minJaccard * 1e6)
    // Par.boost: shingling + the emission's partial sorted-collect run on
    // the cached array frame's partitioning — one local scan split made
    // that single-core (guide §2.6; no-op at production scan widths)
    val arr = shingleArrays(graft.core.Par.boost(df), keyCol, textCol, n)
      .filter(size(col("sh")) > 0).cache()
    val long = arr.select(col(keyCol), explode(col("sh")).as("shingle"))
    val emitted = emittedPrefixShingles(arr, long, keyCol, tMicros, maxDfRatio,
      capHeavyDocs, precomputedDf)
      .select(col(keyCol), col("sz"), col("_pos"), col("shingle"))
    // PPJoin positional filter (Xiao et al. WWW'08 §3.2), exact: J ≥ t forces
    // i·(10⁶+tμ) ≥ tμ·(szA+szB); for any common shingle w at emitted
    // positions (pa, pb), every OTHER common shingle ranks strictly after w
    // in each doc's emitted order (full order for H docs; reduced order for
    // R docs, where the ≤ sStop common stop shingles all rank after every
    // non-stop shingle), so i ≤ 1 + min(szA−1−pa, szB−1−pb) — sz the FULL
    // size, pos the emitted index (szRed−1−pa+sStop = szA−1−pa makes the
    // reduced-order bound collapse to the same formula). A pair survives if
    // ANY co-emitted shingle passes; the witness shingle of a true pair
    // always does, so recall is untouched — measured 310k → 125k candidates
    // at sf0.1 with an identical result set.
    val cand = emitted.toDF("doc_a", "size_a", "pos_a", "shingle")
      .join(emitted.toDF("doc_b", "size_b", "pos_b", "shingle"), Seq("shingle"))
      .filter(col("doc_a") < col("doc_b") &&
        least(col("size_a"), col("size_b")) * 1000000L >=
          lit(tMicros) * greatest(col("size_a"), col("size_b")))
      .filter((lit(1L) + least(col("size_a") - 1 - col("pos_a"),
          col("size_b") - 1 - col("pos_b"))) * lit(1000000L + tMicros) >=
        lit(tMicros) * (col("size_a") + col("size_b")))
      .select("doc_a", "doc_b").distinct()
    exactJaccardFromArrays(arr, cand, keyCol, minJaccard)
  }

  /** Shared prefix-emission step for the exact join family: per doc, the
    * rare-first prefix over the REDUCED (stop-listed) shingle set with
    * the adjusted requirement req = ceil(tμ·sz) − sStop when req ≥ 1,
    * or the UNCAPPED full-order prefix (length sz − ceil(tμ·sz) + 1)
    * when req ≤ 0 (mostly-stopword docs). The full-order prefix of such
    * a doc provably contains ALL its non-stop shingles — every non-stop
    * shingle (df ≤ r·N) sorts strictly before every stop shingle
    * (df > r·N) in the (df, shingle) order, and req ≤ 0 means the prefix
    * length sz − ceilT + 1 ≥ szRed + 1 — which is what the R×H exactness
    * case needs (see [[prefixFilterJaccardPairs]]). Returns
    * (keyCol, sz, szRed, _req, _ceilT, _pos, shingle) rows — _pos is the
    * shingle's 0-based index in the doc's emitted order, which the
    * callers' PPJoin positional filter consumes. Struct sort on
    * (df, shingle) is a total deterministic order, so the collect_list
    * arrival order cannot leak.
    */
  private def emittedPrefixShingles(arr: DataFrame, long: DataFrame,
      keyCol: String, tMicros: Long, maxDfRatio: Double,
      capHeavyDocs: Boolean = false,
      precomputedDf: Option[DataFrame] = None): DataFrame = {
    // capHeavyDocs: heavy docs emit their whole REDUCED set (bounded-df
    // universe, recall-cut mode) instead of the uncapped full prefix
    val heavyEmit =
      if (capHeavyDocs) "_tR" else "slice(_tF, 1, CAST(sz - _ceilT + 1 AS INT))"
    val rMicros = math.round(maxDfRatio * 1e6)
    val nDocs = arr.agg(count(lit(1)).as("_n"))
    // document frequencies: computed live, or injected from a materialized
    // (shingle, _df) table over the SAME corpus and n (the production
    // shape — df stats are built once and every dedup job reads them);
    // determinism makes the two indistinguishable.
    val rawDf = precomputedDf.map(_.select("shingle", "_df"))
      .getOrElse(long.groupBy("shingle").agg(count(lit(1)).as("_df")))
    val dfreq = rawDf
      .crossJoin(broadcast(nDocs))
      .withColumn("_stop", col("_df") * 1000000L > col("_n") * lit(rMicros))
      .select("shingle", "_df", "_stop")
    // ONE sorted collect per doc: _stop is a function of the shingle (via
    // its df), so sorting struct(_df, shingle, _stop) is the same total
    // (df, shingle) order, and the reduced sequence is an order-preserving
    // filter of the full one — halves the per-doc aggregation state vs
    // collecting full and reduced lists separately.
    long.join(dfreq, Seq("shingle"))
      .groupBy(keyCol)
      .agg(sort_array(collect_list(
        struct(col("_df"), col("shingle"), col("_stop")))).as("_os"))
      .select(col(keyCol),
        expr("transform(_os, s -> s.shingle)").as("_tF"),
        expr("transform(filter(_os, s -> NOT s._stop), s -> s.shingle)").as("_tR"),
        size(col("_os")).cast("long").as("sz"),
        expr("CAST(size(filter(_os, s -> NOT s._stop)) AS BIGINT)").as("szRed"))
      .withColumn("_ceilT", expr(s"(${tMicros}L * sz + 999999) div 1000000"))
      .withColumn("_req", col("_ceilT") - (col("sz") - col("szRed")))
      .select(col(keyCol), col("sz"), col("szRed"), col("_req"), col("_ceilT"),
        posexplode(expr("CASE WHEN _req >= 1 " +
          "THEN slice(_tR, 1, CAST(szRed - _req + 1 AS INT)) " +
          s"ELSE $heavyEmit END")).as(Seq("_pos", "shingle")))
  }

  /** EXACT directional containment join: pairs (a, b) where
    * |A∩B| / |A| ≥ t — doc a's shingles mostly appear in doc b (a quote,
    * an excerpt, a boilerplate-wrapped copy). Jaccard misses these when
    * the container is much longer (J = i/(|A|+|B|−i) shrinks with |B|);
    * containment is the right statistic for subset-shaped duplication,
    * and like [[prefixFilterJaccardPairs]] this is exact — no
    * probabilistic recall caveat.
    *
    * Asymmetric prefix filter: containment ≥ t forces i ≥ ceil(t·|A|),
    * so by the same pigeonhole as the Jaccard form, A's rare-first
    * PREFIX of length |A| − ceil(t·|A|) + 1 must contain a common
    * shingle. Only the CONTAINED side gets a prefix; the container side
    * contributes its shingle postings (the inverted-index side of the
    * join).
    *
    * `maxDfRatio` is the scale lever for that container side: with the
    * cap on, a contained doc whose adjusted requirement req =
    * ceil(t·|A|) − sStop stays ≥ 1 emits its REDUCED rare-first prefix
    * (the [[prefixFilterJaccardPairs]] argument, one-sided) and joins
    * only the REDUCED postings — every posting list bounded by
    * maxDfRatio·N, which is the cap the round-8 review asked to wire.
    * Only mostly-stopword docs (req ≤ 0 — the one class no df cap can
    * shorten) keep the uncapped full-order prefix against full postings;
    * their count bounds the residual heavy volume and they route through
    * the same exact re-rank, so the result stays EXACT at every setting.
    * Default 1.0 = cap off (identical to the uncapped algorithm).
    *
    * `capHeavyDocs=true` is the scale mode for boilerplate-dominated
    * corpora, where the heavy class is the norm and the exact answer is
    * itself quadratic-sized (a pure-boilerplate doc is contained in
    * EVERY doc carrying the block): heavy docs emit their non-stop
    * shingles only and every candidate join runs against the REDUCED
    * postings — posting lists bounded by maxDfRatio·N, candidate volume
    * sub-quadratic by construction. Bounded recall cut as documented on
    * [[prefixFilterJaccardPairs]]: containments that exist only through
    * stopword-grade shingles are not surfaced; surfaced pairs keep
    * their exact full-set scores.
    *
    * Output (directional, both orientations possible): (doc_a=contained,
    * doc_b=container, inter, size_a, size_b, containment).
    */
  def containmentPairs(df: DataFrame, keyCol: String, textCol: String = "text",
      n: Int = 3, minContainment: Double = 0.7,
      maxDfRatio: Double = 1.0, capHeavyDocs: Boolean = false,
      precomputedDf: Option[DataFrame] = None): DataFrame = {
    require(minContainment > 0 && minContainment <= 1,
      s"minContainment in (0,1]: $minContainment")
    require(maxDfRatio > 0 && maxDfRatio <= 1, s"maxDfRatio in (0,1]: $maxDfRatio")
    val tMicros = math.round(minContainment * 1e6)
    val rMicros = math.round(maxDfRatio * 1e6)
    // Par.boost: see prefixFilterJaccardPairs
    val arr = shingleArrays(graft.core.Par.boost(df), keyCol, textCol, n)
      .filter(size(col("sh")) > 0).cache()
    val long = arr.select(col(keyCol), explode(col("sh")).as("shingle"))
    val emitted = emittedPrefixShingles(arr, long, keyCol, tMicros, maxDfRatio,
      capHeavyDocs, precomputedDf)
    // container-side postings, reduced to non-stop shingles; the df table
    // comes from the materialized stats when provided (else one extra
    // shuffle over the cached input)
    val nDocs = arr.agg(count(lit(1)).as("_n"))
    val stopFree = precomputedDf.map(_.select("shingle", "_df"))
      .getOrElse(long.groupBy("shingle").agg(count(lit(1)).as("_df")))
      .crossJoin(broadcast(nDocs))
      .filter(col("_df") * 1000000L <= col("_n") * lit(rMicros))
      .select("shingle")
    val postRed = long.join(stopFree, Seq("shingle"))
      .select(col(keyCol).as("doc_b"), col("shingle"))
    val postFull = long.select(col(keyCol).as("doc_b"), col("shingle"))
    // One-sided PPJoin positional filter, exact: containment ≥ t forces
    // i ≥ ceil(tμ·szA / 10⁶); for the guaranteed witness shingle w at
    // emitted position pa, every other common shingle ranks after w in A's
    // emitted order (reduced order: common stop shingles — at most sStopA —
    // all rank after every non-stop shingle), so i ≤ szA − pa. A pair whose
    // every match fails (szA − pa)·10⁶ ≥ tμ·szA cannot qualify.
    def positional(c: DataFrame): DataFrame =
      c.filter((col("_sza") - col("_posa")) * 1000000L >=
        lit(tMicros) * col("_sza"))
    val candR = positional(emitted.filter(col("_req") >= 1)
      .select(col(keyCol).as("doc_a"), col("sz").as("_sza"),
        col("_pos").as("_posa"), col("shingle"))
      .join(postRed, Seq("shingle")))
    // heavy docs: exact mode joins full postings (stop shingles included);
    // capHeavyDocs emits only non-stop shingles, so the reduced postings
    // are sufficient and keep every list bounded by maxDfRatio·N
    val candH = positional(emitted.filter(col("_req") < 1)
      .select(col(keyCol).as("doc_a"), col("sz").as("_sza"),
        col("_pos").as("_posa"), col("shingle"))
      .join(if (capHeavyDocs) postRed else postFull, Seq("shingle")))
    val cand = candR.union(candH)
      .filter(col("doc_a") =!= col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    val sized = arr.select(col(keyCol), col("sh"), size(col("sh")).cast("long").as("sz"))
    // hashed PRE-VERIFY before the exact string re-rank — the same
    // provably-lossless screen as [[exactJaccardFromArrays]], with the
    // containment acceptance bound: i ≥ ceil(tμ·szA/10⁶) and
    // i_h ≥ i − lossA − lossB.
    val hsized = sized.select(col(keyCol),
      array_distinct(expr("transform(sh, s -> xxhash64(s))")).as("hs"),
      col("sz"))
      .withColumn("loss", col("sz") - size(col("hs")).cast("long"))
      .select(keyCol, "hs", "sz", "loss")
    // Par.spread: per-pair verify compute over 16-byte rows (see
    // exactJaccardFromArrays)
    val screened = graft.core.Par.spread(cand)
      .join(hsized.toDF("doc_a", "hs_a", "size_a", "loss_a"), Seq("doc_a"))
      .join(hsized.toDF("doc_b", "hs_b", "size_b", "loss_b"), Seq("doc_b"))
      .withColumn("_ih", size(array_intersect(col("hs_a"), col("hs_b"))).cast("long"))
      .filter(col("_ih") + col("loss_a") + col("loss_b") > 0 &&
        (col("_ih") + col("loss_a") + col("loss_b")) * 1000000L >=
          lit(tMicros) * col("size_a"))
      .select("doc_a", "doc_b")
    screened
      .join(sized.toDF("doc_a", "sh_a", "size_a"), Seq("doc_a"))
      .join(sized.toDF("doc_b", "sh_b", "size_b"), Seq("doc_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .filter(col("inter") > 0)
      .withColumn("containment",
        round(col("inter").cast("double") / col("size_a"), 6))
      .filter(col("containment") >= minContainment)
      .select("doc_a", "doc_b", "inter", "size_a", "size_b", "containment")
  }

  /** MinHash-LSH near-duplicate candidate pairs (banded — bucket join, not
    * all-pairs). Jaccard DISTANCE threshold (1 - similarity).
    */
  def minHashPairs(df: DataFrame, keyCol: String, textCol: String = "text",
      n: Int = 3, maxDistance: Double = 0.9, numHashTables: Int = 8,
      seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
    graft.functions.GraftFunctions.register(df.sparkSession)
    val sh = TextAnalysis.withTokens(df, textCol)
      .withColumn("sh",
        expr(s"""CASE WHEN size(tokens) >= $n
          | THEN graft_shingles(tokens, $n)
          | ELSE array(concat_ws(' ', tokens)) END""".stripMargin))
      .select(col(keyCol), col("sh"))
    val tf = new HashingTF().setInputCol("sh").setOutputCol("features")
      .setNumFeatures(1 << 18).setBinary(true)
    // cached: approxSimilarityJoin(vecs, vecs, ...) transforms each side
    // independently — without the cache the tokenize+shingle+TF pass runs
    // twice over the corpus
    val vecs = tf.transform(sh).filter(expr("size(sh) > 0")).cache()
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(numHashTables).setSeed(seed)
    val model = lsh.fit(vecs)
    model.approxSimilarityJoin(vecs, vecs, maxDistance, "jaccard_dist")
      .select(
        col(s"datasetA.$keyCol").as("doc_a"),
        col(s"datasetB.$keyCol").as("doc_b"),
        round(col("jaccard_dist"), 6).as("jaccard_dist"))
      .filter(col("doc_a") < col("doc_b"))
  }

  /** Embedding-cosine near-duplicate pairs: exact pairwise cosine over the
    * corpus, keeping pairs above `minCosine`. Exact all-pairs — O(n²) — so
    * callers bound the corpus; the scale path routes candidates through
    * [[graft.similarity.Similarity.lshTopK]] buckets first and re-ranks
    * only bucket mates.
    */
  def embeddingNearDups(df: DataFrame, keyCol: String, minCosine: Double,
      embCol: String = "embedding"): DataFrame = {
    import graft.similarity.Similarity
    val base = Similarity.withNorm(df, embCol)
      .select(col(keyCol), col("v"), col("norm"))
    base.toDF("doc_a", "va", "na")
      .join(base.toDF("doc_b", "vb", "nb"), col("doc_a") < col("doc_b"))
      .withColumn("cosine", expr("graft_dot(va, vb) / (na * nb)"))
      .filter(col("cosine") >= minCosine)
      .select("doc_a", "doc_b", "cosine")
  }

  /** Scale-safe embedding-cosine near-dup pairs: hyperplane-LSH sign-bucket
    * candidates ([[graft.similarity.Similarity.withBuckets]] — bucket join,
    * never all-pairs) with exact cosine re-rank of bucket mates only. For a
    * pair at cosine c the per-plane agreement is p = 1 − arccos(c)/π, so
    * per-table P(same bucket) = p^nPlanes and overall
    * P(candidate) = 1 − (1 − p^nPlanes)^numTables: fewer planes / more
    * tables raise recall at mid thresholds; planes scale up with corpus
    * size to keep buckets small.
    */
  def embeddingNearDupsScalable(df: DataFrame, keyCol: String, minCosine: Double,
      nPlanes: Int = 4, numTables: Int = 8, seed: Long = 42L,
      embCol: String = "embedding"): DataFrame = {
    import graft.similarity.Similarity
    // Par.boost: the bucket projection is numTables·nPlanes dim-d dot
    // products per ROW — a corpus that fits one local scan split ran all
    // of it on one core (guide §2.6; no-op at production scan widths)
    val src = graft.core.Par.boost(df)
    val buckets = Similarity.withBuckets(src, keyCol, nPlanes, numTables, seed, embCol)
    val cand = buckets.toDF("doc_a", "table_id", "bucket")
      .join(buckets.toDF("doc_b", "table_id", "bucket"), Seq("table_id", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    val base = Similarity.withNorm(src, embCol).select(col(keyCol), col("v"), col("norm"))
    cand
      .join(base.toDF("doc_a", "va", "na"), Seq("doc_a"))
      .join(base.toDF("doc_b", "vb", "nb"), Seq("doc_b"))
      .withColumn("cosine", expr("graft_dot(va, vb) / (na * nb)"))
      .filter(col("cosine") >= minCosine)
      .select("doc_a", "doc_b", "cosine")
  }

  /** Incremental embedding near-dup detection — the nightly-crawl form
    * of [[embeddingNearDupsScalable]]: a NEW batch is checked against an
    * existing corpus (and against its own earlier-keyed members) without
    * ever re-pairing the corpus with itself. Both sides bucket with the
    * SAME hyperplane set (same seed/planes/tables — the index contract),
    * candidates come only from buckets the new batch occupies, and the
    * exact-cosine re-rank touches candidate pairs only. Work scales with
    * the batch and its bucket collisions, not the corpus pair count —
    * the property that lets a 100 TB corpus absorb a daily crawl.
    *
    * Keys must be unique across corpus ∪ batch. Output: one row per
    * accepted pair (new_id, match_id, cosine, source) with source =
    * 'corpus' | 'batch'; within-batch pairs keep the earlier key as the
    * senior match (new_id > match_id — deterministic keep-first).
    */
  def incrementalEmbeddingNearDups(newBatch: DataFrame, corpus: DataFrame,
      keyCol: String, minCosine: Double, nPlanes: Int = 4, numTables: Int = 8,
      seed: Long = 42L, embCol: String = "embedding"): DataFrame = {
    import graft.similarity.Similarity
    val nb = Similarity.withBuckets(newBatch, keyCol, nPlanes, numTables, seed, embCol)
      .toDF("new_id", "table_id", "bucket")
    val cb = Similarity.withBuckets(corpus, keyCol, nPlanes, numTables, seed, embCol)
      .toDF("match_id", "table_id", "bucket")
    val candCorpus = nb.join(cb, Seq("table_id", "bucket"))
      .select("new_id", "match_id").distinct()
      .withColumn("source", lit("corpus"))
    val candBatch = nb.join(nb.toDF("match_id", "table_id", "bucket"),
        Seq("table_id", "bucket"))
      .filter(col("new_id") > col("match_id"))
      .select("new_id", "match_id").distinct()
      .withColumn("source", lit("batch"))
    val newSide = Similarity.withNorm(newBatch, embCol)
      .select(col(keyCol).as("new_id"), col("v").as("va"), col("norm").as("na"))
    val matchSide = Similarity.withNorm(corpus, embCol)
      .select(col(keyCol).as("match_id"), col("v").as("vb"), col("norm").as("nb"))
      .unionByName(Similarity.withNorm(newBatch, embCol)
        .select(col(keyCol).as("match_id"), col("v").as("vb"), col("norm").as("nb")))
    candCorpus.unionByName(candBatch)
      .join(newSide, Seq("new_id"))
      .join(matchSide, Seq("match_id"))
      .withColumn("cosine", expr("graft_dot(va, vb) / (na * nb)"))
      .filter(col("cosine") >= minCosine)
      .select("new_id", "match_id", "cosine", "source")
  }

  /** Incremental batch-vs-corpus TEXT near-dup detection — the nightly-
    * crawl form of [[jaccardPairsScalable]], mirroring
    * [[incrementalEmbeddingNearDups]]'s contract for the shingle domain:
    * a NEW batch is checked against an existing corpus (and its own
    * earlier-keyed members) without ever re-pairing the corpus with
    * itself. Both sides compute the SAME banded-MinHash signatures
    * (per-table xxhash64 min over the shingle array — the index
    * contract; a production corpus stores its signature table once),
    * candidates come only from signatures the batch occupies, and the
    * exact-Jaccard re-rank touches candidate pairs only. Work scales
    * with the batch and its signature collisions, not the corpus pair
    * count.
    *
    * Keys must be unique across corpus ∪ batch. Output: one row per
    * accepted pair (new_id, match_id, jaccard, source) with source =
    * 'corpus' | 'batch'; within-batch pairs keep the earlier key as the
    * senior match (new_id > match_id — deterministic keep-first).
    */
  def incrementalJaccardNearDups(newBatch: DataFrame, corpus: DataFrame,
      keyCol: String, textCol: String = "text", n: Int = 3,
      minJaccard: Double = 0.5, numTables: Int = 8): DataFrame = {
    val nbArr = shingleArrays(newBatch, keyCol, textCol, n)
      .filter(size(col("sh")) > 0).cache()
    val cbArr = shingleArrays(corpus, keyCol, textCol, n)
      .filter(size(col("sh")) > 0).cache()
    def sigs(arr: DataFrame, idName: String) = arr
      .select(col(keyCol), posexplode(expr(
        s"transform(sequence(0, ${numTables - 1}), " +
          "t -> array_min(transform(sh, s -> xxhash64(s, t))))"))
        .as(Seq("table_id", "sig")))
      .toDF(idName, "table_id", "sig")
    val nb = sigs(nbArr, "new_id")
    val candCorpus = nb.join(sigs(cbArr, "match_id"), Seq("table_id", "sig"))
      .select("new_id", "match_id").distinct()
      .withColumn("source", lit("corpus"))
    val candBatch = nb.join(nb.toDF("match_id", "table_id", "sig"),
        Seq("table_id", "sig"))
      .filter(col("new_id") > col("match_id"))
      .select("new_id", "match_id").distinct()
      .withColumn("source", lit("batch"))
    val newSide = nbArr.select(col(keyCol).as("new_id"), col("sh").as("sha"))
    val matchSide = cbArr.select(col(keyCol).as("match_id"), col("sh").as("shb"))
      .unionByName(nbArr.select(col(keyCol).as("match_id"), col("sh").as("shb")))
    candCorpus.unionByName(candBatch)
      .join(newSide, Seq("new_id"))
      .join(matchSide, Seq("match_id"))
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))).cast("long"))
      .withColumn("jaccard", round(col("inter").cast("double") /
        (size(col("sha")) + size(col("shb")) - col("inter")), 6))
      .filter(col("jaccard") >= minJaccard)
      .select("new_id", "match_id", "jaccard", "source")
  }

  /** SemDeDup — cluster-scoped semantic dedup (Abbas et al. 2023): within
    * each cluster of a coarse partitioning of embedding space, drop every
    * vector that has a more-senior (smaller-key) cluster mate at cosine ≥
    * `tau`; cross-cluster near-dups are deliberately out of scope (that is
    * the technique's scaling contract). The exact within-cluster compare
    * is quadratic ONLY in cluster size, so the partitioning bounds the
    * blowup: n² becomes k·(n/k)² — the reason this runs at corpus scale
    * where a global all-pairs scan cannot.
    *
    * `clusterCol` is the precomputed cluster assignment (in production a
    * KMeans fit — [[graft.similarity.Similarity.ivfTopK]]'s coarse
    * quantizer produces exactly this; the tests use the data's label
    * column). Keep-first-by-key makes the output deterministic and
    * engine-reproducible, unlike centroid-distance tie-breaking.
    *
    * Scale shape: one shuffle on `clusterCol` for the self-join; each
    * cluster's pairs stay in one task. Returns the distinct dropped keys.
    */
  def semDedupDropped(df: DataFrame, tau: Double, keyCol: String = "vec_id",
      clusterCol: String = "label", embCol: String = "embedding"): DataFrame = {
    import graft.similarity.Similarity
    val base = Similarity.withNorm(df, embCol)
      .select(col(keyCol), col(clusterCol).as("_c"), col("v"), col("norm"))
    base.toDF("ka", "_c", "va", "na")
      .join(base.toDF("kb", "_c", "vb", "nb"), Seq("_c"))
      .filter(col("ka") < col("kb"))
      .filter(expr("graft_dot(va, vb) / (na * nb)") >= tau)
      .select(col("kb").as(keyCol)).distinct()
  }

  /** The surviving corpus after [[semDedupDropped]]: one anti-join. */
  def semDedup(df: DataFrame, tau: Double, keyCol: String = "vec_id",
      clusterCol: String = "label", embCol: String = "embedding"): DataFrame =
    df.join(semDedupDropped(df, tau, keyCol, clusterCol, embCol), Seq(keyCol), "left_anti")

  /** Connected components over a near-dup pair graph — the capstone of
    * corpus dedup: banding finds PAIRS, but keeping one document per
    * GROUP needs the transitive closure (a~b, b~c ⇒ one cluster {a,b,c}).
    * Iterative minimum-label propagation: every node repeatedly adopts
    * the smallest label among itself and its neighbors until no label
    * changes. Each iteration is one join + one aggregation (all keyed
    * shuffles, no driver-side graph); iterations are bounded by the
    * cluster diameter — near-dup clusters are shallow (near-cliques), so
    * a handful of rounds converge even at corpus scale. The per-round
    * cache+count cuts lineage growth (the iterative-algorithm
    * checkpoint-lite idiom).
    *
    * Returns (id, cluster_id) for every node appearing in `pairs`, with
    * cluster_id = the minimum member id — the deterministic canonical
    * representative ("keep the smallest doc_id" policy).
    *
    * Lineage is truncated each round — caching alone is NOT enough for
    * iterative joins: the logical plan doubles per iteration and plan
    * construction itself OOMs past ~8 rounds (observed). Two modes:
    *   - `checkpointDir = None` (default, test scale): eager
    *     `localCheckpoint` — fast, but the truncated state lives on
    *     executors and dies with a lost one.
    *   - `checkpointDir = Some(path)` (production): reliable `checkpoint`
    *     to a fault-tolerant filesystem — a multi-hour clustering job
    *     survives executor loss and resumes from the last round's state.
    *
    * Labels are seeded at min(self, neighbors) in one aggregation over the
    * edge list, which is exactly what round 1 of plain min-label
    * propagation would compute — one full join round saved.
    */
  def dedupClusters(pairs: DataFrame, maxIter: Int = 20,
      checkpointDir: Option[String] = None): DataFrame = {
    checkpointDir.foreach(pairs.sparkSession.sparkContext.setCheckpointDir)
    // local path: LAZY checkpoint — lineage is still truncated to a flat
    // leaf (the reason for the checkpoint), but materialization happens
    // inside the iteration's `changed` count instead of its own eager job,
    // halving the actions per propagation round (the loop was job-count
    // bound on bench-scale graphs). The reliable-checkpoint path keeps
    // eager semantics (callers with a checkpointDir want durability).
    def truncate(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint() else df.localCheckpoint(false)
    val edges = truncate(
      pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
        .distinct())
    // seed from the neighborhood minimum: every node in `pairs` appears as
    // src (edges hold both directions), so one groupBy covers all nodes.
    // The SEED stays eager even on the local path: round 1 references it
    // (and `edges` beneath it) from two branches of one job, and an
    // unmaterialized lazy checkpoint would compute the possibly-expensive
    // upstream pair generator's narrow segments twice.
    var labels = edges.groupBy("src")
      .agg(least(col("src"), min(col("dst"))).as("label"))
      .toDF("id", "label")
    labels = if (checkpointDir.isDefined) labels.checkpoint()
             else labels.localCheckpoint(true)
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val nbrMin = edges
        .join(labels.toDF("dst", "nlabel"), Seq("dst"))
        .groupBy("src").agg(min(col("nlabel")).as("nbr_min"))
        .toDF("id", "nbr_min")
      val updated = truncate(labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("label"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("next")))
      changed = updated.filter(col("next") < col("label")).count()
      labels = updated.select(col("id"), col("next").as("label"))
      i += 1
    }
    labels.withColumnRenamed("label", "cluster_id")
  }

  /** The last step of the dedup workflow: given the corpus and its
    * near-dup pair graph, pick ONE representative per connected cluster
    * (highest `qualityCol`, ties to the lowest key — deterministic) and
    * flag everything else for drop. Documents outside any cluster are
    * their own singleton cluster and are kept. This is "dedup with a
    * keep-best policy" — what a curation pipeline actually writes out,
    * as opposed to the pair/cluster diagnostics upstream.
    *
    * Output: every input row with (cluster_id, is_kept); filter
    * `is_kept` for the surviving corpus, or aggregate on `cluster_id`
    * for audit counts.
    *
    * Shape: the [[dedupClusters]] label propagation (bounded rounds) +
    * one left join of the corpus against the (small — clustered docs
    * only) label table + one per-cluster WindowGroupLimit-style
    * row_number. No new scale hazards beyond the clustering itself.
    */
  def keepRepresentatives(docs: DataFrame, pairs: DataFrame, keyCol: String,
      qualityCol: String, maxIter: Int = 20,
      checkpointDir: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val labels = dedupClusters(pairs, maxIter, checkpointDir)
      .withColumnRenamed("id", keyCol)
    docs.join(labels, Seq(keyCol), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col(keyCol)))
      .withColumn("_r", row_number().over(
        Window.partitionBy("cluster_id")
          .orderBy(col(qualityCol).desc, col(keyCol))))
      .withColumn("is_kept", col("_r") === 1)
      .drop("_r")
  }

  /** Leakage-safe train/validation/test split: the split is decided per
    * near-dup CLUSTER, not per document, so two near-duplicates can never
    * land on opposite sides of the train/test boundary — the classic
    * contamination path a per-row split leaves open (a benchmark answer's
    * paraphrase in train, the original in test). Singletons split by
    * their own key; the assignment is the salted-md5 hash of the cluster
    * id (the engine-portable mixture-sampling idiom — change the salt
    * for an independent split), so it is reproducible across runs,
    * partitionings and engines and never re-rolls when unrelated
    * documents arrive.
    *
    * Shape: the [[dedupClusters]] propagation + one left join + one
    * projection; no shuffle beyond the clustering itself.
    */
  def leakageSafeSplit(docs: DataFrame, pairs: DataFrame, keyCol: String,
      trainPct: Int = 70, validPct: Int = 20, salt: String = "split0",
      maxIter: Int = 20): DataFrame = {
    require(trainPct > 0 && validPct >= 0 && trainPct + validPct < 100,
      s"need 0 < trainPct, 0 <= validPct, trainPct + validPct < 100: $trainPct/$validPct")
    val labels = dedupClusters(pairs, maxIter).withColumnRenamed("id", keyCol)
    docs.join(labels, Seq(keyCol), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col(keyCol)))
      .withColumn("_h",
        conv(substring(md5(concat(lit(salt), col("cluster_id").cast("string")).cast("binary")),
          1, 4), 16, 10).cast("long") % 100)
      .withColumn("data_split",
        when(col("_h") < trainPct, "train")
          .when(col("_h") < trainPct + validPct, "validation")
          .otherwise("test"))
      .drop("_h")
  }

  /** 64-bit SimHash signature per document: per-token xxhash64, each bit
    * votes +1/−1, sign of the vote sum sets the bit. One explode + one
    * aggregation (64 conditional sums fused in a single pass).
    */
  def simHash(df: DataFrame, keyCol: String, textCol: String = "text"): DataFrame = {
    // Par.boost: tokenize + explode + the 64 partial vote sums all run
    // before the first exchange — on a single-split local scan that whole
    // pass was single-core (guide §2.6; no-op at production scan widths)
    val toks = TextAnalysis.withTokens(graft.core.Par.boost(df), textCol)
      .select(col(keyCol), explode(col("tokens")).as("token"))
      .withColumn("h", xxhash64(col("token")))
    // branch-free votes: vote_b = Σ(bit_b ? 1 : −1) = 2·cnt_b − n, so
    // vote_b > 0 ⟺ 2·cnt_b > n — the 64 conditional sums become 64
    // shift-and sums plus one count, identical signatures at ~half the
    // per-row aggregation cost (measured: the 64-agg pass was the
    // largest single phase of q_simhash)
    val voteAggs = (0 until 64).map { b =>
      sum(expr(s"(h >> $b) & 1L")).as(s"_b$b")
    } :+ count(lit(1)).as("_n")
    val voted = toks.groupBy(keyCol).agg(voteAggs.head, voteAggs.tail: _*)
    val sig = (0 until 64).map { b =>
      when(col(s"_b$b") * 2 > col("_n"), lit(1L << b)).otherwise(lit(0L))
    }.reduce((a: Column, c: Column) => a.bitwiseOR(c))
    voted.withColumn("simhash", sig).select(col(keyCol), col("simhash"))
  }

  /** SimHash near-dup candidates: split the 64-bit signature into `bands`
    * equal bands; docs sharing any band are candidates (bucket join), then
    * filter by exact Hamming distance <= maxHamming.
    */
  def simHashPairs(df: DataFrame, keyCol: String, textCol: String = "text",
      bands: Int = 4, maxHamming: Int = 8): DataFrame =
    simHashPairsFromSigs(simHash(df, keyCol, textCol).cache(), keyCol,
      bands, maxHamming)

  /** [[simHashPairs]] over a pre-built (keyCol, simhash) signature frame —
    * in production the 64-bit signatures are a standing corpus artifact
    * (one 64-agg token pass per refresh, not per consumer); see
    * [[graft.dedup.PairGraph.documentsSimHash]].
    */
  def simHashPairsFromSigs(sigs: DataFrame, keyCol: String,
      bands: Int = 4, maxHamming: Int = 8): DataFrame = {
    val width = 64 / bands
    val banded = sigs.select(col(keyCol), col("simhash"),
      explode(expr(
        s"transform(sequence(0, ${bands - 1}), b -> named_struct('band', b, 'key', (simhash >> (b * $width)) & ${(1L << width) - 1}L))"))
        .as("bk"))
      .select(col(keyCol), col("simhash"), col("bk.band"), col("bk.key"))
    banded.toDF("doc_a", "sig_a", "band", "key")
      .join(banded.toDF("doc_b", "sig_b", "band", "key"), Seq("band", "key"))
      .filter(col("doc_a") < col("doc_b"))
      // hamming BEFORE the distinct: the cheap bit_count filter drops the
      // vast majority of band collisions pre-shuffle, so the distinct
      // de-dups only true near-candidates instead of every co-banded pair
      .withColumn("hamming", expr("bit_count(sig_a ^ sig_b)"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming").distinct()
  }
}
