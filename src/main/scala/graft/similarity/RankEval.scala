package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking-quality evaluation over a retrieval run — the offline eval
  * harness every retrieval/dedup/ANN stack needs next to its index
  * (Järvelin & Kekäläinen's nDCG, the TREC MRR/recall@k staples): given a
  * ranked run (query, doc, rank) and graded relevance judgments (query,
  * doc, rel), produce per-query nDCG@k, MRR@k and recall@k.
  *
  * Exactness contract: DCG's 1/log₂(rank+1) discounts are the ONLY
  * irrational ingredient, so they are pre-rounded ONCE into an integer
  * micro-weight table ([[dcgWeightMicros]] — w(r) = floor(10⁶/log₂(r+1)
  * + 0.5), k entries, injected as a literal CASE into both the Spark plan
  * and any SQL oracle). Every downstream step is integer arithmetic —
  * rel·w(r) products, order-free Long sums, `div` ratios — so per-query
  * metrics replay bit-for-bit on any engine regardless of aggregation
  * order. No floating-point sum ever crosses a groupBy.
  *
  * Scale shape: one keyed join of the run against the judgments (both
  * shuffle on query/doc — no broadcast assumption on either side), one
  * groupBy per query, and a window over the JUDGMENTS only (per-query
  * judgment lists are bounded by construction — qrels are human/planted
  * labels, not corpus-sized). The run itself is never windowed; ranks
  * arrive from the retrieval stage.
  */
object RankEval {

  /** Integer micro-weights for DCG discounts: w(r) = floor(10⁶/log₂(r+1)
    * + 0.5) for r = 1..k — computed once driver-side so both engines
    * consume identical constants.
    */
  def dcgWeightMicros(k: Int): IndexedSeq[Long] =
    (1 to k).map(r => math.floor(1e6 / (math.log(r + 1.0) / math.log(2.0)) + 0.5).toLong)

  /** The weight table as a SQL CASE expression over a rank column —
    * shared VERBATIM by the Spark plan and the DuckDB oracle (hence
    * `CAST(… AS BIGINT)` literals, the spelling both engines accept). */
  def dcgWeightCase(k: Int, rankCol: String): String =
    dcgWeightMicros(k).zipWithIndex
      .map { case (w, i) => s"WHEN $rankCol = ${i + 1} THEN CAST($w AS BIGINT)" }
      .mkString("CASE ", " ", " ELSE CAST(0 AS BIGINT) END")

  /** Per-query ranking metrics at cutoff `k`.
    *
    * `run`: (queryCol, docCol, rankCol) with rank 1-based from the
    * retrieval stage (e.g. [[Similarity.bruteForceTopK]]'s output).
    * `qrels`: (queryCol, docCol, relCol) graded judgments, rel ≥ 1;
    * queries in `run` with no judgments get idcg 0 and all-zero metrics.
    *
    * Output per query: (queryCol, n_rel, found_rel, dcg_micros,
    * idcg_micros, ndcg_micros, mrr_micros, ap_micros, recall_micros) —
    * all BIGINT:
    *  - dcg_micros  = Σ_{hits at rank r ≤ k} rel · w(r)
    *  - idcg_micros = Σ_{i ≤ min(k, n_rel)} rel_sorted_desc(i) · w(i)
    *  - ndcg_micros = dcg · 10⁶ div idcg (0 when idcg = 0)
    *  - mrr_micros  = 10⁶ div (first relevant rank ≤ k) (0 when none)
    *  - ap_micros   = AP@k in micros: Σ_{j-th hit at rank r_j}
    *    floor(j · 10⁶ / r_j), div min(n_rel, k) — each precision term
    *    floored independently so the sum is order-free
    *  - recall_micros = found_rel · 10⁶ div n_rel
    */
  def rankingMetrics(run: DataFrame, qrelsRaw: DataFrame, k: Int,
      queryCol: String = "query_id", docCol: String = "neighbor_id",
      rankCol: String = "rank", relCol: String = "rel"): DataFrame = {
    require(k >= 1, s"cutoff must be positive: $k")
    // Enforce the documented rel ≥ 1 contract: TREC-style qrels carry
    // explicit rel = 0 (judged non-relevant) rows, which must not count
    // into found_rel / MRR / AP / recall. Filter rather than require —
    // negative judgments are legitimate input, they just aren't relevant.
    val qrels = qrelsRaw.filter(col(relCol) >= 1)
    val wCase = dcgWeightCase(k, rankCol)

    // Ideal DCG + totals from the judgments alone: the window runs over
    // per-query judgment lists (bounded), never the run.
    val ideal = qrels
      .withColumn("ideal_rank", row_number().over(
        Window.partitionBy(queryCol).orderBy(col(relCol).desc, col(docCol))))
      .groupBy(queryCol)
      .agg(
        count(lit(1)).as("n_rel"),
        sum(when(col("ideal_rank") <= k,
          col(relCol).cast("long") * expr(dcgWeightCase(k, "ideal_rank")))
          .otherwise(0L)).as("idcg_micros"))

    // Hits: run rows (rank <= k) that carry a judgment. The hit-index
    // window runs over per-query HIT lists (≤ k rows by the rank filter).
    val hits = run.filter(col(rankCol) <= k)
      .join(qrels, Seq(queryCol, docCol))
      .withColumn("hit_idx", row_number().over(
        Window.partitionBy(queryCol).orderBy(col(rankCol))))
      .groupBy(queryCol)
      .agg(
        count(lit(1)).as("found_rel"),
        sum(col(relCol).cast("long") * expr(wCase)).as("dcg_micros"),
        min(col(rankCol)).as("first_rel_rank"),
        sum(expr(s"hit_idx * 1000000L div $rankCol")).as("ap_num"))

    ideal.join(hits, Seq(queryCol), "left")
      .select(
        col(queryCol),
        col("n_rel"),
        coalesce(col("found_rel"), lit(0L)).as("found_rel"),
        coalesce(col("dcg_micros"), lit(0L)).as("dcg_micros"),
        col("idcg_micros"),
        col("first_rel_rank"),
        col("ap_num"))
      .withColumn("ndcg_micros",
        when(col("idcg_micros") === 0, lit(0L))
          .otherwise(expr("dcg_micros * 1000000L div idcg_micros")))
      .withColumn("mrr_micros",
        when(col("first_rel_rank").isNull, lit(0L))
          .otherwise(expr("1000000L div first_rel_rank")))
      .withColumn("ap_micros",
        when(col("n_rel") === 0, lit(0L))
          .otherwise(expr(s"coalesce(ap_num, 0L) div least(n_rel, ${k}L)")))
      .drop("first_rel_rank", "ap_num")
      .withColumn("recall_micros",
        when(col("n_rel") === 0, lit(0L))
          .otherwise(expr("found_rel * 1000000L div n_rel")))
  }
}
