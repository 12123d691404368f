package graft.similarity

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Retrieval composition — the layer between the individual scorers
  * ([[Similarity]] cosine ANN, `graft.text.TextAnalysis.bm25` lexical) and
  * what a RAG / data-curation pipeline actually consumes: a single fused
  * candidate list, optionally diversified.
  *
  *  - [[rankByScore]]: turn any scored table into a bounded (key, rank)
  *    list — distributed TakeOrdered cut first, ranks assigned on the
  *    bounded remainder.
  *  - [[rrfFuse]]: Reciprocal Rank Fusion (Cormack & Clarke SIGIR'09) of
  *    N ranked lists: score(d) = Σ_lists 1/(K + rank_list(d)). Rank-based,
  *    so it needs NO score calibration between heterogeneous retrievers —
  *    the standard hybrid-search combiner.
  *  - [[mmr]]: Maximal Marginal Relevance (Carbonell & Goldstein '98)
  *    greedy diversified top-k over a BOUNDED candidate pool.
  *
  * Determinism: ranks are total orders (score, then key); RRF points are
  * integer micros; MMR arithmetic is fixed-sequence double ops on inputs
  * rounded to 6 decimals — all engine- and partition-order independent.
  */
object Retrieval {

  /** Bounded ranked list from any scored table: top `n` by
    * (`scoreCol` desc, `keyCol` asc), with `rank` = 1..n assigned AFTER
    * the cut. The cut is a distributed TakeOrderedAndProject (no global
    * sort materialization); the unpartitioned row_number window then runs
    * on ≤ n rows — bounded by construction, not a scale hazard.
    */
  def rankByScore(scored: DataFrame, keyCol: String, scoreCol: String,
      n: Int): DataFrame = {
    require(n > 0, "n must be positive")
    scored.orderBy(col(scoreCol).desc, col(keyCol)).limit(n)
      .withColumn("rank", row_number().over(
        Window.orderBy(col(scoreCol).desc, col(keyCol))).cast("long"))
  }

  /** Reciprocal Rank Fusion over ranked lists (each: one row per key with
    * a 1-based `rank` column; bounded lists from [[rankByScore]] or an
    * ANN top-k). Output per key:
    *
    *   rrf_micros = Σ_lists floor(1e6 / (kRrf + rank) + 0.5)
    *
    * — the RRF sum in integer micros (one double division per membership,
    * identical on every engine), plus `n_lists` (how many retrievers
    * surfaced the key — the agreement signal) and `best_rank`. K = 60 is
    * the paper's robust default: it damps the head so one retriever's #1
    * cannot dominate two retrievers' #5s.
    *
    * Shape: union of bounded lists → one groupBy on the key. No joins, so
    * N-way fusion is N list scans + one shuffle of Σ list sizes.
    */
  def rrfFuse(rankings: Seq[DataFrame], keyCol: String,
      kRrf: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(kRrf >= 0, "kRrf must be non-negative")
    rankings
      .map(_.select(col(keyCol), col("rank").cast("long").as("rank")))
      .reduce(_.union(_))
      .groupBy(keyCol)
      .agg(
        count(lit(1)).as("n_lists"),
        min(col("rank")).as("best_rank"),
        sum(expr(s"CAST(floor(1e6 / ($kRrf + rank) + 0.5) AS BIGINT)"))
          .as("rrf_micros"))
  }

  /** Maximal Marginal Relevance: greedy top-`k` balancing relevance to a
    * query against redundancy with what is already selected,
    *
    *   pick argmax_d  λ·rel(d) − (1−λ)·max_{s ∈ selected} sim(d, s)
    *
    * over a candidate pool of the `candPool` highest-cosine neighbors of
    * `queryId` (ties broken by key everywhere). rel and sim are cosines
    * rounded to 6 decimals; the score expression is evaluated as written,
    * so an exact-SQL oracle can replay the selection step for step.
    *
    * Scale contract, stated honestly: the corpus scan (cosine vs the
    * 1-row broadcast query, TakeOrdered cut) is fully distributed; the
    * greedy phase runs on the DRIVER over the collected pool — O(candPool
    * · k) dot products on a deliberately bounded set (the same class of
    * bounded driver material as IVF centroids or LSH planes). MMR is
    * sequential by definition — each pick conditions the next — so the
    * bounded pool is what makes it tractable at any corpus size.
    *
    * Output: (rank 1..k, key, relevance) — relevance is the static cosine
    * to the query, the selection-time marginal score being ephemeral.
    */
  def mmr(df: DataFrame, keyCol: String, queryId: Long, k: Int,
      lambda: Double = 0.7, candPool: Int = 50,
      embCol: String = "embedding"): DataFrame = {
    require(k >= 1 && candPool >= k, s"need candPool >= k >= 1: $candPool, $k")
    require(lambda >= 0 && lambda <= 1, s"lambda in [0,1]: $lambda")
    val spark = df.sparkSession
    val base = Similarity.withNorm(df, embCol)
      .select(col(keyCol).cast("long").as("id"), col("v"), col("norm"))
    val q = base.filter(col("id") === queryId)
      .select(col("v").as("qv"), col("norm").as("qnorm"))
    val cands = base.filter(col("id") =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("rel", round(expr("graft_dot(qv, v) / (qnorm * norm)"), 6))
      .orderBy(col("rel").desc, col("id"))
      .limit(candPool)
      .select(col("id"), col("v"), col("norm"), col("rel"))

    // bounded collect: candPool rows (documented contract above)
    case class Cand(id: Long, v: Array[Double], norm: Double, rel: Double)
    val pool = cands.collect().map { r =>
      Cand(r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2), r.getDouble(3))
    }.sortBy(_.id)

    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    // cosine rounded to 6 decimals, matching Spark/DuckDB round() HALF_UP
    def sim(a: Cand, b: Cand): Double =
      BigDecimal(dot(a.v, b.v) / (a.norm * b.norm))
        .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble

    val selected = scala.collection.mutable.ArrayBuffer.empty[Cand]
    val remaining = scala.collection.mutable.ArrayBuffer(pool: _*)
    while (selected.length < math.min(k, pool.length)) {
      // candidates iterate in id order, strict > keeps the lowest id on ties
      val best = remaining.maxBy { c =>
        val score =
          if (selected.isEmpty) c.rel
          else lambda * c.rel - (1 - lambda) * selected.iterator.map(sim(c, _)).max
        (score, -c.id)
      }
      selected += best
      remaining -= best
    }
    val rows = selected.zipWithIndex.map { case (c, i) =>
      Row((i + 1).toLong, c.id, c.rel)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1),
      StructType(Seq(
        StructField("rank", LongType, nullable = false),
        StructField(keyCol, LongType, nullable = false),
        StructField("relevance", DoubleType, nullable = false))))
  }

  /** DuckDB oracle for [[mmr]] — the greedy selection replayed as a
    * recursive CTE carrying the picked-list, each step choosing the same
    * argmax by the same formula over the same rounded inputs. Kept beside
    * the operator so the lockstep is reviewable in one place.
    *
    * `embTableSql` must produce (vec_id, embedding); λ is emitted as
    * `$lambda` and `(1 - $lambda)` so both engines parse the identical
    * double literals.
    */
  def mmrOracleSql(queryId: Long, k: Int, lambda: Double, candPool: Int,
      embTable: String = "embeddings", keyCol: String = "vec_id"): String =
    s"""WITH RECURSIVE n AS (SELECT $keyCol AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM $embTable),
       |nn AS (SELECT id, v, sqrt(list_sum(list_transform(list_zip(v, v), z -> z[1] * z[2]))) AS nrm FROM n),
       |q AS (SELECT v AS qv, nrm AS qn FROM nn WHERE id = $queryId),
       |cand AS (SELECT id, v, nrm,
       |    round(list_sum(list_transform(list_zip(v, qv), z -> z[1] * z[2])) / (nrm * qn), 6) AS rel
       |  FROM nn, q WHERE id <> $queryId ORDER BY rel DESC, id LIMIT $candPool),
       |sim AS (SELECT a.id AS ia, b.id AS ib,
       |    round(list_sum(list_transform(list_zip(a.v, b.v), z -> z[1] * z[2])) / (a.nrm * b.nrm), 6) AS s
       |  FROM cand a JOIN cand b ON a.id < b.id),
       |sel AS (
       |  SELECT 1 AS step, [(SELECT id FROM cand ORDER BY rel DESC, id LIMIT 1)] AS picked
       |  UNION ALL
       |  SELECT step + 1, list_append(picked, (
       |      SELECT c.id FROM cand c WHERE NOT list_contains(picked, c.id)
       |      ORDER BY $lambda * c.rel - (1 - $lambda) * (
       |          SELECT max(s.s) FROM sim s
       |          WHERE (list_contains(picked, s.ia) AND s.ib = c.id)
       |             OR (list_contains(picked, s.ib) AND s.ia = c.id)) DESC, c.id
       |      LIMIT 1))
       |  FROM sel WHERE step < $k),
       |last AS (SELECT picked FROM sel ORDER BY step DESC LIMIT 1),
       |out AS (SELECT unnest(picked) AS id, generate_subscripts(picked, 1) AS rank FROM last)
       |SELECT CAST(o.rank AS BIGINT) AS rank, o.id AS $keyCol, c.rel AS relevance
       |FROM out o JOIN cand c USING (id)""".stripMargin
}
