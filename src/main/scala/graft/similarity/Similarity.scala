package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  *  - [[bruteForceTopK]]: exact cosine top-k of a bounded query set against
  *    the corpus — broadcast the queries, never cross-join corpus×corpus.
  *    All arithmetic is double-precision sequential folds, so results are
  *    bit-reproducible (and oracle-comparable) across engines.
  *  - [[lshTopK]]: random-hyperplane LSH — seeded deterministic hyperplanes,
  *    candidates only from matching sign-bucket, exact re-rank inside the
  *    bucket. The bucket join is the 100 TB path: candidate count per query
  *    is corpus/2^planes on average instead of the whole corpus.
  */
object Similarity {

  /** Double-precision sequential dot product — the native codegen
    * expression (graft.functions.DotProduct); bit-identical to the
    * higher-order `aggregate(zip_with(...))` fold it replaced, but a tight
    * primitive loop inside WholeStageCodegen instead of interpreted lambdas.
    */
  private def dot(a: String, b: String): String = s"graft_dot($a, $b)"

  /** Adds `v` (double array) and `norm` columns. */
  def withNorm(df: DataFrame, embCol: String = "embedding"): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.withColumn("v", expr(s"transform($embCol, x -> CAST(x AS DOUBLE))"))
      .withColumn("norm", expr(s"sqrt(${dot("v", "v")})"))
  }

  /** Exact cosine top-k: queries (selected by `queryPred` on the key) are
    * broadcast against the full corpus; rank by (cosine desc, key asc).
    */
  def bruteForceTopK(df: DataFrame, keyCol: String, queryPred: Column, k: Int,
      embCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = withNorm(df, embCol).select(col(keyCol), col("v"), col("norm"))
    val queries = base.filter(queryPred)
      .toDF("query_id", "qv", "qnorm")
    val pairs = base.toDF("neighbor_id", "nv", "nnorm")
      .join(broadcast(queries), col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", expr(s"${dot("qv", "nv")} / (qnorm * nnorm)"))
    pairs
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("neighbor_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Dimension-truncation recall — the Matryoshka-representation screen
    * (Kusupati et al. 2022): how much of the FULL-dimension exact top-k
    * does the first-`dims`-coordinates prefix retain? The number that
    * decides whether a cheap low-dim prefilter (scan 16 of 64 dims,
    * re-rank survivors at full width) is safe for a corpus — recall ≈ 1
    * means the prefix ordering is faithful and the scan cost divides by
    * d/dims.
    *
    * Both sides are the exact [[bruteForceTopK]] contract (broadcast
    * queries, never corpus × corpus beyond the bounded query set); the
    * truncated side slices BEFORE normalizing, as a prefix index would.
    * Output per query: (query_id, hits, recall_micros) with
    * recall = hits·10⁶ div k once-rounded.
    */
  def truncationRecall(df: DataFrame, keyCol: String, queryPred: Column,
      k: Int, dims: Int, embCol: String = "embedding"): DataFrame = {
    require(dims >= 1, "dims must be >= 1")
    val full = bruteForceTopK(df, keyCol, queryPred, k, embCol)
      .select("query_id", "neighbor_id")
    val trunc = bruteForceTopK(
        df.withColumn("_t", expr(s"slice($embCol, 1, $dims)")),
        keyCol, queryPred, k, "_t")
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("_hit"))
    full.join(trunc, Seq("query_id", "neighbor_id"), "left")
      .na.fill(0L, Seq("_hit"))
      .groupBy("query_id")
      .agg(sum("_hit").as("hits"))
      .withColumn("recall_micros", expr(s"hits * 1000000L div ${k}L"))
  }

  /** Mutual nearest neighbors — the bitext/duplicate MINING primitive
    * (CCMatrix-direction: a pair is trusted when each side is the
    * OTHER's best match, which kills the asymmetric hub matches a
    * one-directional top-1 keeps): pairs (a, b), a < b, where b is a's
    * cosine top-1 and a is b's. This exact form broadcasts the corpus
    * against itself through [[bruteForceTopK]] — right for bounded
    * corpora and as the oracle-checkable contract; at 100 TB compose the
    * same mutuality join over [[ivfTopKFor]]'s per-query candidates
    * instead (the registered ANN path). Ties break (cosine DESC, id ASC)
    * — deterministic. Output: (id_a, id_b, cosine).
    */
  def mutualNearestNeighbors(df: DataFrame, keyCol: String,
      embCol: String = "embedding"): DataFrame = {
    // top-1 as a groupBy-MAX over struct(cosine, −neighbor) rather than a
    // row_number window: the same (cosine DESC, neighbor ASC) total order,
    // but partial-aggregated map-side — each task reduces its pair block
    // to one candidate per query before the shuffle, where the window
    // form shuffles and sorts every pair row.
    val base = withNorm(df, embCol).select(col(keyCol), col("v"), col("norm"))
    // The streamed side of the broadcast NL join inherits the SCAN's
    // partitioning — a corpus that fits one parquet split runs the whole
    // O(n²·d) dot-product sweep in ONE task. Round-robin repartition
    // spreads the streamed rows over the session's shuffle parallelism;
    // the shuffled bytes are n embedding rows, negligible next to the
    // n²·d compute they unlock.
    val nn = base.toDF("neighbor_id", "nv", "nnorm")
      .repartition(df.sparkSession.sessionState.conf.numShufflePartitions)
      .join(broadcast(base.toDF("query_id", "qv", "qnorm")),
        col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", expr(s"${dot("qv", "nv")} / (qnorm * nnorm)"))
      .groupBy("query_id")
      .agg(max(struct(col("cosine"), (-col("neighbor_id")).as("_nneg"))).as("_b"))
      .select(col("query_id"), (-col("_b._nneg")).as("neighbor_id"),
        col("_b.cosine").as("cosine"))
      // one row per vector: materialize so the mutuality self-join reads
      // the tiny top-1 table twice instead of re-running the corpus scan
      // on both sides (the plan otherwise carries two BNLJ branches)
      .localCheckpoint()
    nn.as("x").join(nn.as("y"),
        col("x.query_id") === col("y.neighbor_id") &&
          col("x.neighbor_id") === col("y.query_id") &&
          col("x.query_id") < col("x.neighbor_id"))
      .select(col("x.query_id").as("id_a"), col("x.neighbor_id").as("id_b"),
        col("x.cosine").as("cosine"))
  }

  /** Exact mean pairwise cosine per group in O(n·d) — the corpus
    * diversity statistic (SemDeDup-style collapse detection: a cluster
    * whose embeddings all point the same way has nothing left to teach)
    * computed WITHOUT the O(n²) pairwise scan, via the centroid identity
    *
    *   Σ_{i≠j} uᵢ·uⱼ = ‖Σᵢ uᵢ‖² − Σᵢ ‖uᵢ‖²
    *
    * over unit-normalized vectors u. The engine never materializes a
    * pair: one per-component exact integer sum (d rows per group) and
    * one per-row squared-norm sum. Determinism: components are
    * unit-normalized in sequential double folds, micro-quantized to
    * BIGINT (the repo-wide portable-exactness contract), so every sum is
    * an exact integer; the only doubles are the final decimal→double
    * cast and a fixed left-associated division chain — bit-equal across
    * engines and partitionings. Micro-quantization puts the statistic
    * within ~2·d·1e-6 of the float-exact value, a bias the spec pins.
    *
    * At 100 TB: linear scan, two keyed aggregations (both map-side
    * combinable — per-task state is d counters per group), no window,
    * no collect. Output: (groupCol, n, mean_cosine), groups with n ≥ 2.
    */
  def meanPairwiseCosine(df: DataFrame, groupCol: String,
      embCol: String = "embedding"): DataFrame = {
    val q = withNorm(df, embCol)
      .filter(col("norm") > 0)
      .withColumn("q",
        expr("transform(v, x -> CAST(floor(x / norm * 1e6 + 0.5) AS BIGINT))"))
      .select(col(groupCol), col("q"),
        expr("aggregate(q, 0L, (a, x) -> a + x * x)").as("_rowsq"))
    val comp = q
      .select(col(groupCol), posexplode(col("q")).as(Seq("_k", "_qk")))
      .groupBy(col(groupCol), col("_k"))
      .agg(sum(col("_qk")).as("_s"))
    val ssum = comp.groupBy(groupCol)
      .agg(sum(col("_s").cast("decimal(19,0)") * col("_s").cast("decimal(19,0)"))
        .as("_ssum"))
    q.groupBy(groupCol)
      .agg(count(lit(1)).as("n"), sum(col("_rowsq").cast("decimal(19,0)")).as("_sumsq"))
      .join(ssum, Seq(groupCol))
      .filter(col("n") >= 2)
      .withColumn("mean_cosine",
        expr("CAST(_ssum - _sumsq AS DOUBLE) / n / (n - 1) / 1e12"))
      .select(col(groupCol), col("n"), col("mean_cosine"))
  }

  /** Deterministic seeded Gaussian hyperplanes. */
  def hyperplanes(dim: Int, nPlanes: Int, seed: Long): Seq[(Int, Seq[Double])] = {
    val rnd = new scala.util.Random(seed)
    (0 until nPlanes).map(p => p -> Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Multi-table sign-bucket assignment: for each of `numTables` seeded
    * plane sets, bucket = bitmask of sign(plane · v). Long format:
    * (key, table, bucket). Multiple tables are what make hyperplane LSH
    * usable — candidate if the pair agrees in ANY table, recall
    * ≈ 1 − (1 − p^m)^L for per-plane agreement p.
    */
  def withBuckets(df: DataFrame, keyCol: String, nPlanes: Int, numTables: Int,
      seed: Long, embCol: String = "embedding"): DataFrame = {
    val dim = df.select(size(col(embCol))).head().getInt(0)
    // All numTables buckets per row in ONE native codegen'd projection
    // (graft_lsh_buckets) instead of exploding the corpus across the
    // numTables·nPlanes plane rows and re-collecting the bits with a
    // (key, table) groupBy — that form paid a corpus×planes Exchange per
    // bucketing pass (guide §2.4: remove shuffles outright). The planes
    // ride along as one foldable array<array<double>> literal
    // (table-major, plane-minor); dot products are the same sequential
    // graft_dot fold, so bucket values are bit-identical
    // (LshExpressionsSpec asserts equality with the join+groupBy form).
    val planes: Seq[Seq[Double]] = (0 until numTables).flatMap { t =>
      hyperplanes(dim, nPlanes, seed + t).map(_._2)
    }
    graft.functions.GraftFunctions.register(df.sparkSession)
    withNorm(df, embCol)
      .select(col(keyCol), posexplode(call_function("graft_lsh_buckets",
        col("v"), typedlit(planes), lit(nPlanes))).as(Seq("table_id", "bucket")))
      .select(col(keyCol), col("table_id").cast("int").as("table_id"),
        col("bucket"))
  }

  /** IVF (inverted-file) approximate top-k: a seeded KMeans coarse
    * quantizer partitions the corpus into `nClusters` cells; each query
    * probes its `nProbe` nearest cells and exact-ranks only their members.
    * Work per query ≈ nProbe/nClusters of the corpus. Higher recall per
    * candidate than hyperplane LSH when the corpus is clusterable; the
    * centroid table is tiny and broadcast.
    */
  def ivfTopK(df: DataFrame, keyCol: String, queryPred: Column, k: Int,
      nClusters: Int = 16, nProbe: Int = 4, seed: Long = 42L,
      embCol: String = "embedding"): DataFrame =
    ivfTopKWith(df, keyCol, a => a.filter(queryPred), k, nClusters, nProbe, seed, embCol)

  /** [[ivfTopK]] with the query set given as a key DataFrame — same
    * rationale as [[lshTopKFor]]. */
  def ivfTopKFor(df: DataFrame, keyCol: String, queryIds: DataFrame, k: Int,
      nClusters: Int = 16, nProbe: Int = 4, seed: Long = 42L,
      embCol: String = "embedding"): DataFrame =
    ivfTopKWith(df, keyCol,
      a => a.join(broadcast(queryIds.select(col(keyCol))), Seq(keyCol)),
      k, nClusters, nProbe, seed, embCol)

  private def ivfTopKWith(df: DataFrame, keyCol: String,
      selectQueries: DataFrame => DataFrame, k: Int,
      nClusters: Int, nProbe: Int, seed: Long, embCol: String): DataFrame = {
    val centroids = ivfCentroids(df, nClusters, seed, embCol)
    val assigned = ivfAssign(df, keyCol, centroids, embCol)
    ivfTopKFromIndex(assigned,
      a => selectQueries(a.select(col(keyCol), col("v"), col("norm"),
        col("cell"))),
      centroids, k, nProbe)
  }

  /** The IVF coarse quantizer's centroid table — (cell, centroid): a
    * seeded KMeans fit, few iterations (cells only route candidates, the
    * exact re-rank fixes assignment fuzziness; 4 iters measured
    * recall-equivalent to 8 on the planted-pair gate at half the fit
    * cost). This is the FROZEN half of a standing IVF index: appends
    * assign against it without refitting.
    */
  def ivfCentroids(df: DataFrame, nClusters: Int, seed: Long = 42L,
      embCol: String = "embedding"): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    // (A round-14 A/B boosted this fit input to session parallelism and
    // LOST ~0.6 s on q_ann_ivf: KMeans runs several jobs per iteration,
    // and 32 tasks per tiny job cost more than the parallel distance
    // pass saved — the fit input stays as scanned.)
    val base = withNorm(df, embCol).select(col("v"))
      .withColumn("features", array_to_vector(col("v")))
    val model = new KMeans().setK(nClusters).setSeed(seed).setMaxIter(4)
      .setFeaturesCol("features").setPredictionCol("cell").fit(base)
    df.sparkSession.createDataFrame(
      model.clusterCenters.zipWithIndex.toSeq.map { case (c, i) => (i, c.toArray.toSeq) })
      .toDF("cell", "centroid")
  }

  /** Past this many codebook doubles (nClusters × dim), [[ivfAssign]]
    * switches from the compiled least-of-structs expression to the
    * broadcast-join argmin: the expression path inlines every centroid
    * coordinate as a literal, and a production codebook (4096 × 768 =
    * 3.1M doubles) would compile to a multi-MB SQL expression that blows
    * past Janino/whole-stage-codegen method limits — silent interpreted
    * fallback at best. 16384 (≈256 cells × 64 dims) stays comfortably
    * inside codegen; both paths compute the identical assignment (same
    * fold order, same (d2, cell) tie-break — SimilaritySpec asserts the
    * equivalence), so the switch is invisible to callers.
    */
  val IvfAssignExprMaxDoubles = 16384

  /** Assign vectors to a FROZEN centroid table — the IVF index append:
    * argmin squared-L2 with ties to the lower cell id (a stated total
    * order, so incremental assignment of a batch is definitionally
    * identical to assigning the union: the same pure per-row function
    * either way). Output: (keyCol, v, norm, cell).
    *
    * Small codebooks (≤ [[IvfAssignExprMaxDoubles]] inlined doubles)
    * compile to one least-of-structs projection: zero shuffle, no
    * explode, whole-stage codegen. Larger codebooks broadcast the
    * centroid array to the executors and argmin per row in a
    * mapPartitions pass — still zero shuffle, still O(n·k·d), the same
    * left-to-right distance fold and (d2, cell) tie-break, so the
    * assignment is bit-identical; what changes is only that the
    * codebook rides a broadcast variable instead of the compiled
    * expression text. Never a silent codegen degradation.
    */
  def ivfAssign(df: DataFrame, keyCol: String, centroids: DataFrame,
      embCol: String = "embedding",
      maxExprDoubles: Int = IvfAssignExprMaxDoubles): DataFrame = {
    val cents = centroids.select("cell", "centroid").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1)))
      .sortBy(_._1)
    require(cents.nonEmpty, "empty centroid table")
    val base = withNorm(df, embCol).select(col(keyCol), col("v"), col("norm"))
    if (cents.length.toLong * cents.head._2.length <= maxExprDoubles) {
      val structs = cents.map { case (cell, c) =>
        // string-literal doubles: Double.toString round-trips exactly
        val arr = c.map(x => s"CAST('$x' AS DOUBLE)")
          .mkString("array(", ",", ")")
        s"named_struct('d2', aggregate(zip_with(v, $arr, (a, b) -> (a - b) * (a - b)), 0.0D, (acc, x) -> acc + x), 'cell', $cell)"
      }
      val argmin =
        if (structs.length == 1) s"(${structs.head}).cell"
        else s"least(${structs.mkString(", ")}).cell"
      base.withColumn("cell", expr(argmin))
    } else {
      // broadcast-variable argmin: the same left-to-right distance fold
      // and the same (d2, cell) lexicographic minimum as the expression
      // path (strictly-less keeps the earlier = lower cell on ties), so
      // the assignment is bit-identical — only the execution strategy
      // changes. Zero shuffle: the codebook ships once per executor.
      val spark = df.sparkSession
      val bc = spark.sparkContext.broadcast(
        cents.map { case (cell, c) => (cell, c.toArray) })
      val schema = org.apache.spark.sql.types.StructType(
        base.schema.fields :+ org.apache.spark.sql.types.StructField(
          "cell", org.apache.spark.sql.types.IntegerType, nullable = false))
      val vIdx = base.schema.fieldIndex("v")
      val rdd = base.rdd.mapPartitions { iter =>
        val cb = bc.value
        iter.map { r =>
          val v = r.getSeq[Double](vIdx).toArray
          var bestCell = cb(0)._1
          var bestD2 = Double.PositiveInfinity
          var ci = 0
          while (ci < cb.length) {
            val c = cb(ci)._2
            var d2 = 0.0
            var j = 0
            while (j < v.length) {
              val d = v(j) - c(j)
              d2 += d * d
              j += 1
            }
            if (d2 < bestD2) { bestD2 = d2; bestCell = cb(ci)._1 }
            ci += 1
          }
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ bestCell)
        }
      }
      spark.createDataFrame(rdd, schema)
    }
  }

  /** [[ivfAssign]] with the winning squared distance exposed — (keyCol,
    * cell, d2): the assignment-quality surface drift monitoring reads.
    * Same centroid fold, argmin and (d2, cell) tie-break as
    * [[ivfAssign]] in both execution strategies (compiled
    * least-of-structs under the codegen cap, broadcast-variable argmin
    * above it), so `cell` is bit-identical to ivfAssign's and `d2` is
    * the distance that argmin saw.
    */
  def ivfAssignDist(df: DataFrame, keyCol: String, centroids: DataFrame,
      embCol: String = "embedding",
      maxExprDoubles: Int = IvfAssignExprMaxDoubles): DataFrame = {
    val cents = centroids.select("cell", "centroid").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1)))
      .sortBy(_._1)
    require(cents.nonEmpty, "empty centroid table")
    val base = withNorm(df, embCol).select(col(keyCol), col("v"))
    if (cents.length.toLong * cents.head._2.length <= maxExprDoubles) {
      val structs = cents.map { case (cell, c) =>
        val arr = c.map(x => s"CAST('$x' AS DOUBLE)")
          .mkString("array(", ",", ")")
        s"named_struct('d2', aggregate(zip_with(v, $arr, (a, b) -> (a - b) * (a - b)), 0.0D, (acc, x) -> acc + x), 'cell', $cell)"
      }
      val argmin =
        if (structs.length == 1) structs.head
        else s"least(${structs.mkString(", ")})"
      base.withColumn("_best", expr(argmin))
        .select(col(keyCol), col("_best.cell").as("cell"),
          col("_best.d2").as("d2"))
    } else {
      val spark = df.sparkSession
      val bc = spark.sparkContext.broadcast(
        cents.map { case (cell, c) => (cell, c.toArray) })
      val schema = org.apache.spark.sql.types.StructType(Seq(
        base.schema(keyCol),
        org.apache.spark.sql.types.StructField("cell",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("d2",
          org.apache.spark.sql.types.DoubleType, nullable = false)))
      val vIdx = base.schema.fieldIndex("v")
      val kIdx = base.schema.fieldIndex(keyCol)
      val rdd = base.rdd.mapPartitions { iter =>
        val cb = bc.value
        iter.map { r =>
          val v = r.getSeq[Double](vIdx).toArray
          var bestCell = cb(0)._1
          var bestD2 = Double.PositiveInfinity
          var ci = 0
          while (ci < cb.length) {
            val c = cb(ci)._2
            var d2 = 0.0
            var j = 0
            while (j < v.length) {
              val d = v(j) - c(j)
              d2 += d * d
              j += 1
            }
            if (d2 < bestD2) { bestD2 = d2; bestCell = cb(ci)._1 }
            ci += 1
          }
          org.apache.spark.sql.Row(r.get(kIdx), bestCell, bestD2)
        }
      }
      spark.createDataFrame(rdd, schema)
    }
  }

  /** IVF assignment-quality DRIFT metric — the retrain-trigger signal a
    * standing append-without-refit index needs ([[ivfTopKFromIndex]]
    * consumers, q_incivf): assign BOTH eras to the same FROZEN
    * centroids and compare their distance-to-assigned-centroid
    * distributions. A batch whose embedding distribution drifted away
    * from the fit era lands systematically farther from every frozen
    * centroid — mean/max d2 rise — which is exactly when cell recall
    * starts decaying and a recluster is due (IncScaleBench prices the
    * recluster against the append so the cadence is a cost decision,
    * not a guess).
    *
    * Output: one row per era — (era, n_vecs, mean_d2_micros,
    * max_d2_micros), all BIGINT: per-vector d2 is micros-rounded once
    * (floor(d2·10⁶ + 0.5)), the mean is an integer division, so the
    * row is exact cross-engine. Scale shape: two [[ivfAssignDist]]
    * passes (codebook ships to executors, zero shuffle) + one keyed
    * aggregate; nothing corpus-sized reaches the driver.
    */
  def ivfDriftMetric(corpus: DataFrame, batch: DataFrame, keyCol: String,
      centroids: DataFrame, embCol: String = "embedding"): DataFrame =
    ivfDriftEra(corpus, "corpus", keyCol, centroids, embCol)
      .unionByName(ivfDriftEra(batch, "batch", keyCol, centroids, embCol))

  /** One era's [[ivfDriftMetric]] row. Exposed separately because the
    * nightly loop only pays the BATCH era: the fit era's row is computed
    * once when the centroids are frozen and persisted with the index —
    * per append you compute the batch row and compare against the stored
    * fit-era stats (IncScaleBench prices exactly that split).
    */
  def ivfDriftEra(df: DataFrame, era: String, keyCol: String,
      centroids: DataFrame, embCol: String = "embedding"): DataFrame =
    ivfAssignDist(df, keyCol, centroids, embCol)
      .select(expr("CAST(floor(d2 * 1e6 + 0.5) AS BIGINT)").as("_d2u"))
      .agg(count(lit(1)).as("n_vecs"),
        expr("CAST(sum(_d2u) DIV count(1) AS BIGINT)").as("mean_d2_micros"),
        max("_d2u").as("max_d2_micros"))
      .select(lit(era).as("era"), col("n_vecs"),
        col("mean_d2_micros"), col("max_d2_micros"))

  /** Query a prebuilt IVF index — (assigned, centroids) as produced by
    * [[ivfAssign]]/[[ivfCentroids]] (or read back from a persisted
    * store): nProbe nearest cells by cosine, exact re-rank of their
    * members. The query path of a STANDING index that appends without
    * refit.
    */
  def ivfTopKFromIndex(assigned: DataFrame,
      selectQueries: DataFrame => DataFrame, centroids: DataFrame, k: Int,
      nProbe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // probe assignment: each query's nProbe nearest centroids (by cosine)
    val probes = selectQueries(assigned)
      .toDF("query_id", "qv", "qnorm", "qcell")
      .join(broadcast(centroids))
      .withColumn("csim", expr(
        s"${dot("qv", "centroid")} / (qnorm * sqrt(${dot("centroid", "centroid")}))"))
      .withColumn("probe_rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("csim").desc, col("cell"))))
      .filter(col("probe_rank") <= nProbe)
      .select("query_id", "qv", "qnorm", "cell")

    assigned.toDF("neighbor_id", "nv", "nnorm", "cell")
      .join(probes, Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", expr(s"${dot("qv", "nv")} / (qnorm * nnorm)"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("neighbor_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Recall@k of an approximate top-k result against the exact brute-force
    * top-k — the standard ANN acceptance metric. Both inputs are
    * deterministic here (seeded hyperplanes / quantizer, exact cosine,
    * tie-broken ranks), so the summary row is reproducible bit-for-bit.
    */
  def recallAtK(approx: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    val hits = approx.select("query_id", "neighbor_id")
      .join(exact.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_semi")
      .agg(count(lit(1)).as("hits"))
    val nq = exact.agg(countDistinct(col("query_id")).as("n_queries"))
    hits.crossJoin(broadcast(nq))
      .select(col("n_queries"), lit(k).as("k"), col("hits"),
        round(col("hits").cast("double") / (col("n_queries") * k), 6).as("recall"))
  }

  /** LSH-bucketed approximate top-k: candidate pairs share a bucket in at
    * least one table (bucket join, id-only dedup — arrays never ride
    * through the distinct), then exact cosine re-rank of candidates only.
    * Recall/work trade-off: more tables → higher recall, more candidates;
    * more planes → smaller buckets → less work per table.
    */
  def lshTopK(df: DataFrame, keyCol: String, queryPred: Column, k: Int,
      nPlanes: Int = 8, numTables: Int = 4, seed: Long = 42L,
      embCol: String = "embedding"): DataFrame =
    lshTopKFor(df, keyCol, df.filter(queryPred).select(col(keyCol)), k,
      nPlanes, numTables, seed, embCol)

  /** [[lshTopK]] with the query set given as a key DataFrame (one column
    * named `keyCol`) — for data-dependent query sets (planted-pair
    * endpoints, a feedback loop's hard negatives) that a literal predicate
    * can't express. The query set is broadcast: ANN queries are by
    * definition a bounded set, not a second corpus.
    */
  def lshTopKFor(df: DataFrame, keyCol: String, queryIds: DataFrame, k: Int,
      nPlanes: Int = 8, numTables: Int = 4, seed: Long = 42L,
      embCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val buckets = withBuckets(df, keyCol, nPlanes, numTables, seed, embCol)
    val queryBuckets = buckets.join(broadcast(queryIds.select(col(keyCol))), Seq(keyCol))
      .toDF("query_id", "table_id", "bucket")
    val candidates = buckets.toDF("neighbor_id", "table_id", "bucket")
      .join(queryBuckets, Seq("table_id", "bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "neighbor_id").distinct()

    val base = withNorm(df, embCol).select(col(keyCol), col("v"), col("norm"))
    candidates
      .join(base.toDF("query_id", "qv", "qnorm"), Seq("query_id"))
      .join(base.toDF("neighbor_id", "nv", "nnorm"), Seq("neighbor_id"))
      .withColumn("cosine", expr(s"${dot("qv", "nv")} / (qnorm * nnorm)"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("neighbor_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Scalar int8 quantization of an embedding column — the standard 4×
    * storage cut for corpus-scale vector data: per-vector affine codes
    * `q = floor((x − qmin)/qscale + 0.5)` in 0..255 with the (qmin,
    * qscale) pair kept alongside; dequantized error is bounded by
    * qscale/2 per component. A pure projection (no shuffle), and the
    * floor(+0.5) form — not round() — makes the codes bit-reproducible
    * in any engine, so a quantized corpus written by one system can be
    * verified or dequantized by another. Flat vectors (max = min) encode
    * as all-zero codes with qscale 1.
    */
  /** Deterministic sign for the [[randomProjection]] matrix entry (i, j):
    * +1 when the first hex digit of md5("i_j") is 0-7, else -1 — a formula
    * any md5-bearing engine replays, so an oracle can rebuild the exact
    * matrix without shipping it.
    */
  private[similarity] def projSign(i: Int, j: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${i}_${j}".getBytes("UTF-8"))
    if (((d(0) >> 4) & 0xf) < 8) 1 else -1
  }

  /** Johnson–Lindenstrauss random projection (Achlioptas 2003 ±1 variant):
    * k output coordinates, each the signed sum of the input coordinates
    * under a deterministic ±1 matrix ([[projSign]]). Used to shrink
    * embedding width before clustering / LSH while approximately
    * preserving pairwise distances (within ±ε at k = O(ln n / ε²)).
    *
    * Determinism contract: inputs quantize to integer micros FIRST
    * (floor(x·1e6 + 0.5)), so every projected coordinate is an exact
    * 64-bit integer sum — partition-order independent and replayable by
    * any engine (the matrix is a pure md5 formula, not shipped data).
    *
    * Scale shape: the k×dim sign matrix folds into the plan as literal
    * arrays (model-sized, bounded-by-contract); the whole operator is ONE
    * Project + Generate over the embedding scan — zero shuffle, no UDF.
    * Output: (keyCol, j ∈ 0..k−1, proj_micros).
    */
  def randomProjection(df: DataFrame, keyCol: String, dim: Int, k: Int,
      embCol: String = "embedding"): DataFrame = {
    require(dim > 0 && k > 0, s"dim and k must be positive: dim=$dim k=$k")
    val terms = (0 until k).map { j =>
      val signs = (0 until dim).map(i => s"${projSign(i, j)}L").mkString(", ")
      s"""struct(${j}L AS j,
         |  aggregate(zip_with($embCol, array($signs),
         |      (x, s) -> s * CAST(floor(CAST(x AS DOUBLE) * 1e6 + 0.5) AS BIGINT)),
         |    0L, (acc, t) -> acc + t) AS proj_micros)""".stripMargin
    }.mkString(", ")
    df.select(col(keyCol), explode(expr(s"array($terms)")).as("p"))
      .select(col(keyCol), col("p.j").as("j"), col("p.proj_micros").as("proj_micros"))
  }

  def quantizeInt8(df: DataFrame, embCol: String = "embedding"): DataFrame =
    df.withColumn("_v", expr(s"transform($embCol, x -> CAST(x AS DOUBLE))"))
      .withColumn("qmin", expr("array_min(_v)"))
      .withColumn("qscale", expr(
        "CASE WHEN array_max(_v) = qmin THEN 1.0D ELSE (array_max(_v) - qmin) / 255.0D END"))
      .withColumn("q", expr(
        "transform(_v, x -> CAST(floor((x - qmin) / qscale + 0.5D) AS INT))"))
      .drop("_v")

  /** Inverse of [[quantizeInt8]]: x' = qmin + q·qscale (float column). */
  def dequantizeInt8(df: DataFrame, outCol: String = "embedding_dq"): DataFrame =
    df.withColumn(outCol, expr(
      "transform(q, c -> CAST(qmin + c * qscale AS FLOAT))"))

  // ---------------------------------------------------------------------
  // Product quantization (Jégou, Douze, Schmid, "Product Quantization for
  // Nearest Neighbor Search", TPAMI 2011) — the standard 100 TB-scale
  // vector-index compression: split each vector into m contiguous
  // subvectors, learn a small per-subspace codebook, store each vector as
  // m small codes (m·log2(kCodes) bits instead of dim·32), and answer
  // queries by ADC — per query, precompute the kCodes·m table of exact
  // query-subvector↔centroid distances, then score every corpus vector as
  // a TABLE-LOOKUP SUM over its codes. The corpus side never touches
  // floats at query time; at full scale the IVF cells ([[ivfTopK]]) route
  // candidates first and ADC scans only the probed cells (IVFADC).
  // ---------------------------------------------------------------------

  /** Train PQ codebooks: one seeded KMeans per contiguous subspace (m
    * fits, each over the corpus's subvectors of that slice — a bounded
    * driver loop launching distributed fits, the codebook is model-sized:
    * m·kCodes rows). `dim` must be divisible by `m`.
    * Output: (subspace, code, centroid: array<double>).
    */
  def pqTrain(df: DataFrame, m: Int, kCodes: Int, seed: Long = 42L,
      embCol: String = "embedding"): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    require(m >= 1 && kCodes >= 2, s"bad PQ shape: m=$m kCodes=$kCodes")
    val base = withNorm(df, embCol).select(col("v")).cache()
    val spark = df.sparkSession
    import spark.implicits._
    val books = (0 until m).map { j =>
      val sub = base.select(expr(s"slice(v, $j * (size(v) div $m) + 1, size(v) div $m)")
        .as("sv"))
        .withColumn("features", array_to_vector(col("sv")))
      // 2 Lloyd iterations suffice: codebooks only need to carve the
      // subspace — the planted-partner guarantee (identical subvectors →
      // identical codes) and the exactness of the ADC distance TABLE are
      // independent of centroid quality, which only shifts the
      // approximation floor for non-identical subvectors
      val model = new KMeans().setK(kCodes).setSeed(seed + j).setMaxIter(2)
        .setFeaturesCol("features").setPredictionCol("code").fit(sub)
      model.clusterCenters.zipWithIndex.toSeq
        .map { case (c, i) => (j, i, c.toArray.toSeq) }
    }
    base.unpersist()
    books.flatten.toDF("subspace", "code", "centroid")
  }

  /** Encode the corpus against trained codebooks: per (vector, subspace)
    * the nearest centroid by exact L2², ties to the lowest code — one
    * subspace explode + one broadcast codebook join + one min(struct)
    * aggregate. Output: (keyCol, subspace, code) — the exploded layout
    * ADC consumes directly (collect to an m-array only at storage
    * boundaries).
    */
  def pqEncode(df: DataFrame, keyCol: String, codebooks: DataFrame,
      m: Int, embCol: String = "embedding"): DataFrame = {
    require(m >= 1, "m must be >= 1")
    withNorm(df, embCol)
      .select(col(keyCol), col("v"))
      .select(col(keyCol), explode(expr(
        s"transform(sequence(0, $m - 1), " +
          s"j -> struct(j AS subspace, slice(v, j * (size(v) div $m) + 1, size(v) div $m) AS sv))"))
        .as("p"))
      .select(col(keyCol), col("p.subspace"), col("p.sv"))
      .join(broadcast(codebooks), Seq("subspace"))
      .withColumn("_d2", expr(
        s"${dot("sv", "sv")} - 2.0D * ${dot("sv", "centroid")} + ${dot("centroid", "centroid")}"))
      .groupBy(col(keyCol), col("subspace"))
      .agg(min(struct(col("_d2"), col("code"))).as("_best"))
      .select(col(keyCol), col("subspace"), col("_best.code").as("code"))
  }

  /** PQ-ADC approximate top-k for a query key set: train ([[pqTrain]]),
    * encode ([[pqEncode]]), build each query's exact subvector↔centroid
    * distance table (nq·m·kCodes rows — model-sized, broadcast), and
    * rank the corpus by the code-lookup sum. The scan is the PQ
    * compressed linear scan: corpus·m code rows join a broadcast table —
    * no float vectors on the corpus side at query time; compose with IVF
    * cells upstream for the full IVFADC shape.
    * Output: (query_id, neighbor_id, adc_dist, rank).
    */
  /** Faithful IVFADC (Jégou et al. 2011 §IV): the coarse IVF quantizer
    * routes, PQ encodes the RESIDUAL x − C[cell(x)] (residuals
    * concentrate near the origin, so the same kCodes budget buys a much
    * finer grid than raw-vector PQ), and each query builds one distance
    * table PER PROBED CELL against its own residual q − C[cell]. The
    * scan touches only code rows of probed cells — candidate volume
    * ≈ nProbe/nClusters of the corpus, each candidate a table-lookup
    * sum. This is the index shape that serves billion-vector corpora.
    *
    * Output: (query_id, neighbor_id, adc_dist, rank).
    */
  def ivfPqTopKFor(df: DataFrame, keyCol: String, queryIds: DataFrame, k: Int,
      nClusters: Int = 16, nProbe: Int = 8, m: Int = 4, kCodes: Int = 16,
      seed: Long = 42L, embCol: String = "embedding"): DataFrame = {
    val (centroids, books, codes) =
      buildIvfPqIndex(df, keyCol, nClusters, m, kCodes, seed, embCol)
    ivfPqTopKWithIndex(df, keyCol, centroids, books, codes, queryIds, k,
      nProbe, m, embCol)
  }

  /** Build the IVFADC index artifacts — all plain DataFrames, so they
    * persist as parquet ([[VectorIndexStore]]) and a 100 TB corpus
    * builds them ONCE: (centroids (cell, ccent), residual codebooks
    * (subspace, code, centroid), codes (keyCol, subspace, code, cell)).
    */
  def buildIvfPqIndex(df: DataFrame, keyCol: String, nClusters: Int = 16,
      m: Int = 4, kCodes: Int = 16, seed: Long = 42L,
      embCol: String = "embedding"): (DataFrame, DataFrame, DataFrame) = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val base = withNorm(df, embCol).select(col(keyCol), col("v"))
      .withColumn("features", array_to_vector(col("v"))).cache()
    val coarse = new KMeans().setK(nClusters).setSeed(seed).setMaxIter(4)
      .setFeaturesCol("features").setPredictionCol("cell").fit(base)
    val centroids = df.sparkSession.createDataFrame(
      coarse.clusterCenters.zipWithIndex.toSeq
        .map { case (c, i) => (i, c.toArray.toSeq) })
      .toDF("cell", "ccent")
    val assigned = coarse.transform(base)
      .select(col(keyCol), col("v"), col("cell"))
      .join(broadcast(centroids), Seq("cell"))
      .withColumn("resid", expr("zip_with(v, ccent, (x, c) -> x - c)"))
    // PQ over pooled residuals (the standard single-codebook choice)
    val books = pqTrain(assigned.select(col(keyCol), col("resid")),
      m, kCodes, seed + 1000, embCol = "resid")
    val codes = pqEncode(assigned.select(col(keyCol), col("resid")),
      keyCol, books, m, embCol = "resid")
      .join(assigned.select(col(keyCol), col("cell")), Seq(keyCol))
      .select(col(keyCol), col("subspace"), col("code"), col("cell"))
    base.unpersist()
    (centroids, books, codes)
  }

  /** Query a prebuilt IVFADC index ([[buildIvfPqIndex]] or
    * [[VectorIndexStore.loadIvfPq]]): probe routing + per-(query, cell)
    * residual distance tables + the code-lookup ADC scan of probed
    * cells only.
    */
  def ivfPqTopKWithIndex(df: DataFrame, keyCol: String, centroids: DataFrame,
      books: DataFrame, codes: DataFrame, queryIds: DataFrame, k: Int,
      nProbe: Int = 8, m: Int = 4, embCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // probe routing: each query's nProbe nearest coarse cells by L2
    val queries = withNorm(df, embCol)
      .join(broadcast(queryIds.select(col(keyCol))), Seq(keyCol))
      .select(col(keyCol).as("query_id"), col("v").as("qv"))
    val probes = queries.join(broadcast(centroids))
      .withColumn("_d2", expr(
        "graft_dot(qv, qv) - 2.0D * graft_dot(qv, ccent) + graft_dot(ccent, ccent)"))
      .withColumn("_pr", row_number().over(
        Window.partitionBy("query_id").orderBy(col("_d2").asc, col("cell"))))
      .filter(col("_pr") <= nProbe)
      .withColumn("qresid", expr("zip_with(qv, ccent, (x, c) -> x - c)"))
      .select("query_id", "cell", "qresid")
    // one distance table per (query, probed cell): exact L2^2 of the
    // query's cell-residual subvectors vs the residual codebooks
    val dtab = probes
      .select(col("query_id"), col("cell"), explode(expr(
        s"transform(sequence(0, $m - 1), " +
          s"j -> struct(j AS subspace, slice(qresid, j * (size(qresid) div $m) + 1, size(qresid) div $m) AS sv))"))
        .as("p"))
      .select(col("query_id"), col("cell"), col("p.subspace"), col("p.sv"))
      .join(broadcast(books), Seq("subspace"))
      // per-term exact double quantized to integer micros: the ADC sum
      // becomes exact long arithmetic, so ranking is partition-order and
      // plan independent (a plain double sum's last ulp depends on
      // accumulation order — a fresh vs loaded index produced different
      // 16th digits and, near ties, could flip ranks)
      .withColumn("_d2m", expr(
        s"CAST(floor((${dot("sv", "sv")} - 2.0D * ${dot("sv", "centroid")} " +
          s"+ ${dot("centroid", "centroid")}) * 1e6 + 0.5D) AS BIGINT)"))
      .select("query_id", "cell", "subspace", "code", "_d2m")
    codes.toDF("neighbor_id", "subspace", "code", "cell")
      .join(broadcast(dtab), Seq("cell", "subspace", "code"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .groupBy("query_id", "neighbor_id")
      .agg(sum(col("_d2m")).as("_adc_micros"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("_adc_micros").asc, col("neighbor_id"))).cast("long"))
      .filter(col("rank") <= k)
      .withColumn("adc_dist", col("_adc_micros").cast("double") / 1e6)
      .select("query_id", "neighbor_id", "adc_dist", "rank")
  }

  def pqAdcTopKFor(df: DataFrame, keyCol: String, queryIds: DataFrame, k: Int,
      m: Int = 4, kCodes: Int = 16, seed: Long = 42L,
      embCol: String = "embedding"): DataFrame = {
    val (books, codes) = buildPqIndex(df, keyCol, m, kCodes, seed, embCol)
    pqAdcTopKWithIndex(df, keyCol, books, codes, queryIds, k, m, embCol)
  }

  /** Build the plain-PQ index artifacts (codebooks + corpus codes) — both
    * plain DataFrames, persistable via [[VectorIndexStore]]; built once
    * per corpus in production.
    */
  def buildPqIndex(df: DataFrame, keyCol: String, m: Int = 4,
      kCodes: Int = 16, seed: Long = 42L,
      embCol: String = "embedding"): (DataFrame, DataFrame) = {
    val books = pqTrain(df, m, kCodes, seed, embCol)
    (books, pqEncode(df, keyCol, books, m, embCol))
  }

  /** Query a prebuilt plain-PQ index: per-query exact distance table vs
    * the codebooks, code-lookup sum over the whole code table (the
    * compressed linear scan — route with IVF upstream for IVFADC).
    */
  def pqAdcTopKWithIndex(df: DataFrame, keyCol: String, books: DataFrame,
      codes: DataFrame, queryIds: DataFrame, k: Int, m: Int = 4,
      embCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qsubs = withNorm(df, embCol)
      .join(broadcast(queryIds.select(col(keyCol))), Seq(keyCol))
      .select(col(keyCol).as("query_id"), col("v"))
      .select(col("query_id"), explode(expr(
        s"transform(sequence(0, $m - 1), " +
          s"j -> struct(j AS subspace, slice(v, j * (size(v) div $m) + 1, size(v) div $m) AS sv))"))
        .as("p"))
      .select(col("query_id"), col("p.subspace"), col("p.sv"))
    // integer-micros lookup terms — exact long sum, partition-order
    // independent ranking (see ivfPqTopKWithIndex)
    val dtab = qsubs.join(broadcast(books), Seq("subspace"))
      .withColumn("_d2m", expr(
        s"CAST(floor((${dot("sv", "sv")} - 2.0D * ${dot("sv", "centroid")} " +
          s"+ ${dot("centroid", "centroid")}) * 1e6 + 0.5D) AS BIGINT)"))
      .select("query_id", "subspace", "code", "_d2m")
    codes.toDF("neighbor_id", "subspace", "code")
      .join(broadcast(dtab), Seq("subspace", "code"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .groupBy("query_id", "neighbor_id")
      .agg(sum(col("_d2m")).as("_adc_micros"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("_adc_micros").asc, col("neighbor_id"))).cast("long"))
      .filter(col("rank") <= k)
      .withColumn("adc_dist", col("_adc_micros").cast("double") / 1e6)
      .select("query_id", "neighbor_id", "adc_dist", "rank")
  }
}
