package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Metric drift / anomaly detection — the time-axis complement to the
  * static Q1–Q9 checks: instead of "is today's batch internally sound",
  * "is today's batch NORMAL relative to its own history". The classic
  * pipeline-monitoring primitive: a trailing-window z-score per period,
  * flagged when |z| exceeds a threshold.
  *
  * Determinism contract (same as the daily-aggregate stddev): window sums
  * run on exact DECIMAL, and mean/variance/z are derived in ONE fixed IEEE
  * sequence from those exact sums — bit-reproducible across engines and
  * partitionings. No round() anywhere (Spark's double round tie-breaks
  * differently from exact-binary engines).
  *
  * Scale shape: this runs over a PRE-AGGREGATED series (one row per
  * period, or per entity × period with `partitionCols`), so the ordered
  * window is over thousands of rows even when the raw source is 100 TB —
  * the upstream aggregation does the heavy lifting; partitioned
  * monitoring (per segment / per source) parallelizes across partitions.
  */
object Drift {

  /** Adds `trailing_mean`, `z_score`, `is_anomaly` per row: z of this
    * period's value against the `trailing` PRIOR periods (the current row
    * is excluded — an anomaly must not dampen its own baseline). Rows with
    * fewer than `minPoints` trailing observations, or a flat (zero
    * variance) baseline, get null mean/z and `is_anomaly = false`.
    */
  def zScores(series: DataFrame, orderCol: String, valueCol: String,
      trailing: Int = 7, minPoints: Int = 3, threshold: Double = 3.0,
      partitionCols: Seq[String] = Nil): DataFrame = {
    require(trailing >= minPoints && minPoints >= 2,
      s"need trailing >= minPoints >= 2, got $trailing/$minPoints")
    val base = if (partitionCols.isEmpty) Window.orderBy(orderCol)
      else Window.partitionBy(partitionCols.map(col): _*).orderBy(orderCol)
    val w = base.rowsBetween(-trailing, -1)
    // Non-ANSI decimal overflow yields NULL, which downstream reads as
    // "not enough data" — an anomaly monitor silently failing OPEN. Guard
    // both overflow points explicitly so out-of-range magnitude raises
    // instead of disabling detection: a value beyond decimal(18,2)
    // (>16 integer digits), and a trailing sum of squares beyond
    // decimal(38,4). Rescale the series (e.g. to millions) if hit.
    val xRaw = col(valueCol).cast("decimal(18,2)")
    val x = when(col(valueCol).isNotNull.and(xRaw.isNull),
      raise_error(concat(
        lit(s"Drift.zScores: '$valueCol' overflows decimal(18,2): "),
        col(valueCol).cast("string")))).otherwise(xRaw)
    // Decimal→double goes THROUGH A STRING: Spark's direct cast takes the
    // compact path when the unscaled value fits a long — (double)unscaled /
    // 10^scale, TWO roundings — and a 7-period sum of squares passes 2^53
    // at test scale already (seen live: 1-2 ulp drift vs DuckDB).
    // parseDouble/strtod are correctly rounded in every engine, making the
    // conversion the same single rounding everywhere (the q_corr lesson,
    // applied to both sides).
    def dbl(c: org.apache.spark.sql.Column) = c.cast("string").cast("double")
    series
      .withColumn("_n", count(x).over(w))
      .withColumn("_s", sum(x).over(w))
      .withColumn("_s2",
        when(col("_n") > 0 && sum(x * x).over(w).isNull,
          raise_error(lit("Drift.zScores: trailing sum of squares overflows " +
            s"decimal(38,4) — rescale '$valueCol' before monitoring")))
          .otherwise(sum(x * x).over(w)))
      .withColumn("trailing_mean",
        when(col("_n") >= minPoints, dbl(col("_s")) / col("_n")))
      .withColumn("_var",
        when(col("_n") >= minPoints, greatest(
          (dbl(col("_s2")) - dbl(col("_s")) * dbl(col("_s")) / col("_n"))
            / (col("_n") - 1), lit(0.0))))
      .withColumn("z_score",
        when(col("_var") > 0,
          (dbl(x) - col("trailing_mean")) / sqrt(col("_var"))))
      .withColumn("is_anomaly", coalesce(abs(col("z_score")) > threshold, lit(false)))
      .drop("_n", "_s", "_s2", "_var")
  }

  /** Population Stability Index — DISTRIBUTION-level drift between a
    * reference batch and a current batch (the standard ML feature- and
    * score-monitoring metric; rule of thumb: < 0.1 stable, > 0.25 shifted).
    * Bins are the reference batch's exact quantiles (the q_bins recipe —
    * `percentile` is bit-identical to quantile_cont; boundaries broadcast
    * lazily, bin id = boundaries strictly below the value), counts are
    * exact, and each bin's add-one-smoothed contribution
    * (p−q)·ln(p/q) lands as INTEGER micros, so the per-bin rows — and the
    * PSI their sum forms — are engine- and partition-order independent
    * (the [[graft.text.ImportanceSampling]] portability contract).
    *
    * Returns one row per bin: (bin, ref_cnt, cur_cnt, contrib_micros);
    * PSI = Σ contrib_micros / 1e6. Empty bins survive via the bin spine —
    * a vanished bin is exactly the signal PSI exists to catch.
    */
  def psi(reference: DataFrame, current: DataFrame, valueCol: String,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 2, "need at least 2 bins")
    val qs = (1 until nBins).map(i => i.toDouble / nBins).mkString(",")
    val bounds = reference.agg(expr(s"percentile($valueCol, array($qs))").as("bs"))
    def binCounts(df: DataFrame, cntName: String) =
      df.crossJoin(broadcast(bounds))
        .withColumn("bin", expr(s"size(filter(bs, b -> b < $valueCol))").cast("long"))
        .groupBy("bin").agg(count(lit(1)).as(cntName))
    val spine = reference.sparkSession.range(nBins).select(col("id").as("bin"))
    val rt = reference.agg(count(lit(1)).as("rt"))
    val ct = current.agg(count(lit(1)).as("ct"))
    spine
      .join(binCounts(reference, "ref_cnt"), Seq("bin"), "left")
      .join(binCounts(current, "cur_cnt"), Seq("bin"), "left")
      .na.fill(0L, Seq("ref_cnt", "cur_cnt"))
      .crossJoin(broadcast(rt)).crossJoin(broadcast(ct))
      .withColumn("contrib_micros", expr(
        s"""CAST(floor(((ref_cnt + 1.0) / (rt + CAST($nBins AS DOUBLE))
           |  - (cur_cnt + 1.0) / (ct + CAST($nBins AS DOUBLE)))
           |  * ln(((ref_cnt + 1.0) / (rt + CAST($nBins AS DOUBLE)))
           |    / ((cur_cnt + 1.0) / (ct + CAST($nBins AS DOUBLE)))) * 1e6 + 0.5) AS BIGINT)""".stripMargin))
      .select("bin", "ref_cnt", "cur_cnt", "contrib_micros")
  }

  /** Two-sample Kolmogorov–Smirnov statistic — nonparametric NUMERIC
    * distribution drift: D = max over x of |F_ref(x) − F_cur(x)| on the
    * empirical CDFs. Complements [[zScores]] (level shifts on a series)
    * and [[psi]] (binned density shift): KS needs no binning choice and
    * reacts to ANY shape change, the standard pre-/post-deploy
    * distribution check. Returns one row:
    * (ks_micros, n_ref, n_cur) with D as exact integer micros.
    *
    * Scale shape: one distributed groupBy on the metric value (the heavy
    * pass — counts per distinct value), then the cumulative counts the
    * ECDFs need via a distributed range-sort and the two-pass prefix sum
    * of [[graft.text.CorpusCuration.tokenSpans]] — NOT a global
    * `sum().over(Window.orderBy(v))`, which would serialize every
    * distinct value through one task. Pass 1 collects numPartitions
    * (Σref, Σcur) subtotals (bounded by cluster size, not data); pass 2
    * re-reads the SAME sort lineage (shuffle map outputs reused) with
    * each partition's driver-computed offset and keeps only a
    * per-partition running max of |F_ref − F_cur|. Unbounded distinct
    * domains are therefore fine.
    *
    * Determinism: every double derives from exact long counts in one
    * fixed op sequence (cum/total per value, |diff|, max — max is
    * order-independent), then integer micros — engine- and
    * partition-order independent. Range-partition boundaries may move
    * between runs, but the per-value cumulative counts are global
    * (offset-corrected), so the row-level doubles — and their max — do
    * not.
    */
  /** One-sided CUSUM control chart (Page 1954) — SEQUENTIAL change-point
    * detection on a pre-aggregated series, the drift shape the other
    * checks miss: a small persistent shift that never trips a per-point
    * z-score accumulates here. S⁺ᵢ = max(0, S⁺ᵢ₋₁ + (xᵢ−μ₀)/σ₀ − k),
    * S⁻ᵢ symmetric; a point flags when either exceeds `h` (k = half the
    * shift to detect, classically 0.5; h classically 4–5). μ₀/σ₀ come
    * from the series' own first `baseline` points — the known-good era,
    * which itself gets null scores (it DEFINES normal; monitoring starts
    * after it). A flat baseline (σ₀ = 0) or one shorter than `baseline`
    * yields null scores and no flags on the whole series (fail closed on
    * insufficient history, the zScores convention). Null values score
    * null and do not advance the state.
    *
    * Output: input columns + (cusum_hi, cusum_lo, is_change).
    *
    * Scale shape: the max-reset recursion is not a window aggregate, so
    * each entity's series folds linearly in one task — one shuffle on
    * the entity key (`repartition` + `sortWithinPartitions`, the
    * secondary-sort pattern), parallel ACROSS entities, with only the
    * `baseline`-row buffer held in memory beyond the running state. A
    * series is one row per period (the [[zScores]] contract), so
    * per-task work is bounded by the monitoring horizon, not the data.
    *
    * Determinism: the fold visits rows in (entity, order) sorted order —
    * one fixed double sequence per series, partition-count independent.
    */
  def cusum(series: DataFrame, orderCol: String, valueCol: String,
      baseline: Int = 20, k: Double = 0.5, h: Double = 4.0,
      partitionCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.types.{BooleanType, DoubleType, StructField}
    require(k >= 0 && h > 0, s"need k >= 0 and h > 0, got $k/$h")
    foldOrderedSeries(series, orderCol, valueCol, partitionCols, baseline, Seq(
        StructField("cusum_hi", DoubleType, nullable = true),
        StructField("cusum_lo", DoubleType, nullable = true),
        StructField("is_change", BooleanType, nullable = false))) { (mu, sigma) =>
      var sHi = 0.0; var sLo = 0.0
      v => {
        val z = (v - mu) / sigma
        sHi = math.max(0.0, sHi + z - k)
        sLo = math.max(0.0, sLo - z - k)
        Seq(sHi, sLo, sHi > h || sLo > h)
      }
    }
  }

  /** EWMA control chart (Roberts 1959) — [[cusum]]'s smooth companion:
    * Eᵢ = λxᵢ + (1−λ)Eᵢ₋₁ starting at the baseline mean, flagged when
    * |Eᵢ − μ₀| exceeds L·σ₀·√(λ/(2−λ)·(1−(1−λ)^(2i))) — the
    * time-varying exact control limit, so early post-baseline points are
    * not under-flagged. Small λ remembers far back (tiny sustained
    * shifts); λ = 1 degenerates to the Shewhart per-point rule. Same
    * baseline/null/fail-closed semantics and one-shuffle secondary-sort
    * scale shape as [[cusum]]. Output: input columns +
    * (ewma, ewma_limit, is_change).
    */
  def ewma(series: DataFrame, orderCol: String, valueCol: String,
      baseline: Int = 20, lambda: Double = 0.2, limitSigmas: Double = 3.0,
      partitionCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.types.{BooleanType, DoubleType, StructField}
    require(lambda > 0 && lambda <= 1, s"need 0 < lambda <= 1, got $lambda")
    require(limitSigmas > 0, s"need limitSigmas > 0, got $limitSigmas")
    foldOrderedSeries(series, orderCol, valueCol, partitionCols, baseline, Seq(
        StructField("ewma", DoubleType, nullable = true),
        StructField("ewma_limit", DoubleType, nullable = true),
        StructField("is_change", BooleanType, nullable = false))) { (mu, sigma) =>
      var e = mu; var att = 1.0
      v => {
        e = lambda * v + (1.0 - lambda) * e
        // (1−λ)^(2i) tracked by running multiplication, not math.pow —
        // pow is not correctly rounded, and a 1-ulp divergence would
        // break cross-engine bit-reproducibility of the limits
        att *= (1.0 - lambda) * (1.0 - lambda)
        val limit = limitSigmas * sigma * math.sqrt(
          lambda / (2.0 - lambda) * (1.0 - att))
        Seq(e, limit, math.abs(e - mu) > limit)
      }
    }
  }

  /** Holt linear (double exponential) smoothing — the trend-following
    * member of the sequential family: where [[ewma]] tracks a LEVEL and
    * flags deviation from a static baseline mean, Holt carries a level
    * AND a trend state, so a steadily growing series is normal and only
    * departures from its own extrapolation flag:
    *
    *   f_t = l_{t−1} + b_{t−1}                       (one-step forecast)
    *   l_t = α·x_t + (1−α)·f_t
    *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
    *
    * seeded l = μ₀ (baseline mean), b = 0; a point is anomalous when its
    * forecast error |x_t − f_t| exceeds `limitSigmas`·σ₀. Same
    * baseline/null/fail-closed semantics and one-shuffle secondary-sort
    * scale shape as [[cusum]]. Output: input columns +
    * (holt_level, holt_trend, holt_forecast, is_anomaly).
    *
    * α/β must be exactly representable doubles (0.5/0.25 defaults) and
    * the fold keeps ONE op order — the recursion replays bit-exact in a
    * recursive-CTE oracle (the q_cusum/q_ewma technique).
    */
  def holt(series: DataFrame, orderCol: String, valueCol: String,
      baseline: Int = 20, alpha: Double = 0.5, beta: Double = 0.25,
      limitSigmas: Double = 3.0, partitionCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.types.{BooleanType, DoubleType, StructField}
    require(alpha > 0 && alpha <= 1, s"need 0 < alpha <= 1, got $alpha")
    require(beta >= 0 && beta <= 1, s"need 0 <= beta <= 1, got $beta")
    require(limitSigmas > 0, s"need limitSigmas > 0, got $limitSigmas")
    foldOrderedSeries(series, orderCol, valueCol, partitionCols, baseline, Seq(
        StructField("holt_level", DoubleType, nullable = true),
        StructField("holt_trend", DoubleType, nullable = true),
        StructField("holt_forecast", DoubleType, nullable = true),
        StructField("is_anomaly", BooleanType, nullable = false))) { (mu, sigma) =>
      var l = mu; var b = 0.0
      v => {
        val f = l + b
        val lNew = alpha * v + (1.0 - alpha) * f
        val bNew = beta * (lNew - l) + (1.0 - beta) * b
        l = lNew; b = bNew
        Seq(l, b, f, math.abs(v - f) > limitSigmas * sigma)
      }
    }
  }

  /** Shared machinery for the sequential control charts: repartition on
    * the entity key, sort each partition by (entity, order), walk each
    * entity's contiguous run buffering ONE series at a time (bounded by
    * the monitoring horizon — the one-row-per-period contract, never the
    * whole partition), compute μ₀/σ₀ from the first `baseline` non-null
    * values, and fold the post-baseline values through `mk(μ₀, σ₀)`'s
    * stateful step. Baseline rows, null values, flat baselines (σ₀ = 0)
    * and series shorter than `baseline` emit null scores with `false` in
    * trailing boolean fields — monitors fail closed on insufficient
    * history.
    */
  private def foldOrderedSeries(series: DataFrame, orderCol: String,
      valueCol: String, partitionCols: Seq[String], baseline: Int,
      extra: Seq[org.apache.spark.sql.types.StructField])(
      mk: (Double, Double) => Double => Seq[Any]): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{BooleanType, StructType}
    require(baseline >= 2, "need a baseline of at least 2 points")
    val pk = if (partitionCols.isEmpty) lit("") else
      concat_ws("", partitionCols.map(col(_).cast("string")): _*)
    val sorted = series.withColumn("_pk", pk)
      .repartition(col("_pk"))
      .sortWithinPartitions(col("_pk"), col(orderCol))
    val schema = StructType(sorted.schema.fields ++ extra)
    val skipped = extra.map(f => if (f.dataType == BooleanType) false else null)
    val pkIdx = sorted.schema.fieldIndex("_pk")
    val vIdx = sorted.schema.fieldIndex(valueCol)
    def value(r: Row): Double = r.get(vIdx) match {
      case null => Double.NaN
      case d: java.math.BigDecimal => d.doubleValue()
      case x: java.lang.Number => x.doubleValue()
    }
    val out = sorted.rdd.mapPartitions { it =>
      val runs = new Iterator[List[Row]] {
        private val b = it.buffered
        def hasNext: Boolean = b.hasNext
        def next(): List[Row] = {
          val key = b.head.getString(pkIdx)
          val acc = scala.collection.mutable.ListBuffer.empty[Row]
          while (b.hasNext && b.head.getString(pkIdx) == key) acc += b.next()
          acc.toList
        }
      }
      runs.flatMap { rows =>
        val baseVals = rows.iterator.map(value).filter(!_.isNaN).take(baseline).toSeq
        val ready = baseVals.size >= baseline
        // moments form, NOT per-value (v−μ)² sums: for an integer-valued
        // series Σv and Σv² are exact doubles, making μ₀/σ₀ — and every
        // downstream fold step — one fixed IEEE sequence an external
        // engine can reproduce bit-for-bit (the q_cusum oracle does)
        var s = 0.0; var s2 = 0.0
        baseVals.foreach { v => s += v; s2 += v * v }
        val n = baseVals.size
        val mu = if (ready) s / n else 0.0
        val sigma = if (ready) {
          val varS = (s2 - s * s / n) / (n - 1)
          if (varS > 0) math.sqrt(varS) else 0.0
        } else 0.0
        val step = mk(mu, sigma)
        var seen = 0 // non-null values consumed (baseline era = first `baseline`)
        rows.map { r =>
          val v = value(r)
          val inBaseline = seen < baseline
          if (!v.isNaN) seen += 1
          if (!ready || sigma == 0.0 || v.isNaN || inBaseline)
            Row.fromSeq(r.toSeq ++ skipped)
          else Row.fromSeq(r.toSeq ++ step(v))
        }
      }
    }
    series.sparkSession.createDataFrame(out, schema).drop("_pk")
  }

  /** Shared machinery for the rank/ECDF statistics: per DISTINCT value of
    * `valueCol` (globally value-ordered), the pair counts (nr, nc) and the
    * INCLUSIVE cumulative counts (cumR, cumC), plus the two grand totals.
    * One distributed groupBy (the heavy pass), one distributed range-sort,
    * then the two-pass prefix sum of
    * [[graft.text.CorpusCuration.tokenSpans]] — NOT a global
    * `sum().over(Window.orderBy(v))`, which would serialize every distinct
    * value through one task. Pass 1 collects numPartitions (Σref, Σcur)
    * subtotals (bounded by cluster size, not data); pass 2 re-reads the
    * SAME sort lineage (shuffle map outputs reused) with each partition's
    * driver-computed offset. Unbounded distinct domains are therefore
    * fine. Range-partition boundaries may move between runs, but the
    * offset-corrected cumulative counts are global, so downstream
    * statistics do not.
    */
  private def cumCountsByValue(reference: DataFrame, current: DataFrame,
      valueCol: String): (org.apache.spark.rdd.RDD[(Long, Long, Long, Long)], Long, Long) = {
    // NULL is not a point of a distribution — and engines disagree on
    // where it sorts (Spark NULLS FIRST, DuckDB NULLS LAST), which would
    // silently shift every cumulative count after it. Excluded up front;
    // n_ref/n_cur therefore count non-null observations.
    val u = reference.select(col(valueCol).as("v")).filter(col("v").isNotNull)
        .withColumn("_r", lit(1L)).withColumn("_c", lit(0L))
      .unionByName(current.select(col(valueCol).as("v")).filter(col("v").isNotNull)
        .withColumn("_r", lit(0L)).withColumn("_c", lit(1L)))
    val rdd = u.groupBy("v").agg(sum("_r").as("nr"), sum("_c").as("nc"))
      .orderBy("v")
      .rdd.map(r => (r.getLong(1), r.getLong(2)))
    val perPart = rdd.mapPartitionsWithIndex(
        (i, it) => Iterator.single((i, it.foldLeft((0L, 0L)) {
          case ((ar, ac), (nr, nc)) => (ar + nr, ac + nc) })),
        preservesPartitioning = true)
      .collect().sortBy(_._1).map(_._2)
    val offR = perPart.scanLeft(0L)(_ + _._1)
    val offC = perPart.scanLeft(0L)(_ + _._2)
    val cum = rdd.mapPartitionsWithIndex { (i, it) =>
      var (cumR, cumC) = (offR(i), offC(i))
      it.map { case (nr, nc) => cumR += nr; cumC += nc; (nr, nc, cumR, cumC) }
    }
    (cum, offR.last, offC.last)
  }

  def ksStatistic(reference: DataFrame, current: DataFrame,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, IntegerType, StructField, StructType}
    val (cum, nRef, nCur) = cumCountsByValue(reference, current, valueCol)
    val partMax = cum.mapPartitionsWithIndex { (i, it) =>
      var best = 0.0
      it.foreach { case (_, _, cumR, cumC) =>
        val d = math.abs(cumR.toDouble / nRef - cumC.toDouble / nCur)
        if (!(d <= best)) best = d // NaN-propagating max, as SQL greatest is not
      }
      Iterator.single(Row(i, best))
    }
    reference.sparkSession.createDataFrame(partMax, StructType(Seq(
        StructField("_part", IntegerType, nullable = false),
        StructField("_max", DoubleType, nullable = false))))
      // an empty side makes the JVM-side ratio NaN (IEEE, no raise);
      // guard the cast — ANSI mode raises on CAST(NaN AS BIGINT)
      .agg(
        expr("""CASE WHEN isnan(max(_max)) THEN NULL
               |  ELSE CAST(floor(max(_max) * 1e6 + 0.5) AS BIGINT) END""".stripMargin)
          .as("ks_micros"),
        lit(nRef).as("n_ref"), lit(nCur).as("n_cur"))
  }

  /** Per-segment two-sample KS — [[ksStatistic]] grouped by a segment
    * column (per source, per language, per tenant): one row per segment,
    * (segment, ks_micros, n_ref, n_cur). Segments present on only one
    * side still report (their D is 1 over the populated side's values
    * only when the other side is empty — n_ref/n_cur exposes that; the
    * fr/fc ratios of an absent side are null-safe zero).
    *
    * Scale shape: here the ordered window IS the right tool — it is
    * partitioned by segment, so work parallelizes across segments and no
    * task sees more than one segment's distinct values (the [[zScores]]
    * `partitionCols` argument's shape). For one global comparison — where
    * an unpartitioned window would serialize — use [[ksStatistic]]'s
    * two-pass prefix sum instead.
    */
  def ksBySegment(reference: DataFrame, current: DataFrame,
      segCol: String, valueCol: String): DataFrame = {
    // null values excluded for the same cross-engine NULL-ordering
    // reason as [[cumCountsByValue]]
    val u = reference.select(col(segCol).as("segment"), col(valueCol).as("v"))
        .filter(col("v").isNotNull)
        .withColumn("_r", lit(1L)).withColumn("_c", lit(0L))
      .unionByName(current.select(col(segCol).as("segment"), col(valueCol).as("v"))
        .filter(col("v").isNotNull)
        .withColumn("_r", lit(0L)).withColumn("_c", lit(1L)))
    val wOrd = Window.partitionBy("segment").orderBy("v")
    val wAll = Window.partitionBy("segment")
    u.groupBy("segment", "v").agg(sum("_r").as("nr"), sum("_c").as("nc"))
      .withColumn("_tr", sum("nr").over(wAll))
      .withColumn("_tc", sum("nc").over(wAll))
      .withColumn("fr", when(col("_tr") === 0L, lit(0.0))
        .otherwise(sum("nr").over(wOrd).cast("double") / col("_tr").cast("double")))
      .withColumn("fc", when(col("_tc") === 0L, lit(0.0))
        .otherwise(sum("nc").over(wOrd).cast("double") / col("_tc").cast("double")))
      .groupBy("segment")
      .agg(
        expr("CAST(floor(max(abs(fr - fc)) * 1e6 + 0.5) AS BIGINT)").as("ks_micros"),
        sum("nr").as("n_ref"), sum("nc").as("n_cur"))
  }

  /** Two-sample Mann–Whitney U — the rank-based location test: more
    * sensitive than [[ksStatistic]] to a median shift, robust to outliers
    * a mean-based test ([[graft.ml.AbTesting]]'s Welch t) chases. Returns
    * one row: (u2, n_ref, n_cur, z_micros) where `u2 = 2·U` of the
    * REFERENCE sample — doubled so the tie-midrank ½ stays integer:
    * U = Σ_values nr·(#cur below + ½·#cur tied) ⇒
    * u2 = Σ nr·(2·cumC_after − nc), an EXACT BIGINT (valid while
    * n_ref·n_cur < 2⁶², i.e. ~2·10⁹ rows per side — beyond that use KS).
    * `z_micros` is the tie-corrected normal approximation
    * z = (U − n_ref·n_cur/2) / σ,
    * σ² = (n_ref·n_cur/12)·((N+1) − Σ(t³−t)/(N(N−1))); z is NULL when σ
    * is 0 (every value tied) or a sample is empty.
    *
    * Scale/determinism: same [[cumCountsByValue]] machinery as KS — the
    * integer u2 and tie sums are partition-order independent, and z is one
    * fixed double sequence from exact longs, written identically in the
    * engine and the oracle.
    */
  def mannWhitneyU(reference: DataFrame, current: DataFrame,
      valueCol: String): DataFrame = {
    val (cum, nRef, nCur) = cumCountsByValue(reference, current, valueCol)
    val (u2, tie) = cum.mapPartitions { it =>
      var (u, t) = (0L, 0L)
      it.foreach { case (nr, nc, _, cumC) =>
        u += nr * (2L * cumC - nc)
        val g = nr + nc
        t += g * g * g - g
      }
      Iterator.single((u, t))
    }.collect().foldLeft((0L, 0L)) { case ((au, at), (u, t)) => (au + u, at + t) }
    reference.sparkSession.range(1).select(
        lit(u2).as("u2"), lit(nRef).as("n_ref"), lit(nCur).as("n_cur"),
        lit(tie).as("_tie"))
      // identical formula text in the DuckDB oracle — one fixed IEEE
      // sequence from exact longs on both engines; σ = 0 (every value
      // tied, or an empty sample) is guarded by CASE before the division
      // because ANSI mode raises on divide-by-zero rather than IEEE-NaN
      .withColumn("_den", expr(
        """CASE WHEN n_ref + n_cur < 2 THEN 0.0
          |  ELSE 2.0 * sqrt((CAST(n_ref AS DOUBLE) * CAST(n_cur AS DOUBLE) / 12.0)
          |    * ((CAST(n_ref AS DOUBLE) + CAST(n_cur AS DOUBLE) + 1.0)
          |      - CAST(_tie AS DOUBLE) / ((CAST(n_ref AS DOUBLE) + CAST(n_cur AS DOUBLE))
          |        * (CAST(n_ref AS DOUBLE) + CAST(n_cur AS DOUBLE) - 1.0)))) END""".stripMargin))
      .withColumn("z_micros", expr(
        """CASE WHEN n_ref = 0 OR n_cur = 0 OR _den = 0.0 THEN NULL
          |  ELSE CAST(floor((CAST(u2 AS DOUBLE)
          |    - CAST(n_ref AS DOUBLE) * CAST(n_cur AS DOUBLE)) / _den * 1e6 + 0.5) AS BIGINT) END""".stripMargin))
      .select("u2", "n_ref", "n_cur", "z_micros")
  }

  /** Two-sample chi-square drift on a CATEGORICAL column — the
    * contingency-table test [[psi]]'s binned form approximates: for each
    * category, observed ref/cur counts vs the expected counts under the
    * pooled distribution, contribution (o−e)²/e summed over both samples.
    * Returns one row per category:
    * (cat, ref_cnt, cur_cnt, contrib_micros); χ² = Σ contrib_micros/1e6
    * with df = categories − 1. A vanished or newborn category contributes
    * through its zero side — exactly the drift signal.
    *
    * Scale shape: one groupBy on the category (bounded key set), one
    * broadcast-size window for the totals. Doubles derive from exact long
    * counts in a fixed sequence → engine-reproducible integer micros.
    */
  def chiSquare(reference: DataFrame, current: DataFrame,
      catCol: String): DataFrame = {
    val u = reference.select(col(catCol).as("cat"))
        .withColumn("_r", lit(1L)).withColumn("_c", lit(0L))
      .unionByName(current.select(col(catCol).as("cat"))
        .withColumn("_r", lit(0L)).withColumn("_c", lit(1L)))
    val wAll = Window.partitionBy()
    u.groupBy("cat").agg(sum("_r").as("ref_cnt"), sum("_c").as("cur_cnt"))
      .withColumn("n_ref", sum("ref_cnt").over(wAll))
      .withColumn("n_cur", sum("cur_cnt").over(wAll))
      .withColumn("grand", col("n_ref") + col("n_cur"))
      .withColumn("row_tot", col("ref_cnt") + col("cur_cnt"))
      .withColumn("e_ref",
        col("row_tot").cast("double") * col("n_ref").cast("double") / col("grand").cast("double"))
      .withColumn("e_cur",
        col("row_tot").cast("double") * col("n_cur").cast("double") / col("grand").cast("double"))
      // an entirely-empty sample makes its expectations 0 (row_tot > 0
      // always, so e = 0 iff that side's total is 0); ANSI mode raises on
      // the double division, so null the statistic instead — there is no
      // chi-square against a zero-mass distribution
      .withColumn("contrib_micros", expr(
        """CASE WHEN e_ref = 0.0 OR e_cur = 0.0 THEN NULL
          |  ELSE CAST(floor(((ref_cnt - e_ref) * (ref_cnt - e_ref) / e_ref
          |    + (cur_cnt - e_cur) * (cur_cnt - e_cur) / e_cur) * 1e6 + 0.5) AS BIGINT) END""".stripMargin))
      .select("cat", "ref_cnt", "cur_cnt", "contrib_micros")
  }

  /** Jensen–Shannon divergence on a CATEGORICAL column — the bounded
    * (≤ ln 2), symmetric divergence between the two category
    * distributions: JSD = ½·KL(p‖m) + ½·KL(q‖m), m = (p+q)/2. Unlike
    * [[chiSquare]] (a significance test that scales with N) this is a
    * MAGNITUDE: how different the mixes are, comparable across tables and
    * over time — and unlike KL it needs no smoothing, since a category
    * absent on one side contributes the finite (p/2)·ln 2 through `m`.
    * Returns one row per category:
    * (cat, ref_cnt, cur_cnt, contrib_micros); JSD = Σ contrib_micros/1e6.
    * The natural categorical feed for corpus work is hashed token buckets
    * ([[graft.text.ImportanceSampling.tokenBuckets]]) — vocabulary drift
    * between corpus slices.
    *
    * Scale shape: one groupBy on the category, totals as lazily-broadcast
    * 1-row aggregates (the A8 no-collect idiom) — no window, no driver
    * work. Doubles derive from exact long counts in one fixed sequence
    * (mirrored textually in the oracle) → engine-reproducible micros.
    */
  def jsDivergence(reference: DataFrame, current: DataFrame,
      catCol: String): DataFrame = {
    val r = reference.groupBy(col(catCol).as("cat"))
      .agg(count(lit(1)).as("ref_cnt"))
    val c = current.groupBy(col(catCol).as("cat"))
      .agg(count(lit(1)).as("cur_cnt"))
    val rt = r.agg(sum("ref_cnt").as("rt"))
    val ct = c.agg(sum("cur_cnt").as("ct"))
    r.join(c, Seq("cat"), "full")
      .na.fill(0L, Seq("ref_cnt", "cur_cnt"))
      .crossJoin(broadcast(rt)).crossJoin(broadcast(ct))
      .withColumn("contrib_micros", expr(
        """CAST(floor((
          |  CASE WHEN ref_cnt > 0 THEN 0.5 * (CAST(ref_cnt AS DOUBLE) / CAST(rt AS DOUBLE))
          |    * ln((CAST(ref_cnt AS DOUBLE) / CAST(rt AS DOUBLE))
          |      / (0.5 * (CAST(ref_cnt AS DOUBLE) / CAST(rt AS DOUBLE)
          |               + CAST(cur_cnt AS DOUBLE) / CAST(ct AS DOUBLE)))) ELSE 0.0 END
          |+ CASE WHEN cur_cnt > 0 THEN 0.5 * (CAST(cur_cnt AS DOUBLE) / CAST(ct AS DOUBLE))
          |    * ln((CAST(cur_cnt AS DOUBLE) / CAST(ct AS DOUBLE))
          |      / (0.5 * (CAST(ref_cnt AS DOUBLE) / CAST(rt AS DOUBLE)
          |               + CAST(cur_cnt AS DOUBLE) / CAST(ct AS DOUBLE)))) ELSE 0.0 END
          |) * 1e6 + 0.5) AS BIGINT)""".stripMargin))
      .select("cat", "ref_cnt", "cur_cnt", "contrib_micros")
  }

  /** Classic additive seasonal decomposition of a daily series:
    * value = trend + seasonal + residual, with trend the centered
    * `period`-point moving average (FULL windows only — edges drop),
    * seasonal the per-weekday-slot mean of the detrended series, and the
    * residual what's left — the decomposition the control charts
    * (CUSUM/EWMA/[[holtForecast]]) want run on residuals rather than raw
    * values when the metric has a weekly shape. ALL integer micros:
    * window sums are exact and both divisions truncate toward zero —
    * the shared semantics of Spark `div` and DuckDB `//` — so the
    * decomposition is bit-identical across engines and partitionings.
    *
    * The unpartitioned ORDER BY window is over the DAILY series — one
    * row per day, model-sized, the same documented bound as [[zScores]].
    *
    * Output: (dayCol, value, trend, seasonal, residual — all micros).
    */
  def seasonalDecompose(daily: DataFrame, dayCol: String,
      valueMicrosCol: String, period: Int = 7): DataFrame = {
    require(period >= 2 && period % 2 == 1,
      s"period must be odd >= 3 for a centered window: $period")
    val half = period / 2
    val w = Window.orderBy(dayCol).rowsBetween(-half, half)
    def truncDiv(num: String, den: String) = expr(s"$num div $den")
    val t = daily
      .withColumn("_cnt", count(lit(1)).over(w))
      .withColumn("_sum", sum(col(valueMicrosCol)).over(w))
      .filter(col("_cnt") === period)
      .withColumn("trend_micros", truncDiv("_sum", period.toString))
      .withColumn("_det", col(valueMicrosCol) - col("trend_micros"))
      .withColumn("_slot", dayofweek(col(dayCol)))
    val sidx = t.groupBy("_slot")
      .agg(sum("_det").as("_s"), count(lit(1)).as("_n"))
      .withColumn("seasonal_micros", truncDiv("_s", "_n"))
      .select("_slot", "seasonal_micros")
    t.join(sidx, Seq("_slot"))
      .withColumn("residual_micros", col("_det") - col("seasonal_micros"))
      .select(col(dayCol), col(valueMicrosCol), col("trend_micros"),
        col("seasonal_micros"), col("residual_micros"))
  }

  /** Doubled average ranks (2·avg-rank is always an integer, the
    * standard trick for tie-aware rank statistics without fractions):
    * a (v, rank2) mapping over the column's DISTINCT values, computed
    * with the same two-pass prefix sum as [[cumCountsByValue]] — one
    * groupBy, one range-sort of the distinct domain, numPartitions
    * subtotals through the driver. rank2 = 2·(count of smaller values)
    * + count(v) + 1 ≡ 2·competition_rank + count(v) − 1, the identity
    * the SQL-window replay uses.
    */
  private def rank2Table(df: DataFrame, valueCol: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val vField = df.select(col(valueCol).as("v")).schema.fields.head
    val rdd = df.select(col(valueCol).as("v")).filter(col("v").isNotNull)
      .groupBy("v").agg(count(lit(1)).as("c"))
      .orderBy("v")
      .rdd.map(r => (r.get(0), r.getLong(1)))
    val perPart = rdd.mapPartitionsWithIndex(
        (i, it) => Iterator.single((i, it.foldLeft(0L)(_ + _._2))),
        preservesPartitioning = true)
      .collect().sortBy(_._1).map(_._2)
    val off = perPart.scanLeft(0L)(_ + _)
    val rows = rdd.mapPartitionsWithIndex { (i, it) =>
      var cum = off(i)
      it.map { case (v, c) => val r2 = 2L * cum + c + 1L; cum += c; Row(v, r2) }
    }
    df.sparkSession.createDataFrame(rows, StructType(Seq(
      StructField("v", vField.dataType, nullable = false),
      StructField("rank2", LongType, nullable = false))))
  }

  /** Spearman rank correlation — the monotone-association screen Pearson
    * misses (quality scores vs document length rarely track linearly;
    * they often track in RANK): Pearson over tie-averaged ranks, exact
    * to the last bit because the doubled ranks are integers and every
    * sum is an exact Long; rho is one fixed double expression over six
    * exact sums (the [[graft.graph.Graph.degreeAssortativity]] shape).
    *
    * Rows where either side is null are excluded (a pair is a pair).
    * Overflow bound: Σ rx·ry ≤ 4n³, exact while n ≤ 1.2·10⁶ pairs — the
    * stated-bound convention; beyond that, sample or move the sums to
    * wider arithmetic before trusting the tail digits.
    *
    * Scale shape: two distinct-domain rank passes (groupBy + range-sort
    * + two-pass prefix offsets — never a data-sized single-task window),
    * two keyed value joins to attach ranks, one global aggregate.
    * Output (one row): n, rho.
    */
  def spearmanRho(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val base = df.select(col(xCol).as("x"), col(yCol).as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
    val rx = rank2Table(base, "x").toDF("x", "rx")
    val ry = rank2Table(base, "y").toDF("y", "ry")
    base.join(rx, Seq("x")).join(ry, Seq("y"))
      .agg(count(lit(1)).as("n"),
        sum("rx").as("_sx"), sum("ry").as("_sy"),
        sum(col("rx") * col("rx")).as("_sxx"),
        sum(col("ry") * col("ry")).as("_syy"),
        sum(col("rx") * col("ry")).as("_sxy"))
      // loud-failure guard on the stated exactness bound (Σ rx·ry ≤ 4n³):
      // beyond 1.2e6 pairs the Long products could alias — throw, never
      // return a silently-wrong rho. assert_true lives in a filter so
      // column pruning cannot drop it.
      .filter(expr("assert_true(n <= 1200000L, " +
        "'spearmanRho: n > 1.2e6 pairs exceeds the exact-Long rank-product bound') IS NULL"))
      .withColumn("rho", expr(
        """CASE WHEN n * _sxx - _sx * _sx > 0 AND n * _syy - _sy * _sy > 0
          |THEN CAST(n * _sxy - _sx * _sy AS DOUBLE)
          |  / sqrt(CAST(n * _sxx - _sx * _sx AS DOUBLE)
          |       * CAST(n * _syy - _sy * _sy AS DOUBLE))
          |END""".stripMargin))
      .select("n", "rho")
  }
}
