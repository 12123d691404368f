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
    * pass — counts per distinct value), then ordered cumulative sums over
    * the DISTINCT-value relation only. That ordered window serializes
    * distinct values through one task — correct when the metric's
    * distinct domain is bounded (prices, scores, latencies at fixed
    * precision); for an unbounded continuous domain, quantize first (the
    * [[psi]] binning) and run KS on the quantized values: same contract.
    *
    * Determinism: every double derives from exact long counts in one
    * fixed op sequence (cum/total per value, |diff|, max — max is
    * order-independent), then integer micros — engine- and
    * partition-order independent.
    */
  def ksStatistic(reference: DataFrame, current: DataFrame,
      valueCol: String): DataFrame = {
    val u = reference.select(col(valueCol).as("v"))
        .withColumn("_r", lit(1L)).withColumn("_c", lit(0L))
      .unionByName(current.select(col(valueCol).as("v"))
        .withColumn("_r", lit(0L)).withColumn("_c", lit(1L)))
    val wOrd = Window.orderBy("v")
    val wAll = Window.partitionBy()
    u.groupBy("v").agg(sum("_r").as("nr"), sum("_c").as("nc"))
      .withColumn("fr",
        sum("nr").over(wOrd).cast("double") / sum("nr").over(wAll).cast("double"))
      .withColumn("fc",
        sum("nc").over(wOrd).cast("double") / sum("nc").over(wAll).cast("double"))
      .agg(
        expr("CAST(floor(max(abs(fr - fc)) * 1e6 + 0.5) AS BIGINT)").as("ks_micros"),
        sum("nr").as("n_ref"), sum("nc").as("n_cur"))
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
      .withColumn("contrib_micros", expr(
        """CAST(floor(((ref_cnt - e_ref) * (ref_cnt - e_ref) / e_ref
          |  + (cur_cnt - e_cur) * (cur_cnt - e_cur) / e_cur) * 1e6 + 0.5) AS BIGINT)""".stripMargin))
      .select("cat", "ref_cnt", "cur_cnt", "contrib_micros")
  }
}
