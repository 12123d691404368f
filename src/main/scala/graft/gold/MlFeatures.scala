package graft.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.GraftConf

/** Silver→gold ML feature engineering: conditional aggregations, behavioral
  * ratios, log features, target labels and the seeded train/val/test split.
  *
  * Re-expresses reference/terraform/modules/glue/templates/silver_to_gold_ml_features.py:
  * conditional aggs (:140-153 — A4), behavioral ratios (:169-191 — M3 incl.
  * greatest F14), log features (:227-235 — F15), targets (:311-351 — M4),
  * split (:483-489 — M5/F17). The reference's split draws TWO independent
  * rand() per row (a real bug: P(train) ≠ 0.7); ours draws once (seeded) and
  * thresholds the single draw — deterministic under GraftConf.seed.
  */
object MlFeatures {

  private def priceDec = col("o_totalprice").cast("decimal(18,2)")

  /** A4 + M3: per-customer conditional aggregates and behavioral ratios. */
  def features(orders: DataFrame, conf: GraftConf = GraftConf.default): DataFrame = {
    val asOf = lit(java.sql.Date.valueOf(conf.asOfDate))
    val d = col("o_orderdate").cast("date")
    val base = orders
      .select(
        col("o_custkey"), priceDec.as("price"), d.as("order_date"),
        quarter(d).as("q"), dayofweek(d).as("dow"))
      .groupBy("o_custkey")
      .agg(
        count(lit(1)).as("order_count"),
        sum(col("price")).as("total_spent"),
        max(col("order_date")).as("last_order_date"),
        min(col("order_date")).as("first_order_date"),
        // A4: conditional aggregation — one pass, no extra scans.
        sum(when(col("dow").isin(1, 7), 1L).otherwise(0L)).as("weekend_orders"),
        sum(when(col("q") === 1, 1L).otherwise(0L)).as("q1_orders"),
        sum(when(col("q") === 2, 1L).otherwise(0L)).as("q2_orders"),
        sum(when(col("q") === 3, 1L).otherwise(0L)).as("q3_orders"),
        sum(when(col("q") === 4, 1L).otherwise(0L)).as("q4_orders"),
        sum(when(col("price") >= 250000, 1L).otherwise(0L)).as("large_orders")
      )
    base
      .withColumn("recency_days", datediff(asOf, col("last_order_date")))
      .withColumn("tenure_days", datediff(col("last_order_date"), col("first_order_date")))
      // M3 behavioral ratios
      .withColumn("weekend_preference",
        round(col("weekend_orders").cast("double") / col("order_count"), 6))
      .withColumn("seasonal_peak_orders",
        greatest(col("q1_orders"), col("q2_orders"), col("q3_orders"), col("q4_orders")))
      .withColumn("seasonal_preference",
        round(col("seasonal_peak_orders").cast("double") / col("order_count"), 6))
      .withColumn("order_frequency",
        round(col("order_count").cast("double") / (col("tenure_days") + lit(1)), 6))
      // F15 log features (silver_to_gold_ml_features.py:227-235)
      .withColumn("frequency_log", round(log(lit(1.0) + col("order_count")), 6))
      .withColumn("monetary_log", round(log(lit(1.0) + col("total_spent").cast("double")), 6))
      .withColumn("recency_score", round(lit(1.0) / (lit(1.0) + col("recency_days") / lit(30.0)), 6))
  }

  /** M4: target labels — churn at 365d recency*, value segment, frequency flag.
    * (*) thresholds adapted to the testdata's 1995-2001 date range.
    */
  def withTargets(features: DataFrame): DataFrame =
    features
      .withColumn("churn_risk", when(col("recency_days") > 730, 1).otherwise(0))
      .withColumn("value_segment",
        when(col("total_spent") >= 3000000, 2)
          .when(col("total_spent") >= 1000000, 1).otherwise(0))
      .withColumn("high_frequency", when(col("order_count") >= 12, 1).otherwise(0))
      .withColumn("clv_category",
        when(col("total_spent") >= 4000000, 4)
          .when(col("total_spent") >= 3000000, 3)
          .when(col("total_spent") >= 2000000, 2)
          .when(col("total_spent") >= 1000000, 1)
          .otherwise(0))

  /** M5: seeded split from ONE random draw per row (fixes the reference's
    * double-rand bug). Deterministic given (seed, partitioning of input) —
    * for oracle-checkable splits prefer [[keyedSplit]].
    */
  def seededSplit(df: DataFrame, conf: GraftConf = GraftConf.default,
      train: Double = 0.7, validation: Double = 0.2): DataFrame = {
    val r = rand(conf.seed)
    df.withColumn("data_split",
      when(r < train, "train").when(r < train + validation, "validation").otherwise("test"))
  }

  /** F16: categorical hash-encoding, `hash(col) % buckets` — mirrors
    * silver_to_gold_ml_features.py:378-384's state_encoded. Murmur3-based
    * (Spark's hash), stable across Spark runs; pmod keeps it non-negative.
    */
  /** Winsorization — clip a numeric feature at its own [lo, hi] exact
    * percentiles (outlier taming before scaling/regression; the robust
    * alternative to dropping IQR outliers). Bounds come from one exact
    * `percentile` aggregate broadcast lazily (the A8/q_bins recipe —
    * bit-identical to quantile_cont), the clip is a pure projection.
    * Adds `<col>_w` plus a `clipped` flag.
    */
  def winsorize(df: DataFrame, column: String,
      lo: Double = 0.01, hi: Double = 0.99): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, s"need 0 <= lo < hi <= 1: $lo/$hi")
    val bounds = df.agg(expr(s"percentile($column, array($lo, $hi))").as("_wb"))
    df.crossJoin(broadcast(bounds))
      .withColumn(s"${column}_w",
        least(greatest(col(column).cast("double"), expr("_wb[0]")), expr("_wb[1]")))
      .withColumn("clipped", col(column).cast("double") =!= col(s"${column}_w"))
      .drop("_wb")
  }

  /** Robust (median/MAD) scaling — the outlier-resistant alternative to
    * z-scoring: x → (x − median) / (MAD · 1.4826), where MAD is the
    * median absolute deviation and 1.4826 makes the scale estimate
    * consistent with σ under normality. Unlike mean/stddev scaling
    * ([[graft.ml.MlPipeline]] StandardScaler), a few extreme rows cannot
    * drag the scale. Output: the input plus `<column>_robust` (null when
    * MAD = 0 — a majority-constant column has no robust scale).
    *
    * Both medians are `percentile_disc` — EXACT data elements, chosen
    * deliberately over interpolating percentile: an even-count
    * interpolated median is `lo + g·(hi−lo)` in one engine and
    * `(1−g)·lo + g·hi` in another — up to 1 ulp apart, which a
    * bit-exact oracle comparison cannot tolerate. A disc median is the
    * same stored double everywhere (SQL-standard "smallest value with
    * cume_dist ≥ q" ≡ DuckDB `quantile_disc`).
    *
    * Scale shape: two global aggregates (each a partial+final percentile
    * over the column), both lazily broadcast as 1-row relations (the A8
    * no-collect idiom); the scaling itself is a pure projection.
    */
  def robustScale(df: DataFrame, column: String,
      scaleFactor: Double = 1.4826): DataFrame = {
    val med = df.agg(expr(
      s"percentile_disc(0.5) WITHIN GROUP (ORDER BY CAST($column AS DOUBLE))").as("_med"))
    val withMed = df.crossJoin(broadcast(med))
    val mad = withMed.agg(expr(
      s"percentile_disc(0.5) WITHIN GROUP (ORDER BY abs(CAST($column AS DOUBLE) - _med))").as("_mad"))
    withMed.crossJoin(broadcast(mad))
      .withColumn(s"${column}_robust",
        when(col("_mad") === lit(0.0), lit(null).cast("double"))
          .otherwise((col(column).cast("double") - col("_med"))
            / (col("_mad") * lit(scaleFactor))))
      .drop("_med", "_mad")
  }

  /** Smoothed target encoding — replace a categorical with the shrunk
    * per-category target mean: (Σ_cat target + m·prior)/(n_cat + m), prior
    * = the global target mean (empirical-Bayes shrinkage: rare categories
    * pull toward the prior instead of memorizing noise — the leakage-aware
    * alternative to raw mean encoding). One aggregation on the category +
    * a lazily-broadcast global; all inputs to the doubles are exact
    * integer counts, the division order is fixed — engine-reproducible.
    */
  def targetEncode(df: DataFrame, categoryCol: String, targetCol: String,
      smoothing: Double = 20.0): DataFrame = {
    require(smoothing >= 0, "smoothing must be non-negative")
    // The sums below cast the target to LONG for exact integer
    // accumulation — a continuous target would be silently truncated to
    // a wrong encoding, so refuse it up front.
    val dt = df.schema(targetCol).dataType
    require(Seq(org.apache.spark.sql.types.BooleanType,
        org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
        .contains(dt),
      s"targetEncode needs a boolean/integral target column (exact long sums); " +
        s"'$targetCol' is $dt — bin or cast a continuous target explicitly first")
    val global = df.agg(count(lit(1)).as("_tn"),
      sum(col(targetCol).cast("long")).as("_tf"))
    df.groupBy(categoryCol)
      .agg(count(lit(1)).as("n_cat"), sum(col(targetCol).cast("long")).as("n_pos"))
      .crossJoin(broadcast(global))
      .withColumn("encoded",
        (col("n_pos") + lit(smoothing) * (col("_tf").cast("double") / col("_tn")))
          / (col("n_cat") + lit(smoothing)))
      .select(categoryCol, "n_cat", "n_pos", "encoded")
  }

  /** Purged time-series cross-validation folds — the leakage-safe split
    * for temporal data: fold i tests on the i-th of `k` equal time blocks
    * and trains ONLY on rows ending `embargoDays` BEFORE the block starts
    * (the embargo absorbs label look-ahead/serial correlation; rows after
    * the test block are never trained on — no future leakage). All
    * boundary math is integer day-indices from the data's own min/max
    * (one lazily-broadcast 1-row aggregate), so folds are deterministic
    * and engine-reproducible. Returns one row per (fold, split) with the
    * day-offset boundaries and row count.
    */
  def timeSeriesSplits(df: DataFrame, tsCol: String, k: Int = 5,
      embargoDays: Int = 0): DataFrame = {
    require(k >= 2, "need at least 2 folds")
    require(embargoDays >= 0, "embargo must be non-negative")
    val bounds = df.agg(min(col(tsCol).cast("date")).as("_d0"),
      (datediff(max(col(tsCol).cast("date")), min(col(tsCol).cast("date"))) + 1).as("_span"))
    val folds = df.sparkSession.range(k).select(col("id").as("fold"))
    df.crossJoin(broadcast(bounds))
      .withColumn("_day", datediff(col(tsCol).cast("date"), col("_d0")))
      .crossJoin(folds)
      .withColumn("_lo", (col("fold") * col("_span") / k).cast("long"))
      .withColumn("_hi", ((col("fold") + 1) * col("_span") / k).cast("long"))
      .withColumn("split",
        when(col("_day") >= col("_lo") && col("_day") < col("_hi"), "test")
          .when(col("_day") < col("_lo") - embargoDays, "train"))
      .filter(col("split").isNotNull)
      .groupBy("fold", "split")
      .agg(count(lit(1)).as("n"),
        min(col("_day")).cast("long").as("first_day"),
        max(col("_day")).cast("long").as("last_day"))
  }

  /** Purged K-fold with embargo (López de Prado, "Advances in Financial
    * Machine Learning", ch. 7) — cross-validation for serially-correlated
    * data where train samples may sit on BOTH sides of the test window:
    * leakage is controlled by PURGING the `purgeDays` immediately before
    * the test window (labels there overlap test information) and
    * EMBARGOING the `embargoDays` immediately after (test information
    * leaks forward into features). Same summary output shape as
    * [[timeSeriesSplits]] — one row per (fold, split) with counts and
    * day bounds; day arithmetic is exact integer, folds are equal
    * day-range slices.
    */
  def purgedKFoldSplits(df: DataFrame, tsCol: String, k: Int = 5,
      purgeDays: Int = 0, embargoDays: Int = 0): DataFrame = {
    require(k >= 2, "need at least 2 folds")
    require(purgeDays >= 0 && embargoDays >= 0, "gaps must be non-negative")
    val bounds = df.agg(min(col(tsCol).cast("date")).as("_d0"),
      (datediff(max(col(tsCol).cast("date")), min(col(tsCol).cast("date"))) + 1).as("_span"))
    val folds = df.sparkSession.range(k).select(col("id").as("fold"))
    df.crossJoin(broadcast(bounds))
      .withColumn("_day", datediff(col(tsCol).cast("date"), col("_d0")))
      .crossJoin(folds)
      .withColumn("_lo", (col("fold") * col("_span") / k).cast("long"))
      .withColumn("_hi", ((col("fold") + 1) * col("_span") / k).cast("long"))
      .withColumn("split",
        when(col("_day") >= col("_lo") && col("_day") < col("_hi"), "test")
          .when(col("_day") < col("_lo") - purgeDays ||
            col("_day") >= col("_hi") + embargoDays, "train"))
      .filter(col("split").isNotNull)
      .groupBy("fold", "split")
      .agg(count(lit(1)).as("n"),
        min(col("_day")).cast("long").as("first_day"),
        max(col("_day")).cast("long").as("last_day"))
  }

  def hashEncode(df: DataFrame, column: String, buckets: Int = 100): DataFrame =
    df.withColumn(s"${column}_encoded", pmod(hash(col(column)), lit(buckets)))

  /** M5 (scale/oracle variant): hash-free deterministic split on a key
    * column — stable under repartitioning, reproducible in any engine.
    */
  def keyedSplit(df: DataFrame, keyCol: String,
      train: Int = 70, validation: Int = 20): DataFrame =
    df.withColumn("_bucket", pmod(col(keyCol), lit(100)))
      .withColumn("data_split",
        when(col("_bucket") < train, "train")
          .when(col("_bucket") < train + validation, "validation")
          .otherwise("test"))
      .drop("_bucket")
}
