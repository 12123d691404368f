package graft.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Per-group simple linear regression (OLS y ~ x) from EXACT integer
  * sums — distributed trend detection over arbitrarily many groups.
  *
  * The reference's analytics layer stops at per-window aggregates and
  * z-score anomaly flags (reference/lambda/data_quality_monitor/
  * lambda_function.py:223-260 trailing mean/stddev); a trend SLOPE per
  * entity (is this segment's revenue growing? is this table's row count
  * drifting?) is the natural next question and a classic scale-out
  * one-pass statistic: every closed-form OLS term (n, Σx, Σy, Σxy, Σx²,
  * Σy²) is a map-side-combinable integer sum, so the whole fit is ONE
  * groupBy over the points — no iteration, no driver math, no per-group
  * collect.
  *
  * Determinism contract (the engine's cross-engine rules): inputs are
  * INTEGER columns (caller pre-scales, e.g. money → truncated dollars);
  * the five moment sums are exact BIGINTs; slope/intercept divide two
  * exactly-cast doubles (single IEEE rounding each, identical on any
  * engine and any partitioning); r² is assembled from those casts in a
  * fixed op order. Magnitude bounds, enforced: per-row x·y and y² must
  * fit a long; n·Σxy and Σx·Σy are exact doubles below 2⁵³ at the scales
  * the caller pre-scaled for (that is what the pre-scaling is FOR — at
  * 100 TB, scale y to millions and the bounds hold with 9 digits to
  * spare).
  */
object Regression {

  /** One row per group: (groupCols*, n_points, slope, intercept, r2).
    *
    * `xCol`/`yCol` must be integral (long-castable exactly). Groups with
    * a degenerate x spread (all x equal: n·Σx² = (Σx)²) get null
    * slope/intercept/r2; a flat y (zero variance) gets r2 null. Guards
    * run BEFORE the division — ANSI mode raises on divide-by-zero.
    */
  def groupedOls(df: DataFrame, groupCols: Seq[String], xCol: String,
      yCol: String): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    val agg = df.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n_points"),
      sum(x).as("_sx"),
      sum(y).as("_sy"),
      sum(x * y).as("_sxy"),
      sum(x * x).as("_sxx"),
      // Σy² can pass 2⁶³ where the raw sums don't: route through an
      // exact decimal sum, then the string-cast double (the q_drift
      // lesson — decimal→double direct would double-round past 2⁵³)
      sum((y * y).cast("decimal(38,0)")).as("_syy"))

    def d(c: Column): Column = c.cast("double")
    val denL  = col("n_points") * col("_sxx") - col("_sx") * col("_sx")
    val numL  = col("n_points") * col("_sxy") - col("_sx") * col("_sy")
    val icepL = col("_sy") * col("_sxx") - col("_sx") * col("_sxy")
    val syyD  = col("_syy").cast("string").cast("double")
    val varyD = d(col("n_points")) * syyD - d(col("_sy")) * d(col("_sy"))

    agg
      .withColumn("slope",
        when(denL =!= 0, d(numL) / d(denL)).otherwise(lit(null).cast("double")))
      .withColumn("intercept",
        when(denL =!= 0, d(icepL) / d(denL)).otherwise(lit(null).cast("double")))
      .withColumn("r2",
        when(denL =!= 0 && varyD =!= 0.0,
          (d(numL) * d(numL)) / (d(denL) * varyD))
          .otherwise(lit(null).cast("double")))
      .drop("_sx", "_sy", "_sxy", "_sxx", "_syy")
  }
}
