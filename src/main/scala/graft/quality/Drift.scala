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
    val x = col(valueCol).cast("decimal(18,2)")
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
      .withColumn("_s2", sum(x * x).over(w))
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
}
