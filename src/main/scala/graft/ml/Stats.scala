package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed second-moment statistics with deterministic results.
  *
  * Spark's built-in `corr`/`covar_samp` stream doubles through Welford-style
  * updates, so the result depends on partition order — fine for analytics,
  * fatal for a reproducibility gate. Here every moment is an EXACT decimal
  * sum (one aggregation pass, map-side partial) and the statistic is
  * derived from those sums in a fixed IEEE op order — bit-identical on any
  * partitioning and any engine that follows the same formula.
  */
object Stats {

  /** Pearson correlation + sample covariance of two numeric columns in one
    * pass. Output: (n, mean_x, mean_y, cov_samp, corr) — all doubles
    * derived from exact sums; null corr when either variance is zero.
    */
  def exactCorrelation(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    def dec(c: String): Column = col(c).cast("decimal(18,2)")
    val agg = df.agg(
      count(lit(1)).as("n"),
      sum(dec(xCol)).as("sx"),
      sum(dec(yCol)).as("sy"),
      sum(dec(xCol) * dec(yCol)).as("sxy"),
      sum(dec(xCol) * dec(xCol)).as("sxx"),
      sum(dec(yCol) * dec(yCol)).as("syy"))
    // every factor cast to double FIRST (each an exact decimal), then one
    // fixed arithmetic shape — the oracle mirrors this op order exactly
    val n = col("n").cast("double")
    val (sx, sy) = (col("sx").cast("double"), col("sy").cast("double"))
    val (sxy, sxx, syy) = (col("sxy").cast("double"), col("sxx").cast("double"), col("syy").cast("double"))
    val covNum = n * sxy - sx * sy
    val varX = n * sxx - sx * sx
    val varY = n * syy - sy * sy
    agg.select(
      col("n"),
      (sx / n).as("mean_x"),
      (sy / n).as("mean_y"),
      (covNum / (n * (n - lit(1.0)))).as("cov_samp"),
      when(varX > 0 && varY > 0, covNum / (sqrt(varX) * sqrt(varY)))
        .otherwise(lit(null).cast("double")).as("corr"))
  }
}
