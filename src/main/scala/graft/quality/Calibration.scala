package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-score calibration audit — the companion screen to the quality
  * classifier and conformal layers: a classifier whose scores feed
  * curation thresholds is only usable if score ≈ P(label) (Guo et al.'s
  * ECE, the Brier staple). Produces the standard reliability diagram
  * table (per-bin confidence vs accuracy) and the scalar ECE / Brier
  * summary.
  *
  * Exactness contract: scores arrive as integer micros in [0, 10⁶];
  * every per-bin statistic is an exact Long sum, confidences/accuracies
  * round once per bin via `div`, and the ECE weights the ALREADY-rounded
  * gaps (Σ n_b·gap div N) so every engine replays bit-for-bit. The Brier
  * sum downscales per row ((s − l·10⁶)² div 10⁶ ≤ 10⁶) so the corpus sum
  * stays in Long range up to ~9·10¹² rows.
  *
  * Scale shape: one projection + one B-row groupBy (map-side
  * combinable), plus one global aggregate for the summary — counts only,
  * no windows, no collects.
  */
object Calibration {

  /** Reliability-diagram table: equal-width score bins with per-bin
    * (n, n_pos, conf_micros, acc_micros, gap_micros). The last bin is
    * closed (score = 10⁶ folds into bin B−1).
    */
  def reliabilityTable(df: DataFrame, scoreCol: String, labelCol: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, s"need at least 2 bins: $bins")
    df.select(
        expr(s"CAST(least($scoreCol * $bins div 1000000, ${bins - 1}) AS INT)")
          .as("bin"),
        col(scoreCol).cast("long").as("s"),
        col(labelCol).cast("long").as("l"))
      .groupBy("bin")
      .agg(
        count(lit(1)).as("n"),
        sum("l").as("n_pos"),
        sum("s").as("sum_score"))
      .withColumn("conf_micros", expr("sum_score div n"))
      .withColumn("acc_micros", expr("n_pos * 1000000L div n"))
      .withColumn("gap_micros", abs(col("acc_micros") - col("conf_micros")))
      .drop("sum_score")
  }

  /** Scalar calibration summary: ECE (bin-weighted mean of the rounded
    * per-bin |acc − conf| gaps) and the Brier score, both in micros.
    */
  def calibrationSummary(df: DataFrame, scoreCol: String, labelCol: String,
      bins: Int = 10, maxRowsExact: Long = 9000000000000L): DataFrame = {
    val ece = reliabilityTable(df, scoreCol, labelCol, bins)
      .agg(sum("n").as("n_total"),
        sum(col("n") * col("gap_micros")).as("wgap"))
      .withColumn("ece_micros", expr("wgap div n_total"))
      .drop("wgap")
    val brier = df.agg(
      sum(expr(s"(($scoreCol - $labelCol * 1000000L) * ($scoreCol - $labelCol * 1000000L)) div 1000000"))
        .as("brier_sum"),
      count(lit(1)).as("n_rows"))
      // loud-failure guard: each Brier term ≤ 10⁶, so the exact-Long sum
      // holds while n_rows ≤ 9·10¹² (the default; parameterized so specs
      // can trigger it) — throw past it, never alias.
      .filter(expr(s"assert_true(n_rows <= ${maxRowsExact}L, " +
        "'calibrationSummary: n_rows exceeds the exact Brier-sum Long bound') IS NULL"))
    ece.crossJoin(broadcast(brier))
      .withColumn("brier_micros", expr("brier_sum div n_rows"))
      .select("n_total", "ece_micros", "brier_micros")
  }
}
