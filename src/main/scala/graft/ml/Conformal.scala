package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Split conformal prediction (Vovk's inductive conformal, the Lei et al.
  * split form): turn ANY point predictor into a prediction interval with
  * a distribution-free finite-sample coverage guarantee — the model-QA
  * layer that certifies "the interval [ŷ − q̂, ŷ + q̂] contains y with
  * probability ≥ 1 − α" using only exchangeability, no model internals.
  *
  * The calibration quantile is the EXACT k-th order statistic of the
  * nonconformity scores with k = ⌈(n+1)(1−α)⌉ — computed distributed via
  * a range-partitioned sort + zipWithIndex (global positions without a
  * single-task window; the suffix-ladder indexing idiom), never a
  * collect of the score set. α enters as an exact rational
  * (alphaNum/alphaDen) so k is integer arithmetic any engine replays:
  * k = ((n+1)·(den−num) + den−1) div den, clamped to [1, n].
  *
  * Exactness contract: scores must be integer-valued (micros by
  * convention — cast upstream); every output is a BIGINT count/rank/
  * value except the final coverage ratio in micros via `div`.
  *
  * Scale shape: one count + one sort of the CALIBRATION set (the small
  * split by construction) + one aggregate over the test set. The only
  * driver-side values are three bounded scalars (n, k, q̂).
  */
object Conformal {

  /** Split-conformal calibration + coverage audit.
    *
    * `cal`/`test`: frames carrying integer label and prediction columns.
    * Nonconformity is |y − ŷ|. Output (one row): n_cal, k_rank, qhat,
    * n_test, covered, coverage_micros — the audit a pipeline alerts on
    * when empirical coverage drops below 1 − α (drift in the residuals).
    */
  def splitConformal(cal: DataFrame, test: DataFrame, yCol: String,
      yhatCol: String, alphaNum: Long = 1L, alphaDen: Long = 10L): DataFrame = {
    require(alphaDen > 0 && alphaNum > 0 && alphaNum < alphaDen,
      s"alpha must be a proper fraction: $alphaNum/$alphaDen")
    val score = abs(col(yCol).cast("long") - col(yhatCol).cast("long"))
    val scores = cal.select(score.as("s"))
    val n = scores.count()
    require(n > 0, "empty calibration set")
    val k = math.min(math.max(
      ((n + 1) * (alphaDen - alphaNum) + alphaDen - 1) / alphaDen, 1L), n)
    // Exact k-th order statistic: range-partitioned ascending sort, then
    // zipWithIndex assigns global positions partition-boundary-free.
    val qhat = scores.sort("s").rdd.zipWithIndex()
      .filter(_._2 == k - 1).map(_._1.getLong(0)).first()
    test
      .agg(
        count(lit(1)).as("n_test"),
        sum(when(score <= qhat, 1L).otherwise(0L)).as("covered"))
      .select(lit(n).as("n_cal"), lit(k).as("k_rank"), lit(qhat).as("qhat"),
        col("n_test"), col("covered"))
      .withColumn("coverage_micros", expr("covered * 1000000L div n_test"))
  }
}
