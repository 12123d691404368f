package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** M10: A/B comparison — Welch's t-test, Cohen's d, and bootstrap CIs.
  *
  * Mirrors reference/sagemaker/training/ab_testing.py:86-206. The heavy part
  * (group sums) is distributed; the statistics are exact arithmetic on those
  * sums, so nothing unbounded reaches the driver. Bootstrap runs on a
  * driver-side sample ONLY when the group is small (CV scores in the
  * reference); at data scale, use the t-interval instead.
  */
object AbTesting {

  final case class GroupStats(n: Long, mean: Double, variance: Double)
  final case class TTestResult(tStat: Double, df: Double, cohensD: Double,
      meanA: Double, meanB: Double)

  /** Distributed exact group stats: decimal sums → deterministic moments. */
  def groupStats(df: DataFrame, valueCol: String, groupCol: String): Map[String, GroupStats] = {
    val dec = col(valueCol).cast("decimal(28,6)")
    df.groupBy(groupCol)
      .agg(count(lit(1)).as("n"), sum(dec).as("s"), sum(dec * dec).as("ss"))
      .collect()
      .map { r =>
        val n = r.getLong(1)
        val s = r.getDecimal(2).doubleValue
        val ss = r.getDecimal(3).doubleValue
        val mean = s / n
        val variance = if (n > 1) math.max((ss - s * s / n) / (n - 1), 0.0) else 0.0
        r.getString(0) -> GroupStats(n, mean, variance)
      }.toMap
  }

  /** Welch's unequal-variance t-test + Cohen's d (pooled-sd flavor, like the
    * reference's implementation).
    */
  def welchTTest(a: GroupStats, b: GroupStats): TTestResult = {
    val se2 = a.variance / a.n + b.variance / b.n
    val t = (a.mean - b.mean) / math.sqrt(se2)
    val df = se2 * se2 / (
      math.pow(a.variance / a.n, 2) / (a.n - 1) +
      math.pow(b.variance / b.n, 2) / (b.n - 1))
    val pooledSd = math.sqrt(
      ((a.n - 1) * a.variance + (b.n - 1) * b.variance) / (a.n + b.n - 2))
    val d = if (pooledSd == 0) 0.0 else (a.mean - b.mean) / pooledSd
    TTestResult(t, df, d, a.mean, b.mean)
  }

  def compare(df: DataFrame, valueCol: String, groupCol: String,
      groupA: String, groupB: String): TTestResult = {
    val stats = groupStats(df, valueCol, groupCol)
    welchTTest(stats(groupA), stats(groupB))
  }

  /** Seeded bootstrap CI of the mean difference — driver-side, for
    * small-sample uses (e.g. per-fold CV scores, as in the reference).
    */
  def bootstrapMeanDiffCi(a: Seq[Double], b: Seq[Double], iterations: Int = 1000,
      alpha: Double = 0.05, seed: Long = 42L): (Double, Double) = {
    val rnd = new scala.util.Random(seed)
    def resampleMean(xs: Seq[Double]) = {
      var s = 0.0
      var i = 0
      while (i < xs.size) { s += xs(rnd.nextInt(xs.size)); i += 1 }
      s / xs.size
    }
    val diffs = Array.fill(iterations)(resampleMean(a) - resampleMean(b)).sorted
    val lo = diffs(math.max(0, (alpha / 2 * iterations).toInt))
    val hi = diffs(math.min(iterations - 1, ((1 - alpha / 2) * iterations).toInt))
    (lo, hi)
  }
}
