package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-checked split-conformal arithmetic: exact order-statistic rank,
  * clamping, and the coverage guarantee on a planted residual field. */
class ConformalSpec extends SparkSpec {
  import spark.implicits._

  test("k-th order statistic and coverage on a hand-built calibration set") {
    // cal scores |y - yhat| = 1..10; alpha = 1/5 -> k = ceil(11 * 4/5) = 9
    val cal = (1L to 10L).map(s => (100L + s, 100L)).toDF("y", "yhat")
    val test = Seq((50L, 41L), (50L, 42L), (50L, 60L), (50L, 38L))
      .toDF("y", "yhat") // scores 9, 8, 10, 12 -> covered: 9, 8 (<= qhat 9), 10 & 12 not... 10 > 9, 12 > 9
    val r = Conformal.splitConformal(cal, test, "y", "yhat",
      alphaNum = 1L, alphaDen = 5L).collect().head
    assert(r.getAs[Long]("n_cal") === 10L)
    assert(r.getAs[Long]("k_rank") === 9L)
    assert(r.getAs[Long]("qhat") === 9L)
    assert(r.getAs[Long]("n_test") === 4L)
    assert(r.getAs[Long]("covered") === 2L)
    assert(r.getAs[Long]("coverage_micros") === 500000L)
  }

  test("k clamps to n when the ceiling exceeds the calibration size") {
    // n = 3, alpha = 1/10 -> ceil(4 * 9/10) = 4 > n -> clamp to 3
    val cal = Seq((10L, 9L), (10L, 8L), (10L, 5L)).toDF("y", "yhat")
    val test = Seq((10L, 6L)).toDF("y", "yhat")
    val r = Conformal.splitConformal(cal, test, "y", "yhat").collect().head
    assert(r.getAs[Long]("k_rank") === 3L)
    assert(r.getAs[Long]("qhat") === 5L, "clamped rank takes the max score")
    assert(r.getAs[Long]("covered") === 1L)
  }

  test("coverage guarantee holds on an exchangeable planted residual field") {
    // residuals (i * 37) % 1000 - 500 over disjoint cal/test splits of
    // the same deterministic field: empirical coverage must be >= 1 - alpha
    // up to finite-sample slack (the conformal theorem's statement).
    val base = spark.range(0, 5000)
      .select(col("id"), lit(1000L).as("y"),
        (lit(1000L) + (col("id") * 37) % 1000 - 500).as("yhat"))
    val r = Conformal.splitConformal(
      base.filter(col("id") % 5 === 0), base.filter(col("id") % 5 =!= 0),
      "y", "yhat", alphaNum = 1L, alphaDen = 10L).collect().head
    val cov = r.getAs[Long]("coverage_micros")
    assert(cov >= 880000L, s"coverage $cov far below the 0.9 guarantee")
    assert(r.getAs[Long]("n_cal") === 1000L)
    assert(r.getAs[Long]("k_rank") === 901L)
  }

  test("invalid alpha and empty calibration are rejected") {
    val df = Seq((1L, 1L)).toDF("y", "yhat")
    intercept[IllegalArgumentException] {
      Conformal.splitConformal(df, df, "y", "yhat", alphaNum = 5L, alphaDen = 5L)
    }
    intercept[IllegalArgumentException] {
      Conformal.splitConformal(df.filter(lit(false)), df, "y", "yhat")
    }
  }
}
