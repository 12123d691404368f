package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-checked reliability-table / ECE / Brier arithmetic and the
  * closed-last-bin contract. */
class CalibrationSpec extends SparkSpec {
  import spark.implicits._

  test("reliability table on a hand-built two-bin field") {
    // bin 0 (scores < 500k with bins=2): (100k, 0), (300k, 1) ->
    //   conf = 200k, acc = 500k, gap = 300k
    // bin 1: (600k, 1), (800k, 0), (1000k, 1) -> score 1e6 folds into
    //   the last bin; conf = 800k, acc = 666666, gap = 133334
    val df = Seq((100000L, 0L), (300000L, 1L), (600000L, 1L),
      (800000L, 0L), (1000000L, 1L)).toDF("score_micros", "label")
    val rows = Calibration.reliabilityTable(df, "score_micros", "label", bins = 2)
      .orderBy("bin").collect()
    assert(rows.length === 2)
    assert(rows(0).getAs[Int]("bin") === 0)
    assert(rows(0).getAs[Long]("n") === 2L)
    assert(rows(0).getAs[Long]("conf_micros") === 200000L)
    assert(rows(0).getAs[Long]("acc_micros") === 500000L)
    assert(rows(0).getAs[Long]("gap_micros") === 300000L)
    assert(rows(1).getAs[Int]("bin") === 1, "score = 1e6 folds into the closed last bin")
    assert(rows(1).getAs[Long]("n") === 3L)
    assert(rows(1).getAs[Long]("conf_micros") === 800000L)
    assert(rows(1).getAs[Long]("acc_micros") === 666666L)
    assert(rows(1).getAs[Long]("gap_micros") === 133334L)
  }

  test("ECE weights the rounded gaps; Brier matches the hand sum") {
    val df = Seq((100000L, 0L), (300000L, 1L), (600000L, 1L),
      (800000L, 0L), (1000000L, 1L)).toDF("score_micros", "label")
    val r = Calibration.calibrationSummary(df, "score_micros", "label", bins = 2)
      .collect().head
    assert(r.getAs[Long]("n_total") === 5L)
    // ECE = (2*300000 + 3*133334) div 5 = 1000002 div 5
    assert(r.getAs[Long]("ece_micros") === (2L * 300000L + 3L * 133334L) / 5L)
    // Brier terms (s - l*1e6)^2 div 1e6: 100000^2/1e6 = 10000,
    // 700000^2/1e6 = 490000, 400000^2/1e6 = 160000, 800000^2/1e6 = 640000,
    // 0 -> sum 1300000, div 5 = 260000
    assert(r.getAs[Long]("brier_micros") === 260000L)
  }

  test("a perfectly calibrated degenerate field scores zero ECE") {
    // every score 0 with label 0 and every score 1e6 with label 1
    val df = ((1 to 10).map(_ => (0L, 0L)) ++ (1 to 10).map(_ => (1000000L, 1L)))
      .toDF("score_micros", "label")
    val r = Calibration.calibrationSummary(df, "score_micros", "label").collect().head
    assert(r.getAs[Long]("ece_micros") === 0L)
    assert(r.getAs[Long]("brier_micros") === 0L)
  }

  test("bins guard") {
    val df = Seq((1L, 0L)).toDF("score_micros", "label")
    intercept[IllegalArgumentException] {
      Calibration.reliabilityTable(df, "score_micros", "label", bins = 1)
    }
  }
}
