package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-checked parity-audit cells, rates, gaps, and the degenerate-group
  * sentinel contract. */
class FairnessSpec extends SparkSpec {
  import spark.implicits._

  test("per-group confusion cells, rates and gaps on a hand-built field") {
    // group A: tp=2 fp=1 fn=1 tn=1 (n=5) -> sel 3/5, tpr 2/3, fpr 1/2
    // group B: tp=1 fp=0 fn=0 tn=3 (n=4) -> sel 1/4, tpr 1, fpr 0
    val df = Seq(
      ("A", 1L, 1L), ("A", 1L, 1L), ("A", 0L, 1L), ("A", 1L, 0L), ("A", 0L, 0L),
      ("B", 1L, 1L), ("B", 0L, 0L), ("B", 0L, 0L), ("B", 0L, 0L))
      .toDF("grp", "label", "pred")
    val rows = Fairness.groupParityAudit(df, "grp", "label", "pred")
      .orderBy("grp").collect()
    val a = rows(0); val b = rows(1)
    assert(a.getAs[Long]("tp") === 2L && a.getAs[Long]("fp") === 1L &&
      a.getAs[Long]("fn") === 1L && a.getAs[Long]("tn") === 1L)
    assert(a.getAs[Long]("sel_micros") === 3L * 1000000L / 5L)
    assert(a.getAs[Long]("tpr_micros") === 2L * 1000000L / 3L)
    assert(a.getAs[Long]("fpr_micros") === 500000L)
    assert(b.getAs[Long]("sel_micros") === 250000L)
    assert(b.getAs[Long]("tpr_micros") === 1000000L)
    assert(b.getAs[Long]("fpr_micros") === 0L)
    // global: n=9, tp=3 fp=1 fn=1 tn=4 -> sel 4/9, tpr 3/4, fpr 1/5
    val gSel = 4L * 1000000L / 9L
    assert(a.getAs[Long]("sel_gap_micros") === math.abs(3L * 1000000L / 5L - gSel))
    assert(b.getAs[Long]("sel_gap_micros") === math.abs(250000L - gSel))
    assert(b.getAs[Long]("tpr_gap_micros") === 1000000L - 750000L)
    assert(b.getAs[Long]("fpr_gap_micros") === 200000L)
  }

  test("degenerate groups emit -1 sentinels, never nulls") {
    // group C has no positives (tpr undefined) and everything predicted 0
    val df = Seq(("C", 0L, 0L), ("C", 0L, 0L), ("D", 1L, 1L))
      .toDF("grp", "label", "pred")
    val rows = Fairness.groupParityAudit(df, "grp", "label", "pred")
      .orderBy("grp").collect()
    val c = rows(0); val d = rows(1)
    assert(c.getAs[Long]("tpr_micros") === -1L, "no positives in C")
    assert(c.getAs[Long]("tpr_gap_micros") === -1L, "gap inherits the sentinel")
    assert(d.getAs[Long]("fpr_micros") === -1L, "no negatives in D")
    assert(d.getAs[Long]("fpr_gap_micros") === -1L)
    assert(c.getAs[Long]("sel_micros") === 0L, "selection rate stays defined")
  }
}
