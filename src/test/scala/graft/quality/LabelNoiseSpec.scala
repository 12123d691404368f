package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-checked confident-joint arithmetic: thresholds, clearing,
  * deterministic argmax, diagonal exclusion. */
class LabelNoiseSpec extends SparkSpec {
  import spark.implicits._

  private def long(rows: Seq[(Long, Long, Long, Long)]) =
    rows.toDF("item", "given", "cls", "score")

  test("flags exactly the items whose off-class score clears the class threshold") {
    // 2 classes. Self scores: class 0 items {900k, 700k} -> t0 = 800k;
    // class 1 items {600k, 800k} -> t1 = 700k.
    // item 1 (given 0): score_1 = 750000 >= t1 -> flagged 0 -> 1
    // item 2 (given 0): score_1 = 650000 <  t1 -> clean
    // item 3 (given 1): score_0 = 850000 >= t0 -> flagged 1 -> 0
    // item 4 (given 1): score_0 = 100000 -> clean
    val df = long(Seq(
      (1L, 0L, 0L, 900000L), (1L, 0L, 1L, 750000L),
      (2L, 0L, 0L, 700000L), (2L, 0L, 1L, 650000L),
      (3L, 1L, 1L, 600000L), (3L, 1L, 0L, 850000L),
      (4L, 1L, 1L, 800000L), (4L, 1L, 0L, 100000L)))
    val out = LabelNoise.confidentJoint(df, "item", "given", "cls", "score")
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set((0L, 1L, 1L), (1L, 0L, 1L)))
  }

  test("argmax among clearing classes breaks ties to the smallest class id") {
    // 3 classes; item 1 given 0; classes 1 and 2 both clear with EQUAL
    // scores -> suggested must be 1.
    val df = long(Seq(
      (1L, 0L, 0L, 500000L), (1L, 0L, 1L, 900000L), (1L, 0L, 2L, 900000L),
      // self rows defining thresholds t1 = t2 = 800k
      (2L, 1L, 1L, 800000L), (2L, 1L, 0L, 0L), (2L, 1L, 2L, 0L),
      (3L, 2L, 2L, 800000L), (3L, 2L, 0L, 0L), (3L, 2L, 1L, 0L)))
    val out = LabelNoise.confidentJoint(df, "item", "given", "cls", "score")
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set((0L, 1L, 1L)),
      "tie between classes 1 and 2 resolves to class 1; items 2 and 3 are clean")
  }

  test("a clean dataset produces an empty joint") {
    val df = long(Seq(
      (1L, 0L, 0L, 900000L), (1L, 0L, 1L, 100000L),
      (2L, 1L, 1L, 900000L), (2L, 1L, 0L, 100000L)))
    assert(LabelNoise.confidentJoint(df, "item", "given", "cls", "score")
      .count() === 0L)
  }
}
