package graft.gold

import graft.SparkSpec

class AssociationSpec extends SparkSpec {
  import spark.implicits._

  test("pairLift: hand-computed supports, directional confidences and lift") {
    // u1{A,B} u2{A,B} u3{A} u4{B,C} u5{C}; a duplicate incidence row
    // must collapse before counting
    val rows = Seq(
      (1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"), (2L, "B"),
      (3L, "A"), (4L, "B"), (4L, "C"), (5L, "C"))
    val got = Association.pairLift(rows.toDF("user", "item"), "user", "item")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("s_ab"), r.getAs[Long]("s_a"), r.getAs[Long]("s_b"),
          r.getAs[Long]("conf_ab_micros"), r.getAs[Long]("conf_ba_micros"),
          r.getAs[Long]("lift_micros")))
      .toMap
    // (A,B): s_ab=2, s_A=s_B=3, N=5 -> conf 666666 both ways,
    // lift = 5*2e6 div 9 = 1111111 (above-chance co-occurrence)
    assert(got(("A", "B")) === (2L, 3L, 3L, 666666L, 666666L, 1111111L))
    // (B,C): s_ab=1 -> conf asymmetric, lift = 5e6 div 6 = 833333 (below chance)
    assert(got(("B", "C")) === (1L, 3L, 2L, 333333L, 500000L, 833333L))
    // A and C never co-occur: no row (support-0 pairs are absent, not 0)
    assert(!got.contains(("A", "C")))
  }
}
