package graft.ml

import graft.SparkSpec

class ActiveLearningSpec extends SparkSpec {
  import spark.implicits._

  private def batch(perStratum: Int,
      rows: Seq[(Long, Long, Long)], strata: Seq[(Long, String)]) =
    ActiveLearning.acquisitionBatch(
      rows.toDF("doc_id", "cls", "score"), "doc_id", "cls", "score",
      strata.toDF("doc_id", "lang"), "lang", perStratum)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getAs[Long]("top_class"),
        r.getAs[Long]("margin_micros"), r.getAs[Long]("least_conf_micros"),
        r.getAs[Long]("pick_rank")))
      .sortBy(t => (t._1, t._6))

  test("margin, least-confidence and stratified pick match hand computation") {
    val rows = Seq(
      (1L, 0L, 900000L), (1L, 1L, 880000L), (1L, 2L, 100000L),
      (2L, 0L, 500000L), (2L, 1L, 100000L), (2L, 2L, 450000L),
      (3L, 0L, 300000L), (3L, 1L, 300000L), (3L, 2L, 100000L))
    val strata = Seq((1L, "a"), (2L, "a"), (3L, "b"))
    // full budget: every item, ranked inside its stratum by margin
    assert(batch(5, rows, strata) === Seq(
      ("a", 1L, 0L, 20000L, 100000L, 1L),
      ("a", 2L, 0L, 50000L, 500000L, 2L),
      // item 3's top-2 tie on 300000: rank breaks to the smaller class,
      // top_class 0, margin exactly 0 -- maximal uncertainty
      ("b", 3L, 0L, 0L, 700000L, 1L)))
    // budget 1: only the lowest-margin item of each stratum survives
    assert(batch(1, rows, strata).map(t => (t._1, t._2)) ===
      Seq(("a", 1L), ("b", 3L)))
  }

  test("single-class items degenerate to full-confidence margins; pick ties break to the smaller id") {
    val rows = Seq(
      (4L, 1L, 700000L),              // no runner-up: margin = 700000
      (5L, 0L, 600000L), (5L, 1L, 400000L),
      (6L, 0L, 800000L), (6L, 1L, 600000L)) // same margin as item 5
    val strata = Seq((4L, "x"), (5L, "x"), (6L, "x"))
    val got = batch(2, rows, strata)
    // items 5 and 6 tie at margin 200000 -> id order; item 4 never picked
    assert(got.map(_._2) === Seq(5L, 6L))
    assert(got.map(_._4).toSet === Set(200000L))
    // items without a stratum row are outside the labeling population
    val none = batch(2, rows, Seq((5L, "x")))
    assert(none.map(_._2) === Seq(5L))
  }
}
