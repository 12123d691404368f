package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-checked Cohen / Fleiss kappa arithmetic, the exact-ingredient
  * contract, and the ragged-panel guard. */
class AgreementSpec extends SparkSpec {
  import spark.implicits._

  test("Cohen's kappa on the textbook 2x2 table") {
    // Classic example: 50 items, raters agree on 20 yes + 15 no;
    // a=20 b=5 / c=10 d=15 -> po=0.7, pe=0.5, kappa=0.4
    def rows(n: Int, la: Long, lb: Long, start: Long) =
      (0 until n).flatMap(i =>
        Seq((start + i, 0L, la), (start + i, 1L, lb)))
    val df = (rows(20, 1L, 1L, 0L) ++ rows(5, 1L, 0L, 100L) ++
      rows(10, 0L, 1L, 200L) ++ rows(15, 0L, 0L, 300L))
      .toDF("item", "rater", "label")
    val r = Agreement.cohenKappa(df, "item", "rater", "label", 0L, 1L)
      .collect().head
    assert(r.getAs[Long]("n_items") === 50L)
    assert(r.getAs[Long]("agree") === 35L)
    // marginals: rater0 yes=25 no=25; rater1 yes=30 no=20
    assert(r.getAs[Long]("pe_num") === 25L * 30L + 25L * 20L)
    assert(r.getAs[Double]("po") === 0.7d)
    assert(r.getAs[Double]("pe") === 0.5d)
    assert(math.abs(r.getAs[Double]("kappa") - 0.4d) < 1e-12)
  }

  test("Cohen's kappa: perfect agreement = 1, chance-level ~ 0, constant raters defined") {
    val perfect = (0L until 40L).flatMap(i =>
      Seq((i, 0L, i % 3), (i, 1L, i % 3))).toDF("item", "rater", "label")
    assert(Agreement.cohenKappa(perfect, "item", "rater", "label", 0L, 1L)
      .collect().head.getAs[Double]("kappa") === 1.0d)

    // both raters constant at the same label: pe = 1, po = 1 -> kappa 1
    val const = (0L until 10L).flatMap(i =>
      Seq((i, 0L, 7L), (i, 1L, 7L))).toDF("item", "rater", "label")
    assert(Agreement.cohenKappa(const, "item", "rater", "label", 0L, 1L)
      .collect().head.getAs[Double]("kappa") === 1.0d)

    // constant but different: pe = 1, po = 0 -> kappa 0 by convention
    val disjoint = (0L until 10L).flatMap(i =>
      Seq((i, 0L, 1L), (i, 1L, 2L))).toDF("item", "rater", "label")
    assert(Agreement.cohenKappa(disjoint, "item", "rater", "label", 0L, 1L)
      .collect().head.getAs[Double]("kappa") === 0.0d)
  }

  test("items rated by only one of the pair are dropped") {
    val df = Seq(
      (1L, 0L, 1L), (1L, 1L, 1L),
      (2L, 0L, 1L), // no rater-1 row
      (3L, 1L, 0L)) // no rater-0 row
      .toDF("item", "rater", "label")
    val r = Agreement.cohenKappa(df, "item", "rater", "label", 0L, 1L)
      .collect().head
    assert(r.getAs[Long]("n_items") === 1L)
    assert(r.getAs[Long]("agree") === 1L)
  }

  test("Fleiss' kappa on Fleiss's worked shape: hand-computed S1/S2") {
    // 4 items x 3 raters, 2 categories; cell counts per item: (3,0),
    // (2,1), (2,1), (0,3)
    val df = Seq(
      (1L, 0L, 0L), (1L, 1L, 0L), (1L, 2L, 0L),
      (2L, 0L, 0L), (2L, 1L, 0L), (2L, 2L, 1L),
      (3L, 0L, 1L), (3L, 1L, 0L), (3L, 2L, 0L),
      (4L, 0L, 1L), (4L, 1L, 1L), (4L, 2L, 1L))
      .toDF("item", "rater", "label")
    val r = Agreement.fleissKappa(df, "item", "rater", "label").collect().head
    assert(r.getAs[Long]("n_items") === 4L)
    assert(r.getAs[Long]("n_raters") === 3L)
    // S1 = sum(c^2) - N*m = (9 + 4+1 + 4+1 + 9) - 12 = 16
    assert(r.getAs[Long]("s1") === 16L)
    // category totals: cat0 = 7, cat1 = 5 -> S2 = 49 + 25 = 74
    assert(r.getAs[Long]("s2") === 74L)
    val pbar = 16.0 / (4.0 * 3.0 * 2.0)           // 2/3
    val pe = 74.0 / (12.0 * 12.0)                 // 0.5138…
    assert(math.abs(r.getAs[Double]("pbar") - pbar) < 1e-12)
    assert(math.abs(r.getAs[Double]("pe") - pe) < 1e-12)
    assert(math.abs(r.getAs[Double]("kappa") - (pbar - pe) / (1.0 - pe)) < 1e-12)
  }

  test("Fleiss' kappa throws on ragged panels instead of returning a wrong statistic") {
    val ragged = Seq(
      (1L, 0L, 0L), (1L, 1L, 0L), (1L, 2L, 1L),
      (2L, 0L, 0L), (2L, 1L, 1L)) // item 2 has only 2 ratings
      .toDF("item", "rater", "label")
    val e = intercept[IllegalArgumentException] {
      Agreement.fleissKappa(ragged, "item", "rater", "label")
    }
    assert(e.getMessage.contains("fixed panel"))
  }

  test("krippendorffAlpha: hand-computed coincidence form on even and ragged panels") {
    import spark.implicits._
    def alpha(rows: Seq[(Long, Long, String)]) =
      Agreement.krippendorffAlpha(rows.toDF("item", "rater", "label"),
        "item", "rater", "label").collect().head
    // {AA, AB}: n=4, socc=2e6, Do=2e6; De=(16-10)e6 div 3=2e6 -> alpha 0
    val r1 = alpha(Seq((1L, 0L, "A"), (1L, 1L, "A"), (2L, 0L, "A"), (2L, 1L, "B")))
    assert(r1.getAs[Long]("do_micros") === 2000000L)
    assert(r1.getAs[Long]("de_micros") === 2000000L)
    assert(r1.getAs[Double]("alpha") === 0.0d)
    // perfect agreement across two categories -> alpha exactly 1
    val r2 = alpha(Seq((1L, 0L, "A"), (1L, 1L, "A"), (2L, 0L, "B"), (2L, 1L, "B")))
    assert(r2.getAs[Long]("do_micros") === 0L)
    assert(r2.getAs[Long]("de_micros") === 2666666L)
    assert(r2.getAs[Double]("alpha") === 1.0d)
    // degenerate single-category corpus: De = 0, perfect -> 1
    val r3 = alpha(Seq((1L, 0L, "A"), (1L, 1L, "A"), (2L, 0L, "A"), (2L, 1L, "A")))
    assert(r3.getAs[Long]("de_micros") === 0L && r3.getAs[Double]("alpha") === 1.0d)
    // RAGGED panel (the case Cohen/Fleiss cannot take): m in {3, 2}, a
    // single-rating item dropped; hand lattice: socc=1e6, Do=4e6, De=3e6
    val r4 = alpha(Seq(
      (1L, 0L, "A"), (1L, 1L, "A"), (1L, 2L, "B"),
      (2L, 0L, "A"), (2L, 1L, "B"),
      (3L, 0L, "A")))
    assert(r4.getAs[Long]("n_items") === 2L)
    assert(r4.getAs[Long]("n_ratings") === 5L)
    assert(r4.getAs[Long]("do_micros") === 4000000L)
    assert(r4.getAs[Long]("de_micros") === 3000000L)
    assert(r4.getAs[Double]("alpha") === 1.0d - 4000000.0d / 3000000.0d)
    // nothing pairable: null alpha, zero counts
    val r5 = alpha(Seq((1L, 0L, "A"), (2L, 1L, "B")))
    assert(r5.getAs[Long]("n_items") === 0L && r5.isNullAt(r5.fieldIndex("alpha")))
  }
}
