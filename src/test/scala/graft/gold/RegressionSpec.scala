package graft.gold

import graft.SparkSpec

class RegressionSpec extends SparkSpec {
  import spark.implicits._

  test("groupedOls fits exact lines, degenerate x gives nulls, flat y gives null r2") {
    val pts = Seq(
      // group "lin": y = 2x exactly -> slope 2, intercept 0, r2 1
      ("lin", 1L, 2L), ("lin", 2L, 4L), ("lin", 3L, 6L),
      // group "off": y = 3x + 10 -> slope 3, intercept 10, r2 1
      ("off", 0L, 10L), ("off", 1L, 13L), ("off", 2L, 16L), ("off", 3L, 19L),
      // group "deg": all x equal -> no slope
      ("deg", 5L, 1L), ("deg", 5L, 2L),
      // group "flat": y constant -> slope 0, r2 null (zero y variance)
      ("flat", 1L, 7L), ("flat", 2L, 7L), ("flat", 3L, 7L)
    ).toDF("g", "x", "y")
    val out = Regression.groupedOls(pts, Seq("g"), "x", "y").collect()
      .map(r => r.getString(0) -> r).toMap

    assert(out("lin").getAs[Double]("slope") === 2.0)
    assert(out("lin").getAs[Double]("intercept") === 0.0)
    assert(out("lin").getAs[Double]("r2") === 1.0)

    assert(out("off").getAs[Double]("slope") === 3.0)
    assert(out("off").getAs[Double]("intercept") === 10.0)
    assert(out("off").getAs[Double]("r2") === 1.0)

    assert(out("deg").isNullAt(out("deg").fieldIndex("slope")))
    assert(out("deg").isNullAt(out("deg").fieldIndex("intercept")))
    assert(out("deg").isNullAt(out("deg").fieldIndex("r2")))

    assert(out("flat").getAs[Double]("slope") === 0.0)
    assert(out("flat").isNullAt(out("flat").fieldIndex("r2")))
  }

  test("groupedOls matches the closed-form fit on a noisy group") {
    // y = 5x + 3 with deterministic residuals (-1, 1 alternating)
    val pts = (1L to 10L).map(x => ("g", x, 5 * x + 3 + (if (x % 2 == 0) 1L else -1L)))
      .toDF("g", "x", "y")
    val r = Regression.groupedOls(pts, Seq("g"), "x", "y").collect().head
    // closed form on the same integers
    val xs = (1L to 10L); val ys = xs.map(x => 5 * x + 3 + (if (x % 2 == 0) 1L else -1L))
    val n = xs.size.toLong
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(x => x * x).sum
    val expSlope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
    val expIcep = (sy * sxx - sx * sxy).toDouble / (n * sxx - sx * sx).toDouble
    assert(r.getAs[Double]("slope") === expSlope)
    assert(r.getAs[Double]("intercept") === expIcep)
    assert(r.getAs[Double]("r2") > 0.99 && r.getAs[Double]("r2") < 1.0)
  }

  test("groupedOls is partitioning-independent (integer sums commute)") {
    val pts = (1L to 100L).map(x => ("g", x, 7 * x - 11)).toDF("g", "x", "y")
    val a = Regression.groupedOls(pts.repartition(1), Seq("g"), "x", "y").collect().head
    val b = Regression.groupedOls(pts.repartition(13), Seq("g"), "x", "y").collect().head
    assert(a.getAs[Double]("slope") === b.getAs[Double]("slope"))
    assert(a.getAs[Double]("intercept") === b.getAs[Double]("intercept"))
    assert(a.getAs[Double]("r2") === b.getAs[Double]("r2"))
  }
}
