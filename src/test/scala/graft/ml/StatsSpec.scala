package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("exactCorrelation matches the closed form on a crafted frame") {
    // y = 2x exactly -> corr 1.0; hand-checkable moments
    val df = Seq((1.0, 2.0), (2.0, 4.0), (3.0, 6.0), (4.0, 8.0)).toDF("x", "y")
    val r = Stats.exactCorrelation(df, "x", "y").head()
    assert(r.getAs[Long]("n") === 4L)
    assert(r.getAs[Double]("mean_x") === 2.5)
    assert(r.getAs[Double]("mean_y") === 5.0)
    assert(math.abs(r.getAs[Double]("corr") - 1.0) < 1e-12)
    // cov_samp of (1..4, 2..8 step2): cov = 2 * var(x) = 2 * 5/3
    assert(math.abs(r.getAs[Double]("cov_samp") - 10.0 / 3.0) < 1e-12)
  }

  test("constant column yields null corr, not NaN or a crash") {
    val df = Seq((1.0, 7.0), (2.0, 7.0), (3.0, 7.0)).toDF("x", "y")
    val r = Stats.exactCorrelation(df, "x", "y").head()
    assert(r.isNullAt(r.fieldIndex("corr")))
    assert(r.getAs[Double]("cov_samp") === 0.0)
  }

  test("result is bit-identical across partitionings (the reason it exists)") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(500)((rnd.nextInt(100) / 4.0, rnd.nextInt(10000) / 100.0))
    val df = rows.toDF("x", "y")
    val a = Stats.exactCorrelation(df.repartition(1), "x", "y").head()
    val b = Stats.exactCorrelation(df.repartition(13), "x", "y").head()
    assert(a.getAs[Double]("corr") === b.getAs[Double]("corr"))   // bitwise
    assert(a.getAs[Double]("cov_samp") === b.getAs[Double]("cov_samp"))
  }

  test("simpsonScreen: textbook reversal — every stratum positive, pooled negative") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // stratum A: x concentrated where y is common; stratum B mirrored —
    // per-stratum assoc_num = +4 in both, pooled = 20*4 - 10*10 = -20
    val rows =
      Seq.fill(2)(("A", 1L, 1L)) ++ Seq.fill(6)(("A", 0L, 1L)) ++
        Seq.fill(2)(("A", 0L, 0L)) ++
      Seq.fill(2)(("B", 1L, 1L)) ++ Seq.fill(6)(("B", 1L, 0L)) ++
        Seq.fill(2)(("B", 0L, 0L))
    val got = Stats.simpsonScreen(rows.toDF("s", "xv", "yv"), "s",
        col("xv") === 1L, col("yv") === 1L)
      .collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("assoc_num"),
        r.getAs[Long]("pooled_num"), r.getAs[Boolean]("reversed")))
      .toMap
    assert(got("A") === (4L, -20L, true))
    assert(got("B") === (4L, -20L, true))
    // no-association stratum: assoc_num 0 never flags
    val flat = Stats.simpsonScreen(
      Seq(("C", 1L, 1L), ("C", 1L, 0L), ("C", 0L, 1L), ("C", 0L, 0L))
        .toDF("s", "xv", "yv"), "s", col("xv") === 1L, col("yv") === 1L)
      .collect().head
    assert(flat.getAs[Long]("assoc_num") === 0L)
    assert(flat.getAs[Boolean]("reversed") === false)
  }

  test("exactPercentiles is bit-identical to the percentile() aggregate") {
    val rng = new scala.util.Random(11)
    // mixed continuum + heavy ties + a tiny frame (interpolation edges)
    val vals = Seq.fill(5000)(math.floor(rng.nextDouble() * 100000) / 100.0) ++
      Seq.fill(500)(42.5) ++ Seq.fill(3)(-7.25)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v").repartition(7)
    val probs = Seq(0.0, 0.01, 0.5, 0.9, 0.99, 1.0)
    val agg = df.agg(org.apache.spark.sql.functions.expr(
      s"percentile(v, array(${probs.mkString(", ")}))").as("ex"))
      .head().getSeq[Double](0)
    val sorted = Stats.exactPercentiles(df, "v", probs)
    probs.indices.foreach { i =>
      assert(java.lang.Double.doubleToRawLongBits(agg(i)) ===
        java.lang.Double.doubleToRawLongBits(sorted(i)),
        s"p=${probs(i)}: agg ${agg(i)} vs sorted ${sorted(i)}")
    }
    // 1-row edge
    val one = Seq((1L, 3.5)).toDF("id", "v")
    assert(Stats.exactPercentiles(one, "v", Seq(0.5)) === Seq(3.5))
  }
}
