package graft.gold

import graft.SparkSpec
import graft.core.GraftConf
import org.apache.spark.sql.functions._

class GoldSpec extends SparkSpec {
  import spark.implicits._

  private val conf = GraftConf(asOfDate = java.time.LocalDate.parse("2002-01-01"))

  private lazy val orders = Seq(
    (1L, 10L, "O", 100000.0, "2000-01-01", "1-URGENT"),
    (2L, 10L, "F", 200000.0, "2000-01-01", "2-HIGH"),
    (3L, 10L, "F", 300000.0, "2000-02-15", "2-HIGH"),
    (4L, 11L, "P", 50000.0, "2001-07-01", "3-MEDIUM")
  ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "d", "o_orderpriority")
    .withColumn("o_orderdate", col("d").cast("timestamp")).drop("d")

  test("daily aggregates with deterministic stddev from exact sums") {
    val d = SalesSummary.daily(orders).collect()
      .map(r => r.getDate(0).toString -> r).toMap
    val jan1 = d("2000-01-01")
    assert(jan1.getAs[Long]("order_count") === 2L)
    assert(jan1.getAs[java.math.BigDecimal]("daily_revenue").doubleValue === 300000.0)
    // sample stddev of {100000, 200000} = 70710.68
    assert(math.abs(jan1.getAs[Double]("order_value_stddev") - 70710.68) < 0.01)
    // single-order day has null stddev (sample semantics)
    assert(d("2001-07-01").isNullAt(d("2001-07-01").fieldIndex("order_value_stddev")))
  }

  test("monthly rollup counts active days and builds month_year") {
    val m = SalesSummary.monthly(orders).collect()
      .map(r => r.getAs[String]("month_year") -> r).toMap
    assert(m("2000-01").getAs[Long]("order_count") === 2L)
    assert(m("2000-01").getAs[Long]("active_days") === 1L)
    assert(m.keySet === Set("2000-01", "2000-02", "2001-07"))
  }

  test("customerMetrics recency/tenure from injected as-of") {
    val cm = CustomerAnalytics.customerMetrics(orders, conf).collect()
      .map(r => r.getAs[Long]("o_custkey") -> r).toMap
    assert(cm(10L).getAs[Long]("total_orders") === 3L)
    assert(cm(10L).getAs[Int]("tenure_days") === 45)
    assert(cm(11L).getAs[Int]("recency_days") === 184)
  }

  test("analytics left join keeps customers without orders, fillna applies") {
    val customer = Seq((10L, "Customer#10", "BUILDING", 100.0), (99L, "Customer#99", "MACHINERY", 5.0))
      .toDF("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
    val a = CustomerAnalytics.analytics(customer, orders, conf).collect()
      .map(r => r.getAs[Long]("o_custkey") -> r).toMap
    assert(a(99L).getAs[Long]("total_orders") === 0L)
    assert(a(99L).getAs[Int]("recency_days") === -1)
    assert(a(99L).getAs[Long]("small_orders") === 0L)
    assert(a(10L).getAs[Long]("total_orders") === 3L)
  }

  test("multiGrainUnion conforms daily+monthly to one schema") {
    val u = SalesSummary.multiGrainUnion(orders)
    assert(u.columns.toSeq === Seq("summary_type", "period", "revenue", "order_count", "unique_customers"))
    val types = u.groupBy("summary_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(types === Map("daily" -> 3L, "monthly" -> 3L))
  }

  test("seededSplit is deterministic for a fixed seed and roughly proportioned") {
    val df = (1 to 10000).toDF("id")
    val s1 = MlFeatures.seededSplit(df, conf).groupBy("data_split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val s2 = MlFeatures.seededSplit(df, conf).groupBy("data_split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s1 === s2)
    assert(s1("train") > 6500 && s1("train") < 7500)
  }

  test("keyedSplit fractions are exact on uniform keys") {
    val df = (0L until 1000L).toDF("k")
    val s = MlFeatures.keyedSplit(df, "k").groupBy("data_split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s === Map("train" -> 700L, "validation" -> 200L, "test" -> 100L))
  }

  test("purged time-series folds embargo the train window before each test block") {
    // one row per day for 100 days -> 5 blocks of 20 days, embargo 10
    val days = (0 until 100).map(i =>
      java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)))
      .toDF("ts")
    val out = MlFeatures.timeSeriesSplits(days, "ts", k = 5, embargoDays = 10)
      .collect().map(r => (r.getAs[Long]("fold"), r.getAs[String]("split")) ->
        (r.getAs[Long]("n"), r.getAs[Long]("first_day"), r.getAs[Long]("last_day"))).toMap
    // every fold tests on its exact 20-day block
    (0L to 4L).foreach { f =>
      assert(out((f, "test")) === (20L, f * 20, f * 20 + 19))
    }
    // fold 0 has nothing to train on; later folds train up to blockStart-11
    assert(!out.contains((0L, "train")))
    (1L to 4L).foreach { f =>
      val (n, first, last) = out((f, "train"))
      assert(first === 0L && last === f * 20 - 11 && n === f * 20 - 10)
    }
  }

  test("purgedKFoldSplits trains on BOTH sides of the test window minus " +
      "the purge (before) and embargo (after) gaps") {
    val days = (0 until 100).map(i =>
      java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)))
      .toDF("ts")
    val out = MlFeatures.purgedKFoldSplits(days, "ts", k = 5,
      purgeDays = 5, embargoDays = 10)
      .collect().map(r => (r.getAs[Long]("fold"), r.getAs[String]("split")) ->
        (r.getAs[Long]("n"), r.getAs[Long]("first_day"), r.getAs[Long]("last_day"))).toMap
    // fold 2 tests days 40-59: train = 0-34 (purge 35-39) + 70-99
    // (embargo 60-69) -> 65 train days spanning 0..99
    assert(out((2L, "test")) === (20L, 40L, 59L))
    assert(out((2L, "train")) === (65L, 0L, 99L))
    // fold 0 (test 0-19): no left side exists, train = 30-99 (embargo 20-29)
    assert(out((0L, "train")) === (70L, 30L, 99L))
    // fold 4 (test 80-99): no right side, train = 0-74 (purge 75-79)
    assert(out((4L, "train")) === (75L, 0L, 74L))
  }

  test("winsorize clips exactly the tail mass and leaves the body untouched") {
    val df = (1 to 1000).map(_.toDouble).toDF("x")
    val out = MlFeatures.winsorize(df, "x", lo = 0.05, hi = 0.95).collect()
    val clipped = out.filter(_.getAs[Boolean]("clipped"))
    // exact percentiles of 1..1000 at 0.05/0.95 are 50.95 / 950.05:
    // values 1..50 and 951..1000 clip — 100 rows
    assert(clipped.length === 100)
    val w = out.map(r => r.getAs[Double]("x") -> r.getAs[Double]("x_w")).toMap
    assert(w(1.0) === 50.95 && w(1000.0) === 950.05)
    assert(w(500.0) === 500.0)
  }

  test("robust scaling centers on the disc median, nulls out MAD = 0, " +
      "and shrugs off an outlier that wrecks the z-score") {
    // 1..9 plus one wild outlier: median = 5 (10 values, disc -> lower
    // middle), deviations sorted = 0,1,1,2,2,3,3,4,4,9995 -> MAD = 2
    val df = ((1 to 9).map(_.toDouble) :+ 10000.0).toDF("x")
    val out = MlFeatures.robustScale(df, "x").collect()
      .map(r => r.getAs[Double]("x") -> r.getAs[java.lang.Double]("x_robust")).toMap
    assert(out(5.0) === 0.0)                       // the median maps to 0
    assert(out(7.0) === 2.0 / (2.0 * 1.4826))      // (7-5)/(MAD*c)
    // the outlier lands ~3370 MADs out - visible, not absorbed into scale
    assert(out(10000.0) > 3000.0)
    // constant column: MAD = 0 -> null, not a divide-by-zero
    val const = MlFeatures.robustScale(Seq.fill(5)(3.0).toDF("x"), "x").collect()
    assert(const.forall(_.getAs[java.lang.Double]("x_robust") == null))
  }

  test("target encoding shrinks rare categories toward the global prior") {
    // category "big": 500 rows at 80% positive; "tiny": 2 rows, both positive
    val df = ((1 to 500).map(i => ("big", if (i <= 400) 1 else 0)) ++
      Seq(("tiny", 1), ("tiny", 1))).toDF("cat", "t")
    val enc = MlFeatures.targetEncode(df, "cat", "t", smoothing = 20.0)
      .collect().map(r => r.getAs[String]("cat") -> r.getAs[Double]("encoded")).toMap
    val prior = 402.0 / 502.0
    // big: plenty of evidence, stays near its raw 0.8
    assert(math.abs(enc("big") - 0.8) < 0.01)
    // tiny: raw rate 1.0 but only 2 rows — shrinks most of the way to prior
    assert(enc("tiny") < prior + 0.05 && enc("tiny") > prior)
    // zero smoothing = raw category means
    val raw = MlFeatures.targetEncode(df, "cat", "t", smoothing = 0.0)
      .collect().map(r => r.getAs[String]("cat") -> r.getAs[Double]("encoded")).toMap
    assert(raw("big") === 0.8 && raw("tiny") === 1.0)
  }
}
