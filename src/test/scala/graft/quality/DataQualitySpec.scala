package graft.quality

import graft.SparkSpec
import graft.core.GraftConf
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  // Seeded fixture with injected nulls and duplicates (mirrors the
  // reference's conftest fixtures: 5% nulls, explicit dup rows).
  private lazy val df = Seq(
    (1, Some("a@x.com"), Some(10.0)),
    (2, None, Some(20.0)),
    (3, Some("c@y.org"), None),
    (3, Some("c@y.org"), None), // duplicate id 3
    (4, Some("d@z.io"), Some(999.0))
  ).toDF("id", "email", "amount")

  test("nullCheck counts per-column nulls in one pass") {
    val res = DataQuality.nullCheck(df, Seq("id", "email", "amount")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(res("id") === ((0L, 0.0)))
    assert(res("email")._1 === 1L)
    assert(res("amount")._1 === 2L)
    assert(res("amount")._2 === 40.0)
  }

  test("duplicateCheck counts all members of dup groups (keep=False semantics)") {
    val r = DataQuality.duplicateCheck(df, Seq("id")).collect().head
    assert(r.getAs[Long]("duplicate_rows") === 2L)
    assert(r.getAs[Long]("duplicate_groups") === 1L)
  }

  test("rangeCheck flags min/max and allowed-value violations") {
    val res = DataQuality.rangeCheck(df, Seq(
      DataQuality.RangeRule("amount", min = Some(0), max = Some(100)),
      DataQuality.RangeRule("email", allowed = Some(Seq("a@x.com", "c@y.org"))))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(res("amount") === 1L) // 999 out of range; nulls don't violate
    assert(res("email") === 1L)  // d@z.io not allowed; null not counted
  }

  test("freshness measures age against injected as-of, never wall clock") {
    val events = Seq(java.sql.Timestamp.valueOf("2024-01-31 12:00:00"))
      .toDF("ts")
    val conf = GraftConf(asOfDate = java.time.LocalDate.parse("2024-02-01"))
    val r = DataQuality.freshness(events, "ts", conf).collect().head
    assert(r.getAs[Long]("age_seconds") === 12L * 3600)
    assert(r.getAs[Long]("age_hours") === 12L)
  }

  test("iqrOutliers flags values beyond 1.5*IQR with exact percentiles") {
    val vals = (1 to 100).map(_.toDouble) :+ 1000.0 // one clear outlier
    val d = vals.toDF("x")
    val r = DataQuality.iqrOutliers(d, Seq("x")).collect().head
    assert(r.getAs[Long]("outliers") === 1L)
    assert(r.getAs[Long]("total") === 101L)
  }

  test("schemaCompliance reports missing, extra, and mismatched columns") {
    val expected = StructType(Seq(
      StructField("id", IntegerType), StructField("email", StringType),
      StructField("score", DoubleType)))
    val actual = StructType(Seq(
      StructField("id", LongType), StructField("email", StringType),
      StructField("extra_col", StringType)))
    val rep = DataQuality.schemaCompliance(actual, expected)
    assert(rep.missing === Seq("score"))
    assert(rep.typeMismatch === Seq("id"))
    assert(rep.extra === Seq("extra_col"))
    assert(math.abs(rep.score - 100.0 / 3) < 1e-9)
  }

  test("quarantine splits rows by predicate including null predicate rows") {
    val split = DataQuality.quarantine(df, col("amount").isNotNull && col("amount") < 100)
    assert(split.clean.count() === 2)
    assert(split.quarantined.count() === 3) // two null-amount rows + 999
  }

  test("kAnonymityReport flags small groups AND sensitive-unanimous groups") {
    import spark.implicits._
    val people = Seq(
      // group (30, "a"): 3 members but only ONE sensitive value -> l fails
      (30, "a", 100L), (30, "a", 100L), (30, "a", 100L),
      // group (30, "b"): 3 members, 3 distinct sensitive values -> safe
      (30, "b", 100L), (30, "b", 200L), (30, "b", 300L),
      // group (40, "a"): singleton -> k fails (and l fails)
      (40, "a", 100L))
      .toDF("age", "zip", "salary")
    val out = DataQuality.kAnonymityReport(people, Seq("age", "zip"),
        col("salary"), k = 2L, l = 2L)
      .collect().map(r => (r.getInt(0), r.getString(1)) ->
        ((r.getAs[Long]("group_n"), r.getAs[Long]("l_diversity"),
          r.getAs[Boolean]("at_risk")))).toMap
    assert(out((30, "a")) === ((3L, 1L, true)))  // unanimity leak
    assert(out((30, "b")) === ((3L, 3L, false)))
    assert(out((40, "a")) === ((1L, 1L, true)))  // re-identifiable
  }

  test("Wilson lower bound: small perfect groups stop outranking large near-perfect ones") {
    val rows = (Seq.fill(3)(("tiny", true)) ++
      Seq.fill(480)(("big", true)) ++ Seq.fill(20)(("big", false))).toDF("src", "ok")
    val out = DataQuality.wilsonTrust(rows, "src", col("ok")).collect()
      .map(r => r.getAs[String]("src") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("k"), r.getAs[Double]("wilson_lb")))).toMap
    assert(out("tiny") === ((3L, 3L, out("tiny")._3)))
    assert(out("big")._1 === 500L && out("big")._2 === 480L)
    // raw rates: tiny 1.0 > big 0.96 — the bound must invert that
    assert(out("big")._3 > out("tiny")._3)
    // bound stays below the point estimate and above zero
    assert(out("big")._3 < 0.96 && out("big")._3 > 0.9)
    assert(out("tiny")._3 < 1.0 && out("tiny")._3 > 0.0)
  }

  test("Benford screen: digit spine complete, expected shares sum to ~1, " +
      "a Benford-conforming sample shows small deviation") {
    // sample 9 values per expected-millionths weight via repetition:
    // value d*1000 appears round(P(d)*100) times
    val rows = DataQuality.benfordExpectedMicros.toSeq.flatMap { case (d, m) =>
      Seq.fill(math.round(m / 10000.0).toInt)(d * 1000.0)
    }.toDF("v")
    val out = DataQuality.benfordCheck(rows, "v").collect()
      .map(r => r.getAs[Long]("digit") ->
        ((r.getAs[Long]("obs"), r.getAs[Long]("expected_micros"),
          r.getAs[Long]("dev_micros")))).toMap
    assert(out.keySet === (1L to 9L).toSet)
    assert(DataQuality.benfordExpectedMicros.values.sum === 1000000L)
    // ~1% granularity sampling: every digit within 1.1% of expectation
    assert(out.values.forall(_._3 < 11000L), s"$out")
    // non-positive and sub-1 values are excluded; absent digits keep 0 rows
    val skew = Seq(0.0, -5.0, 0.4, 900.0, 950.0).toDF("v")
    val sk = DataQuality.benfordCheck(skew, "v").collect()
      .map(r => r.getAs[Long]("digit") -> r.getAs[Long]("obs")).toMap
    assert(sk(9L) === 2L && (1L to 8L).forall(sk(_) === 0L))
  }

  test("tClosenessReport: hand-computed total variation, absent-value cells included") {
    import spark.implicits._
    def tv(rows: Seq[(String, Long)], t: Long) =
      DataQuality.tClosenessReport(rows.toDF("g", "v"), Seq("g"), col("v"), t)
        .collect()
        .map(r => r.getString(0) -> (r.getAs[Long]("group_n"),
          r.getAs[Long]("tv_micros"), r.getAs[Boolean]("t_close")))
        .toMap
    // global p(1)=750000, p(2)=250000; A half-half, B unanimous on 1:
    // both sit at TV 250000
    val sym = Seq(("A", 1L), ("A", 1L), ("A", 2L), ("A", 2L),
      ("B", 1L), ("B", 1L), ("B", 1L), ("B", 1L))
    assert(tv(sym, 300000L) ===
      Map("A" -> (4L, 250000L, true), "B" -> (4L, 250000L, true)))
    assert(tv(sym, 200000L)("B")._3 === false)
    // a value a group never sees still contributes |0 - p_v|: A never has
    // 3, B never has 1 or 2 -> both TVs are exactly 500000
    val disjoint = Seq(("A", 1L), ("A", 2L), ("B", 3L), ("B", 3L))
    assert(tv(disjoint, 1000000L) ===
      Map("A" -> (2L, 500000L, true), "B" -> (2L, 500000L, true)))
    // odd micro-sums: floors round once per share, the halving once more
    val odd = Seq(("A", 1L), ("A", 1L), ("A", 2L), ("B", 2L))
    assert(tv(odd, 1000000L) ===
      Map("A" -> (3L, 166666L, true), "B" -> (1L, 500000L, true)))
  }
}
