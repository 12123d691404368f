package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("a planted spike is flagged against its trailing baseline") {
    // steady ~100 with mild wiggle, one 10x spike at day 20
    val series = (1 to 30).map { d =>
      (d, if (d == 20) 1000.0 else 100.0 + (d % 3))
    }.toDF("day", "value")
    val out = Drift.zScores(series, "day", "value", trailing = 7, minPoints = 3)
      .collect().map(r => r.getAs[Int]("day") ->
        (r.getAs[Boolean]("is_anomaly"), Option(r.get(r.fieldIndex("z_score"))))).toMap
    assert(out(20)._1)                         // the spike is anomalous
    assert((1 to 30).filter(_ != 20).forall(!out(_)._1)) // nothing else is
    // warm-up rows (fewer than minPoints trailing) carry null z, not false alarms
    assert(out(1)._2.isEmpty && out(2)._2.isEmpty && out(3)._2.isEmpty)
  }

  test("a flat baseline yields null z and no flag (zero variance guarded)") {
    val series = (1 to 10).map(d => (d, 50.0)).toDF("day", "value")
    val out = Drift.zScores(series, "day", "value")
      .collect()
    assert(out.forall(!_.getAs[Boolean]("is_anomaly")))
    assert(out.forall(r => r.isNullAt(r.fieldIndex("z_score"))))
  }

  test("PSI is ~0 for identical distributions and large under a planted shift") {
    val rnd = new scala.util.Random(5)
    val ref = (1 to 2000).map(_ => rnd.nextDouble() * 100).toDF("v")
    def psiOf(cur: org.apache.spark.sql.DataFrame) =
      Drift.psi(ref, cur, "v").agg(org.apache.spark.sql.functions.sum("contrib_micros"))
        .collect().head.getLong(0) / 1e6
    // same-distribution sample: stable (rule of thumb < 0.1)
    val same = (1 to 2000).map(_ => rnd.nextDouble() * 100).toDF("v")
    assert(psiOf(same) < 0.1)
    // shifted +50: mass leaves the low deciles entirely (> 0.25 = shifted)
    val shifted = (1 to 2000).map(_ => rnd.nextDouble() * 100 + 50).toDF("v")
    assert(psiOf(shifted) > 0.25)
  }

  test("PSI keeps empty bins on the spine — a vanished bin is the signal") {
    val ref = (1 to 100).map(_.toDouble).toDF("v")
    val cur = (51 to 100).map(_.toDouble).toDF("v") // bottom half vanished
    val rows = Drift.psi(ref, cur, "v").collect()
      .map(r => r.getAs[Long]("bin") -> (r.getAs[Long]("ref_cnt"), r.getAs[Long]("cur_cnt")))
      .toMap
    assert(rows.size === 10)
    assert((0L to 3L).forall(b => rows(b)._2 === 0L)) // present with zero count
    assert(rows.values.map(_._1).sum === 100L)
    assert(rows.values.map(_._2).sum === 50L)
  }

  test("KS statistic: 0 for identical samples, exact D for a known shift, " +
      "repartition-independent") {
    val ref = (1 to 100).map(_.toDouble).toDF("v")
    def ks(cur: org.apache.spark.sql.DataFrame): Long =
      Drift.ksStatistic(ref, cur, "v").head.getAs[Long]("ks_micros")
    // identical samples: D = 0 exactly
    assert(ks((1 to 100).map(_.toDouble).toDF("v")) === 0L)
    // cur = ref + 50 (uniform shift by half the range): D = 0.5 exactly —
    // F_ref(100) = 1.0 while F_cur(100) = 0.5
    assert(ks((51 to 150).map(_.toDouble).toDF("v")) === 500000L)
    // disjoint supports: D = 1
    assert(ks((1001 to 1100).map(_.toDouble).toDF("v")) === 1000000L)
    // deterministic under repartitioning (exact counts + order-free max)
    val cur = (51 to 150).map(_.toDouble).toDF("v")
    assert(Drift.ksStatistic(ref.repartition(7), cur.repartition(3), "v")
      .head.getAs[Long]("ks_micros") === 500000L)
  }

  test("chi-square: zero for identical proportions; a vanished category " +
      "contributes through its zero side") {
    val ref = (Seq.fill(60)("a") ++ Seq.fill(40)("b")).toDF("cat")
    // same proportions at twice the size: every expected == observed → 0
    val sameMix = (Seq.fill(120)("a") ++ Seq.fill(80)("b")).toDF("cat")
    val zero = Drift.chiSquare(ref, sameMix, "cat").collect()
    assert(zero.length === 2 && zero.forall(_.getAs[Long]("contrib_micros") === 0L))
    // category "b" vanished: both categories light up, b's cur side is 0
    val dropped = Seq.fill(100)("a").toDF("cat")
    val out = Drift.chiSquare(ref, dropped, "cat").collect()
      .map(r => r.getAs[String]("cat") ->
        (r.getAs[Long]("ref_cnt"), r.getAs[Long]("cur_cnt"), r.getAs[Long]("contrib_micros"))).toMap
    assert(out("b")._1 === 40L && out("b")._2 === 0L && out("b")._3 > 0L)
    // hand-check the 2x2 chi-square: totals 100/100, rows a=160 b=40 →
    // e_a = 80, e_b = 20; chi2 = 2·(20²/80) + 2·(20²/20) = 10 + 40 = 50
    assert(out.values.map(_._3).sum === 50000000L)
  }

  test("per-segment KS scores each segment independently, including a " +
      "segment missing from one side") {
    val ref = ((1 to 100).map(v => ("shifted", v.toDouble)) ++
      (1 to 100).map(v => ("same", v.toDouble)) ++
      (1 to 50).map(v => ("ref_only", v.toDouble))).toDF("seg", "v")
    val cur = ((51 to 150).map(v => ("shifted", v.toDouble)) ++
      (1 to 100).map(v => ("same", v.toDouble))).toDF("seg", "v")
    val out = Drift.ksBySegment(ref, cur, "seg", "v").collect()
      .map(r => r.getAs[String]("segment") ->
        ((r.getAs[Long]("ks_micros"), r.getAs[Long]("n_ref"), r.getAs[Long]("n_cur")))).toMap
    assert(out("shifted") === ((500000L, 100L, 100L))) // D = 0.5 exactly
    assert(out("same") === ((0L, 100L, 100L)))
    assert(out("ref_only") === ((1000000L, 50L, 0L)))  // D = 1, side absent
  }

  test("Mann-Whitney U: hand-checked tie case, extremes, null z on " +
      "degenerate variance, repartition-independent") {
    def mwu(ref: Seq[Double], cur: Seq[Double]) =
      Drift.mannWhitneyU(ref.toDF("v"), cur.toDF("v"), "v").head
    // ref=[1,2,2], cur=[2,3]: strict wins 0, ties 2 (two ref-2s x one
    // cur-2) -> U = 0 + 2/2 = 1 -> u2 = 2
    val hand = mwu(Seq(1, 2, 2), Seq(2, 3))
    assert(hand.getAs[Long]("u2") === 2L)
    assert(hand.getAs[Long]("n_ref") === 3L && hand.getAs[Long]("n_cur") === 2L)
    // ref entirely below cur: U = 0; entirely above: U = nr*nc
    assert(mwu((1 to 10).map(_.toDouble), (11 to 20).map(_.toDouble)).getAs[Long]("u2") === 0L)
    assert(mwu((11 to 20).map(_.toDouble), (1 to 10).map(_.toDouble)).getAs[Long]("u2") === 200L)
    // below-median ref drives z negative; symmetric flip mirrors it
    val lo = mwu((1 to 10).map(_.toDouble), (11 to 20).map(_.toDouble)).getAs[Long]("z_micros")
    val hi = mwu((11 to 20).map(_.toDouble), (1 to 10).map(_.toDouble)).getAs[Long]("z_micros")
    assert(lo < 0L && hi > 0L)
    // every observation tied: sigma = 0 -> z is null, u2 still exact
    val tied = mwu(Seq(5, 5, 5), Seq(5, 5))
    assert(tied.getAs[Long]("u2") === 6L && tied.isNullAt(tied.fieldIndex("z_micros")))
    // deterministic under repartitioning
    val a = (1 to 100).map(_.toDouble).toDF("v").repartition(7)
    val b = (51 to 150).map(_.toDouble).toDF("v").repartition(3)
    assert(Drift.mannWhitneyU(a, b, "v").head.getAs[Long]("u2") ===
      Drift.mannWhitneyU((1 to 100).map(_.toDouble).toDF("v"),
        (51 to 150).map(_.toDouble).toDF("v"), "v").head.getAs[Long]("u2"))
  }

  test("JS divergence: zero for identical mixes, ln 2 for disjoint " +
      "supports, per-category contributions nonnegative") {
    val ref = (Seq.fill(60)("a") ++ Seq.fill(40)("b")).toDF("cat")
    // same proportions at twice the size -> p = q everywhere -> all zero
    val same = (Seq.fill(120)("a") ++ Seq.fill(80)("b")).toDF("cat")
    assert(Drift.jsDivergence(ref, same, "cat").collect()
      .forall(_.getAs[Long]("contrib_micros") === 0L))
    // disjoint supports: each side contributes (1/2)ln2 -> total ln 2
    val out = Drift.jsDivergence(Seq.fill(10)("a").toDF("cat"),
        Seq.fill(7)("b").toDF("cat"), "cat").collect()
      .map(r => r.getAs[String]("cat") -> r.getAs[Long]("contrib_micros")).toMap
    assert(out("a") === 346574L && out("b") === 346574L) // floor(.5*ln2*1e6+.5)
    // skewed but overlapping: every per-category term stays >= 0 (scalar JSD)
    val skew = Drift.jsDivergence(ref, (Seq.fill(10)("a") ++ Seq.fill(90)("b")).toDF("cat"), "cat")
      .collect()
    assert(skew.forall(_.getAs[Long]("contrib_micros") >= 0L))
    assert(skew.map(_.getAs[Long]("contrib_micros")).sum > 0L)
  }

  test("empty-side inputs degrade to null statistics instead of raising " +
      "under ANSI") {
    val some = Seq(1.0, 2.0, 3.0).toDF("v")
    val none = Seq.empty[Double].toDF("v")
    val ks = Drift.ksStatistic(some, none, "v").head
    assert(ks.isNullAt(ks.fieldIndex("ks_micros")) && ks.getAs[Long]("n_cur") === 0L)
    // null values are not distribution points: excluded from counts and
    // cumulative order (engines disagree on where NULL sorts)
    val withNulls = Seq[java.lang.Double](1.0, null, 2.0, 3.0, null).toDF("v")
    val ks2 = Drift.ksStatistic(withNulls, some, "v").head
    assert(ks2.getAs[Long]("n_ref") === 3L && ks2.getAs[Long]("ks_micros") === 0L)
    val mwu2 = Drift.mannWhitneyU(withNulls, some, "v").head
    assert(mwu2.getAs[Long]("n_ref") === 3L && mwu2.getAs[Long]("u2") === 9L)
    val cats = Seq("a", "b").toDF("cat")
    val chi = Drift.chiSquare(cats, Seq.empty[String].toDF("cat"), "cat").collect()
    assert(chi.length === 2 &&
      chi.forall(r => r.isNullAt(r.fieldIndex("contrib_micros"))))
  }

  test("CUSUM flags a persistent small shift a per-point z-score never " +
      "trips, stays quiet in-control, and resets per entity") {
    // baseline: alternating 9/11 (mu = 10, sigma ~ 1); after t = 40 the
    // level shifts to 11.4 - a 1.4-sigma shift, far below any 3-sigma
    // per-point rule, but CUSUM accumulates (z - k) ~ 0.9/period
    val series = ((1 to 40).map(t => ("a", t, if (t % 2 == 0) 11.0 else 9.0)) ++
      (41 to 60).map(t => ("a", t, 11.4))).toDF("seg", "t", "v")
    val out = Drift.cusum(series, "t", "v", baseline = 20, k = 0.5, h = 4.0)
      .collect().map(r => r.getAs[Int]("t") ->
        ((Option(r.getAs[java.lang.Double]("cusum_hi")), r.getAs[Boolean]("is_change")))).toMap
    assert(out.size === 60)
    // baseline era: null scores, never flagged
    assert((1 to 20).forall(t => out(t)._1.isEmpty && !out(t)._2))
    // in-control era after baseline: scored but quiet
    assert((21 to 40).forall(t => out(t)._1.nonEmpty && !out(t)._2))
    // the shift accumulates and flags within ~6 periods, then stays up
    val firstFlag = (41 to 60).find(out(_)._2)
    assert(firstFlag.nonEmpty && firstFlag.get <= 47, s"first flag at $firstFlag")
    assert((firstFlag.get to 60).forall(out(_)._2))
    // per-entity isolation: a flat second entity never flags and never
    // sees entity a's state
    val two = series.unionByName(
      (1 to 60).map(t => ("b", t, 5.0)).toDF("seg", "t", "v"))
    val byEnt = Drift.cusum(two, "t", "v", baseline = 20,
        partitionCols = Seq("seg")).collect()
      .groupBy(_.getAs[String]("seg"))
    assert(byEnt("b").forall(!_.getAs[Boolean]("is_change")))       // flat sigma=0: fail closed
    assert(byEnt("a").count(_.getAs[Boolean]("is_change")) ===
      out.values.count(_._2))                                       // a unchanged by b
    // determinism under repartitioning
    val re = Drift.cusum(series.repartition(7), "t", "v", baseline = 20)
      .collect().map(r => r.getAs[Int]("t") -> r.getAs[Boolean]("is_change")).toMap
    assert((1 to 60).forall(t => re(t) === out(t)._2))
  }

  test("EWMA tracks the level inside exact time-varying limits and flags " +
      "the same sustained shift CUSUM catches") {
    val series = ((1 to 40).map(t => ("a", t, if (t % 2 == 0) 11.0 else 9.0)) ++
      (41 to 60).map(t => ("a", t, 11.4))).toDF("seg", "t", "v")
    val out = Drift.ewma(series, "t", "v", baseline = 20, lambda = 0.2)
      .collect().map(r => r.getAs[Int]("t") ->
        ((Option(r.getAs[java.lang.Double]("ewma")), r.getAs[Boolean]("is_change")))).toMap
    // baseline era: null, never flagged
    assert((1 to 20).forall(t => out(t)._1.isEmpty && !out(t)._2))
    // in-control alternation: E hugs 10 well inside even the early
    // narrow limits
    assert((21 to 40).forall(t => !out(t)._2))
    assert((25 to 40).forall(t => math.abs(out(t)._1.get - 10.0) < 0.5))
    // the 1.4-sigma shift pushes E across the asymptotic 3-sigma_E limit
    // (~1.03 above mu) within ~6 periods and keeps it there
    val firstFlag = (41 to 60).find(out(_)._2)
    assert(firstFlag.nonEmpty && firstFlag.get <= 49, s"first flag at $firstFlag")
    assert((firstFlag.get to 60).forall(out(_)._2))
    // deterministic under repartitioning
    val re = Drift.ewma(series.repartition(5), "t", "v", baseline = 20, lambda = 0.2)
      .collect().map(r => r.getAs[Int]("t") -> r.getAs[Boolean]("is_change")).toMap
    assert((1 to 60).forall(t => re(t) === out(t)._2))
  }

  test("Holt follows a steady trend without flagging and catches a level " +
      "break EWMA-style charts would miss or mis-time") {
    // baseline: flat-ish alternation around 10; then a clean +1/period
    // ramp (a trend, NOT an anomaly for Holt); then a sudden -15 break
    val series = ((1 to 20).map(t => ("a", t, if (t % 2 == 0) 11.0 else 9.0)) ++
      (21 to 50).map(t => ("a", t, 10.0 + (t - 20))) ++
      (51 to 55).map(t => ("a", t, 40.0 - 15.0))).toDF("seg", "t", "v")
    val out = Drift.holt(series, "t", "v", baseline = 20)
      .collect().map(r => r.getAs[Int]("t") ->
        ((Option(r.getAs[java.lang.Double]("holt_level")),
          Option(r.getAs[java.lang.Double]("holt_forecast")),
          r.getAs[Boolean]("is_anomaly")))).toMap
    // baseline era: null state, never flagged
    assert((1 to 20).forall(t => out(t)._1.isEmpty && !out(t)._3))
    // once the trend state locks on (a few periods), the ramp is NORMAL:
    // forecast tracks within sigma and no flags fire late in the ramp
    assert((30 to 50).forall(t => !out(t)._3), "steady ramp must not flag")
    assert((40 to 50).forall(t => math.abs(out(t)._2.get - (10.0 + (t - 20))) < 2.0))
    // trend state approaches +1/period
    val trendAt50 = Drift.holt(series, "t", "v", baseline = 20)
      .filter(col("t") === 50).collect().head.getAs[Double]("holt_trend")
    assert(math.abs(trendAt50 - 1.0) < 0.3, s"trend $trendAt50")
    // the break versus the extrapolated path flags immediately
    assert(out(51)._3, "level break must flag against the trend forecast")
    // deterministic under repartitioning
    val re = Drift.holt(series.repartition(5), "t", "v", baseline = 20)
      .collect().map(r => r.getAs[Int]("t") -> r.getAs[Boolean]("is_anomaly")).toMap
    assert((1 to 55).forall(t => re(t) === out(t)._3))
  }

  test("partitioned monitoring scores each entity against its own history") {
    // segment a runs at 100, segment b runs at 10000: a value of 1000 is a
    // spike for a and a dip for b — both must flag within their own series
    val series = ((1 to 20).map(d => ("a", d, if (d == 15) 1000.0 else 100.0 + d % 2)) ++
      (1 to 20).map(d => ("b", d, if (d == 15) 1000.0 else 10000.0 + d % 2)))
      .toDF("seg", "day", "value")
    val out = Drift.zScores(series, "day", "value", partitionCols = Seq("seg"))
      .filter(col("is_anomaly")).collect()
      .map(r => (r.getAs[String]("seg"), r.getAs[Int]("day"))).toSet
    assert(out === Set(("a", 15), ("b", 15)))
  }

  test("seasonal decomposition recovers a planted weekly pattern exactly") {
    import java.time.LocalDate
    // value = 7_000_000 base + weekday bump: +600_000 on slot 0, -100_000
    // on the other six (zero-mean weekly pattern, constant trend)
    val start = LocalDate.parse("2024-01-01")
    val series = (0 until 28).map { d =>
      val bump = if (d % 7 == 0) 600000L else -100000L
      (java.sql.Date.valueOf(start.plusDays(d)), 7000000L + bump)
    }.toDF("day", "v_micros")
    val out = Drift.seasonalDecompose(series, "day", "v_micros").collect()
      .map(r => r.getAs[java.sql.Date]("day").toString ->
        ((r.getAs[Long]("trend_micros"), r.getAs[Long]("seasonal_micros"),
          r.getAs[Long]("residual_micros")))).toMap
    // edges drop: 28 days - 3 head - 3 tail
    assert(out.size === 22)
    // the 7-day MA of a zero-mean weekly pattern is the flat base exactly
    assert(out.values.forall(_._1 === 7000000L))
    // seasonal index reproduces the planted bumps; residuals vanish
    assert(out("2024-01-08")._2 === 600000L)
    assert(out("2024-01-09")._2 === -100000L)
    assert(out.values.forall(_._3 === 0L))
    // value = trend + seasonal + residual identically
    val rows = Drift.seasonalDecompose(series, "day", "v_micros")
      .withColumn("_recon",
        col("trend_micros") + col("seasonal_micros") + col("residual_micros"))
      .filter(col("_recon") =!= col("v_micros")).count()
    assert(rows === 0L)
  }

  test("spearmanRho: monotone 1, reversed -1, hand-computed tie case, constant-side null") {
    import spark.implicits._
    def rho(rows: Seq[(Long, Long)]) = Drift.spearmanRho(
      rows.toDF("x", "y"), "x", "y").collect().head
    assert(rho(Seq((1L, 10L), (2L, 20L), (3L, 30L))).getAs[Double]("rho") === 1.0d)
    assert(rho(Seq((1L, 30L), (2L, 20L), (3L, 10L))).getAs[Double]("rho") === -1.0d)
    // ties: x = (1,1,2) -> rank2 (3,3,6); y distinct -> (2,4,6);
    // rho = 18 / sqrt(18 * 24) = sqrt(3)/2
    val t = rho(Seq((1L, 5L), (1L, 7L), (2L, 9L)))
    assert(t.getAs[Long]("n") === 3L)
    assert(t.getAs[Double]("rho") === 18.0d / math.sqrt(18.0d * 24.0d))
    // a constant column has zero rank variance -> rho undefined (null)
    val c = rho(Seq((4L, 1L), (4L, 2L), (4L, 3L)))
    assert(c.isNullAt(c.fieldIndex("rho")))
    // exact integer lattice: invariant under repartitioning
    val df = (1L to 200L).map(i => (i % 17, (i * 31) % 23)).toDF("x", "y")
    val a = Drift.spearmanRho(df, "x", "y").collect().head.getAs[Double]("rho")
    val b = Drift.spearmanRho(df.repartition(13), "x", "y")
      .collect().head.getAs[Double]("rho")
    assert(a === b)
  }
}
