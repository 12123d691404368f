package graft.gold

import graft.SparkSpec

class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  test("kaplanMeier matches the hand-computed product estimator with censoring") {
    // subjects: event at t=1; censored at t=2; two events at t=3;
    // censored at t=4. Steps only at t=1 and t=3.
    val df = Seq((1L, 1), (2L, 0), (3L, 1), (3L, 1), (4L, 0))
      .toDF("dur", "ev")
    val out = Survival.kaplanMeier(df, "dur", "ev").collect()
      .map(r => r.getAs[Long]("t") ->
        ((r.getAs[Long]("d"), r.getAs[Long]("n_risk"), r.getAs[Double]("survival"))))
      .toMap
    assert(out.keySet === Set(1L, 3L))
    // t=1: 5 at risk, 1 event -> S = 4/5
    assert(out(1L)._1 === 1L && out(1L)._2 === 5L)
    assert(math.abs(out(1L)._3 - 0.8) < 1e-4)
    // t=3: the t=2 censoring left the risk set WITHOUT a survival step;
    // 3 at risk, 2 events -> S = 0.8 * 1/3
    assert(out(3L)._1 === 2L && out(3L)._2 === 3L)
    assert(math.abs(out(3L)._3 - 0.8 / 3.0) < 1e-3)
    // survival is monotone non-increasing
    assert(out(1L)._3 >= out(3L)._3)
  }

  test("nelsonAalen accumulates exact d/n hazard steps over the same risk sets") {
    val df = Seq((1L, 1), (2L, 0), (3L, 1), (3L, 1), (4L, 0))
      .toDF("dur", "ev")
    val out = Survival.nelsonAalen(df, "dur", "ev").collect()
      .map(r => r.getAs[Long]("t") ->
        ((r.getAs[Long]("n_risk"), r.getAs[Long]("cum_hazard_micros")))).toMap
    // t=1: 1/5 = 200000 micros; t=3: + 2/3 = 666667 -> 866667
    assert(out === Map(1L -> ((5L, 200000L)), 3L -> ((3L, 866667L))))
    // hazard is monotone non-decreasing by construction
    assert(out(3L)._2 > out(1L)._2)
  }

  test("kaplanMeier drives survival to exact 0 when a step exhausts the " +
      "risk set, and censoring-only input yields no steps") {
    val dead = Survival.kaplanMeier(
      Seq((5L, 1), (5L, 1)).toDF("dur", "ev"), "dur", "ev").collect()
    assert(dead.length === 1)
    assert(dead.head.getAs[Double]("survival") === 0.0)
    val censOnly = Survival.kaplanMeier(
      Seq((1L, 0), (2L, 0)).toDF("dur", "ev"), "dur", "ev")
    assert(censOnly.count() === 0L)
  }

  test("null durations are excluded from the risk set in both estimators") {
    // A NULL duration is an undefined lifetime: kept, it would form a
    // t=NULL group whose window placement differs between engines (Spark
    // sorts NULLs first, DuckDB last), skewing every cumulative n_risk.
    val df = Seq((Option(1L), 1), (Option.empty[Long], 1), (Option(3L), 1))
      .toDF("dur", "ev")
    val km = Survival.kaplanMeier(df, "dur", "ev").collect()
      .map(r => r.getAs[Long]("t") -> r.getAs[Long]("n_risk")).toMap
    // risk set is 2 (not 3): the null row neither counts at risk nor events
    assert(km === Map(1L -> 2L, 3L -> 1L))
    val na = Survival.nelsonAalen(df, "dur", "ev").collect()
      .map(r => r.getAs[Long]("t") -> r.getAs[Long]("n_risk")).toMap
    assert(na === Map(1L -> 2L, 3L -> 1L))
  }
}
