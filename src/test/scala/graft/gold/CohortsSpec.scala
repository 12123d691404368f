package graft.gold

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CohortsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events = Seq(
    // user 1: joins day 1, active days 1 and 2, clicks then purchases
    (1L, "2024-01-01 10:00:00", "click", 1.0),
    (1L, "2024-01-02 10:00:00", "purchase", 5.0),
    // user 2: joins day 1, never returns, clicks only
    (2L, "2024-01-01 11:00:00", "click", 1.0),
    // user 3: joins day 2, purchases BEFORE ever clicking -> not converted
    (3L, "2024-01-02 09:00:00", "purchase", 9.0),
    (3L, "2024-01-02 12:00:00", "click", 1.0)
  ).toDF("user_id", "ts", "event_type", "value")
    .withColumn("ts", col("ts").cast("timestamp"))

  test("cohortRetention buckets users by first-seen period and counts activity") {
    val m = Cohorts.cohortRetention(events).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("users")).toMap
    assert(m(("2024-01-01", "2024-01-01")) === 2L) // users 1 and 2 on day 1
    assert(m(("2024-01-01", "2024-01-02")) === 1L) // only user 1 retained
    assert(m(("2024-01-02", "2024-01-02")) === 1L) // user 3's own cohort
    assert(m.size === 3)
  }

  test("funnel counts ordered click->purchase conversion only") {
    val r = Cohorts.funnel(events, "click", "purchase").head()
    assert(r.getAs[Long]("users") === 3L)
    assert(r.getAs[Long]("stepa_users") === 3L)       // all three clicked
    assert(r.getAs[Long]("converted_users") === 1L)   // only user 1 in order
    assert(math.abs(r.getAs[Double]("conversion_rate") - 0.333333) < 1e-9)
  }

  test("funnelWindowed bounds the conversion window, inclusive at the edge") {
    // user 1's purchase is exactly 24h after the first click
    val day = Cohorts.funnelWindowed(events, "click", "purchase", 86400L).head()
    assert(day.getAs[Long]("converted_users") === 1L)  // edge is inclusive
    val hour = Cohorts.funnelWindowed(events, "click", "purchase", 3600L).head()
    assert(hour.getAs[Long]("converted_users") === 0L) // 24h > 1h window
    assert(hour.getAs[Long]("stepa_users") === 3L)     // step-A unchanged
  }

  test("transitionMatrix counts consecutive pairs per user with exact shares") {
    val ev = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"),   // a->b, b->a
      (2L, 4L, "a"), (2L, 5L, "b"),                  // a->b
      (3L, 6L, "b")                                  // lone event: no pair
    ).map { case (u, i, t) => (u, i, f"2024-01-01 00:00:$i%02d", t) }
      .toDF("user_id", "event_id", "ts", "event_type")
      .withColumn("ts", col("ts").cast("timestamp"))
    val m = Cohorts.transitionMatrix(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("total_from"), r.getAs[Double]("p"))))
      .toMap
    assert(m === Map(
      ("a", "b") -> ((2L, 2L, 1.0)),
      ("b", "a") -> ((1L, 1L, 1.0))))
    // determinism under repartitioning (the (ts, id) tiebreak is total)
    val m2 = Cohorts.transitionMatrix(ev.repartition(5)).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n")).toMap
    assert(m2 === m.view.mapValues(_._1).toMap)
  }

  test("funnelSteps chains earliest-reach order across k steps; " +
      "out-of-order completions do not count") {
    val ev = Seq(
      // user 1 completes view -> click -> purchase in order
      (1L, "2024-01-01 09:00:00", "view", 0.0),
      (1L, "2024-01-01 10:00:00", "click", 0.0),
      (1L, "2024-01-01 11:00:00", "purchase", 5.0),
      // user 2: clicks BEFORE viewing — click must not count; then views
      (2L, "2024-01-01 08:00:00", "click", 0.0),
      (2L, "2024-01-01 09:00:00", "view", 0.0),
      // user 3: view and click, purchase precedes the click -> depth 2
      (3L, "2024-01-01 09:00:00", "view", 0.0),
      (3L, "2024-01-01 09:30:00", "purchase", 2.0),
      (3L, "2024-01-01 10:00:00", "click", 0.0),
      // user 4: never views -> depth 0 (absent from every step)
      (4L, "2024-01-01 10:00:00", "click", 0.0))
      .toDF("user_id", "ts", "event_type", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
    val out = Cohorts.funnelSteps(ev, Seq("view", "click", "purchase"))
      .collect().map(r => r.getAs[Int]("step_idx") ->
        ((r.getAs[String]("step_type"), r.getAs[Long]("users"),
          r.getAs[Double]("conv_from_prev"), r.getAs[Double]("conv_from_first"))))
      .toMap
    assert(out(1) === (("view", 3L, 1.0, 1.0)))       // users 1, 2, 3
    assert(out(2) === (("click", 2L, 0.666667, 0.666667))) // 1, 3 (2's click too early)
    assert(out(3) === (("purchase", 1L, 0.5, 0.333333)))   // only user 1 in order
  }
}
