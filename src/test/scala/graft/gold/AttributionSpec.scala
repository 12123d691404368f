package graft.gold

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, String, String, Double)*) =
    rows.toSeq.toDF("user_id", "event_id", "ts", "event_type", "value")
      .withColumn("ts", col("ts").cast("timestamp"))

  test("linear splits value equally across in-window touches with exact " +
      "integer micros; out-of-window and post-conversion touches get nothing") {
    val events = ev(
      (1L, 1L, "2024-01-01 00:00:00", "click", 0.0),    // 10h before: in window
      (1L, 2L, "2024-01-01 09:00:00", "click", 0.0),    // 1h before: in window
      (1L, 3L, "2024-01-01 10:00:01", "click", 0.0),    // after conv: excluded
      (1L, 4L, "2024-01-01 10:00:00", "purchase", 10.0),
      (2L, 5L, "2024-01-05 00:00:00", "click", 0.0),    // other user, far away
      (2L, 6L, "2024-01-09 00:00:00", "purchase", 7.0)) // > 24h after the click
    val out = Attribution.linear(events, "purchase", "click", 86400L)
      .collect().map(r => r.getAs[Long]("touch_id") ->
        ((r.getAs[Long]("n_conversions"), r.getAs[Long]("credit_micros")))).toMap
    // 10.0 split across touches 1 and 2 -> 5.0 each; 3 and 5 uncredited
    assert(out === Map(1L -> ((1L, 5000000L)), 2L -> ((1L, 5000000L))))
  }

  test("integer division leaves the sub-touch remainder unattributed, " +
      "and credits accumulate across conversions") {
    val events = ev(
      (1L, 1L, "2024-01-01 01:00:00", "click", 0.0),
      (1L, 2L, "2024-01-01 02:00:00", "click", 0.0),
      (1L, 3L, "2024-01-01 03:00:00", "click", 0.0),
      (1L, 4L, "2024-01-01 04:00:00", "purchase", 10.0), // 3 touches: 10/3
      (1L, 5L, "2024-01-01 05:00:00", "purchase", 3.0))  // same 3 touches: 1.0 each
    val out = Attribution.linear(events, "purchase", "click", 86400L)
      .collect().map(r => r.getAs[Long]("touch_id") -> r.getAs[Long]("credit_micros"))
      .toMap
    // 10_000_000 div 3 = 3_333_333 plus 1_000_000 from the second purchase
    assert(out === Map(1L -> 4333333L, 2L -> 4333333L, 3L -> 4333333L))
    // remainder: 1 micro per first-purchase touchless... exactly 1 micro total
    assert(out.values.sum === 13000000L - 1L)
  }

  test("deterministic under repartitioning; empty when nothing converts") {
    val rnd = new scala.util.Random(5)
    val events = ev((0 until 120).map { i =>
      (rnd.nextInt(6).toLong, i.toLong,
        f"2024-01-0${1 + i % 5}%d ${i % 24}%02d:00:00",
        if (i % 4 == 0) "purchase" else "click", rnd.nextInt(100) / 10.0)
    }: _*)
    val a = Attribution.linear(events, "purchase", "click", 86400L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val b = Attribution.linear(events.repartition(7), "purchase", "click", 86400L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(a === b && a.nonEmpty)
    assert(Attribution.linear(events.filter(col("event_type") =!= "purchase"),
      "purchase", "click", 86400L).count() === 0L)
  }

  test("refunds (negative values) truncate toward zero — the division " +
      "semantics Spark div and DuckDB // share") {
    val events = ev(
      (1L, 1L, "2024-01-01 01:00:00", "click", 0.0),
      (1L, 2L, "2024-01-01 02:00:00", "click", 0.0),
      (1L, 3L, "2024-01-01 03:00:00", "click", 0.0),
      (1L, 4L, "2024-01-01 04:00:00", "purchase", -10.0))
    val out = Attribution.linear(events, "purchase", "click", 86400L)
      .collect().map(r => r.getAs[Long]("touch_id") -> r.getAs[Long]("credit_micros"))
      .toMap
    // floor(-10.0*1e6 + 0.5) = -10_000_000; -10_000_000 div 3 =
    // -3_333_333 — TRUNCATING division, the semantics Spark `div` and
    // DuckDB 1.0 `//` share (both truncate toward zero on refunds)
    assert(out === Map(1L -> -3333333L, 2L -> -3333333L, 3L -> -3333333L))
  }

  test("time-decay halves a touch's share per half-life, exact power-of-two weights") {
    // touches at ages 0h, 1h, 2h with a 1h half-life: weights 4, 2, 1
    val events = ev(
      (1L, 1L, "2024-01-01 08:00:00", "click", 0.0),    // age 2h -> w=1
      (1L, 2L, "2024-01-01 09:00:00", "click", 0.0),    // age 1h -> w=2
      (1L, 3L, "2024-01-01 10:00:00", "click", 0.0),    // age 0h -> w=4
      (1L, 4L, "2024-01-01 10:00:00", "purchase", 7.0))
    val out = Attribution.timeDecay(events, "purchase", "click",
      lookbackSec = 86400L, halflifeSec = 3600L)
      .collect().map(r => r.getAs[Long]("touch_id") -> r.getAs[Long]("credit_micros"))
      .toMap
    // 7_000_000 * w / 7: exactly 1_000_000 per weight unit
    assert(out === Map(1L -> 1000000L, 2L -> 2000000L, 3L -> 4000000L))
    // equal ages inside one bucket degenerate to the linear split
    val flat = ev(
      (1L, 1L, "2024-01-01 09:59:00", "click", 0.0),
      (1L, 2L, "2024-01-01 09:58:00", "click", 0.0),
      (1L, 3L, "2024-01-01 10:00:00", "purchase", 10.0))
    val f = Attribution.timeDecay(flat, "purchase", "click", 86400L, 3600L)
      .collect().map(r => r.getAs[Long]("touch_id") -> r.getAs[Long]("credit_micros"))
      .toMap
    assert(f === Map(1L -> 5000000L, 2L -> 5000000L))
  }
}
