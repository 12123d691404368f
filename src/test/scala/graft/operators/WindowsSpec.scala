package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WindowsSpec extends SparkSpec {
  import spark.implicits._

  test("movingStats computes trailing average, lag delta and cumulative sum") {
    val df = Seq(("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 30.0), ("b", 1, 5.0))
      .toDF("k", "t", "v")
      .withColumn("v", col("v").cast("decimal(18,2)"))
    val out = Windows.movingStats(df, Seq("k"), "t", "v", 2).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r).toMap
    assert(out(("a", 1)).getAs[Double]("v_ma") === 10.0)
    assert(out(("a", 3)).getAs[Double]("v_ma") === 25.0) // (20+30)/2
    assert(out(("a", 3)).getAs[java.math.BigDecimal]("v_delta").doubleValue === 10.0)
    assert(out(("a", 1)).getAs[java.math.BigDecimal]("v_delta").doubleValue === 0.0) // first row
    assert(out(("a", 3)).getAs[java.math.BigDecimal]("v_cum").doubleValue === 60.0)
    assert(out(("b", 1)).getAs[java.math.BigDecimal]("v_cum").doubleValue === 5.0)
  }

  test("sessionize splits on gaps and numbers sessions per key") {
    val df = Seq(
      (1L, "2024-01-01 10:00:00", 100L), (1L, "2024-01-01 10:10:00", 101L),
      (1L, "2024-01-01 12:00:00", 102L), // > 30 min gap -> new session
      (2L, "2024-01-01 09:00:00", 103L)
    ).toDF("user_id", "ts", "event_id")
      .withColumn("ts", col("ts").cast("timestamp"))
    val out = Windows.sessionize(df, "user_id", "ts", 1800, Seq("event_id"))
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("session_seq")).toMap
    assert(out === Map(100L -> 1L, 101L -> 1L, 102L -> 2L, 103L -> 1L))
  }

  test("sessionStats aggregates per session") {
    val df = Seq(
      (1L, "2024-01-01 10:00:00", 1.0), (1L, "2024-01-01 10:10:00", 2.0),
      (1L, "2024-01-01 12:00:00", 4.0))
      .toDF("user_id", "ts", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
      .withColumn("event_id", col("value").cast("long"))
    val sessions = Windows.sessionStats(
      Windows.sessionize(df, "user_id", "ts", 1800, Seq("event_id")),
      "user_id", "ts", "value")
    val byId = sessions.collect().map(r => r.getAs[Long]("session_seq") -> r).toMap
    assert(byId(1L).getAs[Long]("events") === 2L)
    assert(byId(1L).getAs[java.math.BigDecimal]("session_value").doubleValue === 3.0)
    assert(byId(2L).getAs[Long]("events") === 1L)
  }

  test("gapFillDaily surfaces missing days as explicit zero rows over the full spine") {
    val all = Seq(
      ("2024-01-01 09:00:00", 1.0), ("2024-01-04 09:00:00", 1.0))
      .toDF("ts", "value").withColumn("ts", col("ts").cast("timestamp"))
    val metric = all.filter(col("value") > 0) // same frame; spine from `all`
    val out = Windows.gapFillDaily(metric, all, "ts", "value").collect()
      .map(r => r.getAs[java.sql.Date]("d").toString ->
        ((r.getAs[java.math.BigDecimal]("revenue").doubleValue, r.getAs[Long]("n_events"))))
      .toMap
    assert(out.size === 4) // full 01-01..01-04 spine
    assert(out("2024-01-01") === ((1.0, 1L)))
    assert(out("2024-01-02") === ((0.0, 0L))) // gap day materialized
    assert(out("2024-01-03") === ((0.0, 0L)))
    assert(out("2024-01-04") === ((1.0, 1L)))
  }

  test("sessionWindowStats: boundary event merges; past the gap starts a new session") {
    val df = Seq(
      (1L, "2024-01-01 10:00:00", 1.0),
      (1L, "2024-01-01 10:29:59", 2.0),  // inside the gap -> same session
      (1L, "2024-01-01 10:59:59", 4.0),  // exactly 30 min later -> still merges
      (1L, "2024-01-01 11:30:00", 16.0), // 1 us past the gap -> NEW session
      (2L, "2024-01-01 10:00:00", 8.0))
      .toDF("user_id", "ts", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
    val out = Windows.sessionWindowStats(df, "user_id", "ts", "value", "30 minutes")
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Timestamp]("session_start").toString) ->
        ((r.getAs[Long]("events"), r.getAs[java.math.BigDecimal]("session_value").doubleValue)))
      .toMap
    assert(out.size === 3)
    assert(out((1L, "2024-01-01 10:00:00.0")) === ((3L, 7.0)))
    assert(out((1L, "2024-01-01 11:30:00.0")) === ((1L, 16.0)))
    assert(out((2L, "2024-01-01 10:00:00.0")) === ((1L, 8.0)))
  }

  test("embeddingNearDups finds planted high-cosine pair only") {
    import graft.dedup.Dedup
    val rnd = new scala.util.Random(13)
    val base = (0L until 30L).map(i => i -> Seq.fill(16)(rnd.nextGaussian().toFloat))
    val planted = 30L -> base.head._2.map(x => x * 1.01f)
    val df = (base :+ planted).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDups(df, "vec_id", 0.95).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((0L, 30L)))
  }
}
