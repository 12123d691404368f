package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  // quotes (right): user A priced at t=10 and t=50; user B priced at t=20
  private lazy val quotes = Seq(
    ("A", 10L, 1.0), ("A", 50L, 2.0), ("B", 20L, 9.0)
  ).toDF("user", "t", "price")

  // trades (left): before any quote, between quotes, exactly on a quote,
  // after the last quote, and a user with no quotes at all
  private lazy val trades = Seq(
    ("A", 5L, "t0"), ("A", 30L, "t1"), ("A", 50L, "t2"), ("A", 99L, "t3"),
    ("B", 19L, "t4"), ("C", 40L, "t5")
  ).toDF("user", "t", "trade_id")

  test("backward as-of picks the latest right row at-or-before each left row") {
    val out = AsOfJoin.asOfBackward(trades, quotes, "user", "t")
      .collect().map(r => r.getAs[String]("trade_id") ->
        ((Option(r.getAs[java.lang.Long]("asof_ts")).map(_.toLong),
          Option(r.getAs[java.lang.Double]("asof_price")).map(_.toDouble)))).toMap
    assert(out("t0") === ((None, None)))              // before any quote
    assert(out("t1") === ((Some(10L), Some(1.0))))    // between quotes
    assert(out("t2") === ((Some(50L), Some(2.0))))    // equal ts: inclusive
    assert(out("t3") === ((Some(50L), Some(2.0))))    // after last quote
    assert(out("t4") === ((None, None)))              // quote arrives later
    assert(out("t5") === ((None, None)))              // key never quoted
  }

  test("every left row survives exactly once and left columns are untouched") {
    val out = AsOfJoin.asOfBackward(trades, quotes, "user", "t")
    assert(out.count() === trades.count())
    assert(out.select("user", "t", "trade_id").collect().toSet ===
      trades.collect().toSet)
  }

  test("matched columns come from one right row even when a field is null") {
    val q = Seq(("A", 10L, Some(1.0)), ("A", 20L, None: Option[Double]))
      .toDF("user", "t", "price")
    val l = Seq(("A", 30L, "x")).toDF("user", "t", "trade_id")
    val row = AsOfJoin.asOfBackward(l, q, "user", "t").head()
    assert(row.getAs[Long]("asof_ts") === 20L)  // latest row wins...
    assert(row.isNullAt(row.fieldIndex("asof_price"))) // ...with ITS null field
  }

  test("plan shuffles once on the key — no range-join pair explosion") {
    val plan = AsOfJoin.asOfBackward(trades, quotes, "user", "t")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }
}
