package graft.etl

import graft.SparkSpec
import graft.core.GraftConf
import org.apache.spark.sql.functions._

class SilverOrdersSpec extends SparkSpec {
  import spark.implicits._

  private val conf = GraftConf(asOfDate = java.time.LocalDate.parse("2002-01-01"))

  private lazy val orders = Seq(
    (1L, 10L, "O", 100000.0, "1999-06-15", "1-URGENT"),
    (2L, 11L, "f", 300000.0, "2000-01-01", "3-MEDIUM"),
    (3L, 12L, "X", 400000.0, "2001-12-31", "5-LOW"),
    (4L, 13L, "P", -5.0, "2001-01-01", "2-HIGH")
  ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "d", "o_orderpriority")
    .withColumn("o_orderdate", col("d").cast("timestamp")).drop("d")

  test("status standardization handles case, trim and unknowns") {
    val m = SilverOrders.clean(orders, conf).select("o_orderkey", "order_status_standardized")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m === Map(1L -> "OPEN", 2L -> "FULFILLED", 3L -> "UNKNOWN", 4L -> "PENDING"))
  }

  test("size buckets follow fixed quartile bounds") {
    val m = SilverOrders.clean(orders, conf).select("o_orderkey", "order_size_category")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(1L) === "SMALL")
    assert(m(2L) === "LARGE")
    assert(m(3L) === "EXTRA_LARGE")
  }

  test("completeness flag and dq score reflect violations") {
    val rows = SilverOrders.clean(orders, conf)
      .select("o_orderkey", "is_complete_order", "data_quality_score")
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getDouble(2))).toList
    val byKey = rows.map(t => t._1 -> ((t._2, t._3))).toMap
    assert(byKey(1L) === ((true, 1.0)))
    assert(byKey(3L)._1 === false) // UNKNOWN status
    assert(byKey(3L)._2 === 0.8)
    assert(byKey(4L)._1 === false) // negative price
    assert(byKey(4L)._2 === 0.8)
  }

  test("days_since_order uses injected as-of date") {
    val m = SilverOrders.clean(orders, conf).select("o_orderkey", "days_since_order")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(m(3L) === 1) // 2001-12-31 -> 2002-01-01
  }

  test("silver projection pins the declared schema") {
    assert(SilverOrders.silver(orders, conf).columns.toSeq === SilverOrders.silverColumns)
  }

  test("completeOrders filter drops incomplete and unknown") {
    val silver = SilverOrders.silver(orders, conf)
    assert(SilverOrders.completeOrders(silver).select("o_orderkey")
      .collect().map(_.getLong(0)).toSet === Set(1L, 2L))
  }
}
