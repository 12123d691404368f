package graft.gold

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.GraftConf
import graft.etl.SilverOrders

/** Silver→gold customer analytics: per-customer rollups, pivoted size
  * distribution, the 3-way left-join merge with fillna, RFM scoring and
  * lifecycle segmentation.
  *
  * Re-expresses reference/terraform/modules/glue/templates/silver_to_gold_customer_analytics.py:
  * per-customer agg (:116-128 — A3), pivot with EXPLICIT values (:157-163 —
  * A5; explicit values avoid the extra value-discovery job and keep the
  * schema deterministic), 3-way left join (:166-196 — J1/J2), fillna
  * (:199-218 — F22), RFM CASE chains (:284-315 — M2), lifecycle (:317-325).
  *
  * Join strategy at scale: `metrics` and `pivoted` are per-customer
  * aggregates — same cardinality as `customer` — so these are shuffle joins
  * on customer key; AQE picks SMJ/BHJ by runtime size. The dimension side is
  * the smaller of the two at 100 TB and broadcast-eligible per config.
  */
object CustomerAnalytics {

  val PivotSizes: Seq[String] = Seq("SMALL", "MEDIUM", "LARGE", "EXTRA_LARGE")

  private def priceDec = col("o_totalprice").cast("decimal(18,2)")

  /** A3: per-customer lifetime metrics. */
  def customerMetrics(orders: DataFrame, conf: GraftConf = GraftConf.default): DataFrame = {
    val asOf = lit(java.sql.Date.valueOf(conf.asOfDate))
    orders
      .select(col("o_custkey"), priceDec.as("price"), col("o_orderdate").cast("date").as("order_date"))
      .groupBy("o_custkey")
      .agg(
        count(lit(1)).as("total_orders"),
        sum(col("price")).as("total_spent"),
        min(col("order_date")).as("first_order_date"),
        max(col("order_date")).as("last_order_date"),
        countDistinct(col("order_date")).as("active_days")
      )
      // un-rounded: money-average round-ties diverge across engines (see
      // SalesSummary.daily note)
      .withColumn("avg_order_value",
        col("total_spent").cast("double") / col("total_orders"))
      .withColumn("recency_days", datediff(asOf, col("last_order_date")))
      .withColumn("tenure_days", datediff(col("last_order_date"), col("first_order_date")))
  }

  /** A5: order-size distribution pivoted to columns, explicit value list. */
  def sizePivot(orders: DataFrame): DataFrame = {
    val renames = Map(
      "SMALL" -> "small_orders", "MEDIUM" -> "medium_orders",
      "LARGE" -> "large_orders", "EXTRA_LARGE" -> "extra_large_orders")
    val p = orders
      .withColumn("order_size_category", SilverOrders.sizeCategory(col("o_totalprice")))
      .groupBy("o_custkey")
      .pivot("order_size_category", PivotSizes)
      .agg(count(lit(1)))
    renames.foldLeft(p) { case (df, (from, to)) => df.withColumnRenamed(from, to) }
  }

  /** J1+J2+F22: dimension × metrics × pivot, left joins keyed on the shared
    * column name (no ambiguity), then fillna for customers with no orders.
    */
  def analytics(customer: DataFrame, orders: DataFrame,
      conf: GraftConf = GraftConf.default): DataFrame = {
    val dim = customer.select(col("c_custkey").as("o_custkey"),
      col("c_name"), col("c_mktsegment"), col("c_acctbal"))
    val joined = dim
      .join(customerMetrics(orders, conf), Seq("o_custkey"), "left")
      .join(sizePivot(orders), Seq("o_custkey"), "left")
    joined.na.fill(Map(
      "total_orders" -> 0L, "avg_order_value" -> 0.0, "recency_days" -> -1,
      "tenure_days" -> -1, "active_days" -> 0L,
      "small_orders" -> 0L, "medium_orders" -> 0L,
      "large_orders" -> 0L, "extra_large_orders" -> 0L
    ))
  }

  /** M2: RFM scores — fixed-threshold CASE chains like the reference
    * (silver_to_gold_customer_analytics.py:284-315), concat'd code.
    */
  def rfmScore(recencyDays: Column, frequency: Column, monetary: Column): Column = {
    val r = when(recencyDays <= 365, 5).when(recencyDays <= 730, 4)
      .when(recencyDays <= 1460, 3).when(recencyDays <= 2920, 2).otherwise(1)
    val f = when(frequency >= 15, 5).when(frequency >= 10, 4)
      .when(frequency >= 6, 3).when(frequency >= 3, 2).otherwise(1)
    val m = when(monetary >= 4000000, 5).when(monetary >= 2500000, 4)
      .when(monetary >= 1200000, 3).when(monetary >= 400000, 2).otherwise(1)
    concat(r.cast("string"), f.cast("string"), m.cast("string"))
  }

  def withRfm(metrics: DataFrame): DataFrame =
    metrics
      .withColumn("rfm_score",
        rfmScore(col("recency_days"), col("total_orders"), col("total_spent")))
      .withColumn(
        "lifecycle_stage",
        when(col("recency_days") <= 365 && col("total_orders") >= 10, "CHAMPION")
          .when(col("recency_days") <= 730, "ACTIVE")
          .when(col("recency_days") <= 1825, "AT_RISK")
          .otherwise("DORMANT")
      )
}
