package graft.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Silver→gold sales summaries: daily/monthly aggregation, segment CLV
  * re-aggregation, ranking, top-k and multi-grain union.
  *
  * Re-expresses reference/terraform/modules/glue/templates/silver_to_gold_sales_summary.py:
  * daily agg (:117-128 — A1/A6/A7), monthly agg (:191-202 — A2), segment
  * re-aggregation (:282-328 — A11), ranking (:270-273 — W2), multi-grain
  * union (:334-397 — A12/U1), top-1 insights (:472,496 — O1).
  *
  * All money aggregates run on DECIMAL(18,2): exact, deterministic across
  * partition orders (double sums are not), and oracle-comparable bit-for-bit.
  * Derived doubles (averages, rates) are computed FROM the exact sums so the
  * division is a single deterministic IEEE op.
  */
object SalesSummary {

  private def priceDec = col("o_totalprice").cast("decimal(18,2)")

  /** A1: daily multi-aggregate summary. One shuffle on the group key; partial
    * aggregation (map-side combine) happens automatically in HashAggregate.
    */
  def daily(orders: DataFrame): DataFrame =
    orders
      .select(col("o_orderdate").cast("date").as("order_date"),
        priceDec.as("price"), col("o_custkey"))
      .groupBy("order_date")
      .agg(
        count(lit(1)).as("order_count"),
        sum(col("price")).as("daily_revenue"),
        countDistinct(col("o_custkey")).as("unique_customers"),
        min(col("price")).as("min_order_value"),
        max(col("price")).as("max_order_value"),
        sum(col("price") * col("price")).as("_sumsq")
      )
      // Sample stddev from EXACT decimal sums: sqrt((Σx² − (Σx)²/n)/(n−1)).
      // Built-in stddev on doubles is summation-order-dependent (partial agg
      // merge order varies); decimal sums are exact, so the final double
      // arithmetic is a fixed IEEE sequence — bit-reproducible and
      // oracle-comparable. A7's built-in stddev is exercised in tests.
      .withColumn("order_value_stddev",
        when(col("order_count") > 1,
          round(sqrt(greatest(
            (col("_sumsq").cast("double") -
              col("daily_revenue").cast("double") * col("daily_revenue").cast("double") / col("order_count"))
              / (col("order_count") - 1), lit(0.0))), 2))
          .otherwise(lit(null).cast("double")))
      // NO round on money averages: cents ÷ a 2^k count terminates at 7-8
      // decimals but is binary-INEXACT, so Spark (rounds the shortest decimal
      // repr, HALF_UP) and an exact-binary engine disagree on the tie — seen
      // live at sf0.1. The raw IEEE division of identical exact inputs is
      // bit-equal in every engine.
      .withColumn("avg_order_value",
        col("daily_revenue").cast("double") / col("order_count"))
      .drop("_sumsq")

  /** A2: monthly two-key summary with countDistinct active days. */
  def monthly(orders: DataFrame): DataFrame =
    orders
      .select(col("o_orderdate").cast("date").as("order_date"),
        priceDec.as("price"), col("o_custkey"))
      .withColumn("order_year", year(col("order_date")))
      .withColumn("order_month", month(col("order_date")))
      .groupBy("order_year", "order_month")
      .agg(
        count(lit(1)).as("order_count"),
        sum(col("price")).as("monthly_revenue"),
        countDistinct(col("o_custkey")).as("unique_customers"),
        countDistinct(col("order_date")).as("active_days")
      )
      .withColumn("month_year",
        concat(col("order_year"), lit("-"), lpad(col("order_month"), 2, "0")))
      .withColumn("avg_daily_revenue", // un-rounded: see daily's tie note
        col("monthly_revenue").cast("double") / col("active_days"))

  /** A11: two-level re-aggregation — customers → value bucket → segment
    * rollup with % shares. The % share uses a broadcast-friendly window over
    * the (tiny) segment frame, NOT a driver-side collect of the total
    * (silver_to_gold_sales_summary.py:314-315 collects; at 100 TB that's
    * fine for a scalar but the lazy form composes better).
    */
  def segmentClv(orders: DataFrame, customer: DataFrame): DataFrame = {
    val perCustomer = orders
      .groupBy("o_custkey")
      .agg(sum(priceDec).as("lifetime_value"), count(lit(1)).as("order_count"))
    val bucketed = perCustomer.withColumn(
      "value_segment",
      when(col("lifetime_value") < 1000000, "BRONZE")
        .when(col("lifetime_value") < 3000000, "SILVER")
        .otherwise("GOLD")
    )
    val seg = bucketed
      .groupBy("value_segment")
      .agg(
        count(lit(1)).as("customers"),
        sum(col("lifetime_value")).as("segment_revenue"),
        sum(col("order_count")).as("segment_orders"),
        min(col("lifetime_value")).as("min_clv"),
        max(col("lifetime_value")).as("max_clv")
      )
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy()
    seg.withColumn("revenue_share_pct",
      round(col("segment_revenue").cast("double") / sum(col("segment_revenue")).over(w).cast("double") * 100.0, 6))
  }

  /** W2: revenue ranking by order priority (stands in for category). */
  def priorityRanking(orders: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    orders
      .groupBy("o_orderpriority")
      .agg(sum(priceDec).as("priority_revenue"), count(lit(1)).as("order_count"))
      .withColumn("priority_rank",
        row_number().over(Window.orderBy(col("priority_revenue").desc, col("o_orderpriority"))).cast("long"))
  }

  /** O1: top-1 day by revenue. orderBy+limit → Spark's TakeOrdered (no full
    * sort; per-partition top-k then merge — safe at any scale).
    */
  def bestDay(orders: DataFrame): DataFrame =
    daily(orders)
      .select("order_date", "daily_revenue", "order_count")
      .orderBy(col("daily_revenue").desc, col("order_date"))
      .limit(1)

  /** A8: the "insights block" — corpus-level scalars + best day/month
    * (silver_to_gold_sales_summary.py:453-496). Stays fully lazy: totals
    * come from one global aggregate and the best-day/month rows ride in via
    * broadcast cross-joins of 1-row frames — no driver-side collect, so the
    * pattern composes into larger plans at any scale.
    */
  def insights(orders: DataFrame): DataFrame = {
    val totals = orders.agg(
      count(lit(1)).as("total_orders"),
      sum(priceDec).as("total_revenue"),
      countDistinct(col("o_custkey")).as("unique_customers"))
    val best = bestDay(orders)
      .select(col("order_date").as("best_day"), col("daily_revenue").as("best_day_revenue"))
    val bestMonth = monthly(orders)
      .orderBy(col("monthly_revenue").desc, col("month_year"))
      .limit(1)
      .select(col("month_year").as("best_month"), col("monthly_revenue").as("best_month_revenue"))
    totals
      .crossJoin(broadcast(best))
      .crossJoin(broadcast(bestMonth))
      .withColumn("avg_revenue_per_customer", // un-rounded: see daily's tie note
        col("total_revenue").cast("double") / col("unique_customers"))
  }

  /** A12/U1: daily + monthly summaries conformed to one schema and unioned
    * with a summary_type tag (silver_to_gold_sales_summary.py:334-397).
    */
  def multiGrainUnion(orders: DataFrame): DataFrame = {
    val d = daily(orders).select(
      lit("daily").as("summary_type"),
      date_format(col("order_date"), "yyyy-MM-dd").as("period"),
      col("daily_revenue").as("revenue"),
      col("order_count"),
      col("unique_customers")
    )
    val m = monthly(orders).select(
      lit("monthly").as("summary_type"),
      col("month_year").as("period"),
      col("monthly_revenue").as("revenue"),
      col("order_count"),
      col("unique_customers")
    )
    d.unionByName(m)
  }
}
