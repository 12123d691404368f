package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.GraftConf

/** Bronze→silver cleaning of the orders fact table.
  *
  * Re-expresses the reference's order-cleaning withColumn chain
  * (reference/terraform/modules/glue/templates/bronze_to_silver_orders.py:82-226)
  * over the TPC-H-ish testdata schema: casts (F2), multi-branch CASE status
  * standardization (F1), date parts (F10), datediff recency (F9), arithmetic
  * (F12), boolean completeness flags (F13), and a boolean→int data-quality
  * score (F20).
  *
  * Everything is a single declarative projection over the scan — no actions,
  * no UDFs — so Catalyst fuses it into one WholeStageCodegen stage over the
  * parquet scan and column pruning/pushdown stay intact at 100 TB.
  */
object SilverOrders {

  /** Fixed order-size buckets (quartiles of the testdata's uniform price). */
  val SizeBuckets: Seq[(Double, String)] =
    Seq(125000.0 -> "SMALL", 250000.0 -> "MEDIUM", 375000.0 -> "LARGE")
  val TopBucket = "EXTRA_LARGE"

  def sizeCategory(price: Column): Column =
    SizeBuckets.foldRight(lit(TopBucket): Column) { case ((bound, name), rest) =>
      when(price < bound, name).otherwise(rest)
    }

  /** Status standardization CASE chain (F1); mirrors
    * bronze_to_silver_orders.py:132-138's status mapping.
    */
  def statusStandardized(status: Column): Column =
    when(upper(trim(status)) === "O", "OPEN")
      .when(upper(trim(status)) === "F", "FULFILLED")
      .when(upper(trim(status)) === "P", "PENDING")
      .otherwise("UNKNOWN")

  def clean(orders: DataFrame, conf: GraftConf = GraftConf.default): DataFrame = {
    val asOf = lit(java.sql.Date.valueOf(conf.asOfDate))
    orders
      .withColumn("o_totalprice_dec", col("o_totalprice").cast("decimal(18,2)"))
      .withColumn("order_date", col("o_orderdate").cast("date"))
      .withColumn("order_status_standardized", statusStandardized(col("o_orderstatus")))
      .withColumn("order_size_category", sizeCategory(col("o_totalprice")))
      .withColumn("priority_rank", substring(col("o_orderpriority"), 1, 1).cast("int"))
      .withColumn("order_year", year(col("order_date")))
      .withColumn("order_month", month(col("order_date")))
      .withColumn("order_quarter", quarter(col("order_date")))
      .withColumn("order_dayofweek", dayofweek(col("order_date")))
      .withColumn("days_since_order", datediff(asOf, col("order_date")))
      .withColumn(
        "is_complete_order",
        col("order_status_standardized") =!= "UNKNOWN" &&
          col("o_totalprice") > 0 && col("order_date").isNotNull
      )
      .withColumn(
        "data_quality_score",
        (Seq(
          col("o_orderkey").isNotNull,
          col("o_custkey").isNotNull,
          col("order_date").isNotNull,
          col("o_totalprice").isNotNull && col("o_totalprice") > 0,
          col("order_status_standardized") =!= "UNKNOWN"
        ).map(c => when(c, 1).otherwise(0)).reduce(_ + _).cast("double") / 5.0)
      )
  }

  /** Final silver projection (column pruning, P1) — pins the output schema
    * like the reference's fixed select list (bronze_to_silver_orders.py:302-328).
    */
  val silverColumns: Seq[String] = Seq(
    "o_orderkey", "o_custkey", "order_date", "order_status_standardized",
    "o_totalprice_dec", "order_size_category", "priority_rank", "order_year",
    "order_month", "order_quarter", "order_dayofweek", "days_since_order",
    "is_complete_order", "data_quality_score"
  )

  def silver(orders: DataFrame, conf: GraftConf = GraftConf.default): DataFrame =
    clean(orders, conf).select(silverColumns.map(col): _*)

  /** Business filter (P3): complete, non-UNKNOWN orders — mirrors
    * silver_to_gold_sales_summary.py:111-114.
    */
  def completeOrders(silver: DataFrame): DataFrame =
    silver.filter(col("is_complete_order") && col("order_status_standardized") =!= "UNKNOWN")
}
