package graft.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream behavioral analytics: cohort retention and ordered-step
  * funnel conversion. Classic product-analytics shapes the reference's
  * gold layer computes downstream in a warehouse; here they are Spark
  * aggregations that stay linear in the event count.
  */
object Cohorts {

  /** Cohort retention matrix: users bucketed by the period of their FIRST
    * event (cohort), counted once per period they were active. Output:
    * (cohort_period, activity_period, users). `periodFmt` is a Spark
    * date_format pattern (default daily — engine-portable, unlike
    * week-of-year which is locale-dependent). Two aggregations + one
    * join — all keyed on user/period, no window over the raw stream; AQE
    * picks the join strategy (the per-user cohort frame is corpus-sized,
    * so no broadcast hint).
    */
  def cohortRetention(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts", periodFmt: String = "yyyy-MM-dd"): DataFrame = {
    val e = events.select(col(userCol), date_format(col(tsCol), periodFmt).as("p"))
    val cohort = e.groupBy(userCol).agg(min(col("p")).as("cohort_period"))
    e.distinct()
      .join(cohort, Seq(userCol))
      .groupBy("cohort_period", "p")
      .agg(countDistinct(col(userCol)).as("users"))
      .withColumnRenamed("p", "activity_period")
      .select("cohort_period", "activity_period", "users")
  }

  /** Ordered two-step funnel: of the users who performed `stepA`, how many
    * later (>= first stepA time) performed `stepB`. One window pass to
    * stamp each user's first stepA time, one per-user aggregate, one
    * global rollup: (users, stepa_users, converted_users,
    * conversion_rate). The >= makes a same-instant B count as converted —
    * mirrored in the oracle.
    */
  def funnel(events: DataFrame, stepA: String, stepB: String,
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    val w = Window.partitionBy(col(userCol))
    val flagged = events
      .withColumn("_first_a", min(when(col(typeCol) === stepA, col(tsCol))).over(w))
    val perUser = flagged.groupBy(col(userCol)).agg(
      max(when(col(typeCol) === stepA, 1).otherwise(0)).as("_did_a"),
      max(when(col(typeCol) === stepB &&
        col("_first_a").isNotNull && col(tsCol) >= col("_first_a"), 1).otherwise(0))
        .as("_conv"))
    perUser.agg(
      count(lit(1)).as("users"),
      sum(col("_did_a")).cast("long").as("stepa_users"),
      sum(col("_conv")).cast("long").as("converted_users"))
      .withColumn("conversion_rate",
        round(col("converted_users").cast("double") / col("stepa_users"), 6))
  }
}
