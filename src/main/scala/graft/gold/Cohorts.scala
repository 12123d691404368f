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

  /** K-step ordered funnel — the general form of [[funnel]]: users reach
    * step i when they have a step-i event at or after their EARLIEST
    * reach of step i−1 (earliest-reach semantics make the chain
    * deterministic and monotone: reached-user sets only shrink down the
    * funnel). One keyed (filter → join → min-aggregate) per step — no
    * windows over the event table, no per-user event collection; the
    * rate arithmetic runs on the k-row summary (model-sized window).
    *
    * Output: one row per step — (step_idx, step_type, users,
    * conv_from_prev, conv_from_first), rates as exact-int double
    * divisions rounded to 6dp.
    */
  def funnelSteps(events: DataFrame, steps: Seq[String],
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    require(steps.size >= 2, "need at least 2 steps")
    val firstReach = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("_r"))
    val reaches = steps.tail.scanLeft(firstReach) { (prev, st) =>
      events.filter(col(typeCol) === st)
        .join(prev.select(col(userCol), col("_r").as("_pr")), Seq(userCol))
        .filter(col(tsCol) >= col("_pr"))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("_r"))
    }
    val perStep = reaches.zipWithIndex.map { case (r, i) =>
      r.agg(count(lit(1)).as("users"))
        .select(lit(i + 1).as("step_idx"), lit(steps(i)).as("step_type"),
          col("users"))
    }.reduce(_ unionByName _)
    val w = Window.orderBy(col("step_idx"))
    perStep
      .withColumn("conv_from_prev", round(col("users").cast("double") /
        coalesce(lag(col("users"), 1).over(w), col("users")), 6))
      .withColumn("conv_from_first", round(col("users").cast("double") /
        first(col("users")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)), 6))
  }

  /** [[funnel]] with a CONVERSION WINDOW: B counts only within
    * `windowSec` seconds of the user's first A (inclusive on both ends —
    * the product-analytics "converted within N days" question; the
    * unbounded funnel systematically overstates attribution). Same plan
    * shape as [[funnel]]: one window to stamp first-A, one per-user
    * aggregate, one rollup.
    */
  def funnelWindowed(events: DataFrame, stepA: String, stepB: String,
      windowSec: Long, userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    require(windowSec >= 0, "windowSec must be non-negative")
    val w = Window.partitionBy(col(userCol))
    val flagged = events
      .withColumn("_first_a", min(when(col(typeCol) === stepA, col(tsCol))).over(w))
    val inWindow = col(typeCol) === stepB && col("_first_a").isNotNull &&
      col(tsCol) >= col("_first_a") &&
      col(tsCol) <= col("_first_a") + expr(s"INTERVAL $windowSec SECOND")
    val perUser = flagged.groupBy(col(userCol)).agg(
      max(when(col(typeCol) === stepA, 1).otherwise(0)).as("_did_a"),
      max(when(inWindow, 1).otherwise(0)).as("_conv"))
    perUser.agg(
      count(lit(1)).as("users"),
      sum(col("_did_a")).cast("long").as("stepa_users"),
      sum(col("_conv")).cast("long").as("converted_users"))
      .withColumn("conversion_rate",
        round(col("converted_users").cast("double") / col("stepa_users"), 6))
  }

  /** Event transition matrix — "user flow": for each consecutive event
    * pair within a user's stream (ordered by (ts, idCol) — the id
    * tiebreak makes the sequence total and engine-portable), count
    * (from_type → to_type) and its share of all transitions leaving
    * from_type. The Markov-chain / Sankey-diagram input.
    *
    * Shape: one lag window partitioned by user (the only corpus-sized
    * shuffle), one groupBy on the (from, to) pair — output is
    * |types|² rows, so the share window runs on a model-sized table.
    */
  def transitionMatrix(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts", typeCol: String = "event_type",
      idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    events
      .withColumn("_prev", lag(col(typeCol), 1).over(w))
      .filter(col("_prev").isNotNull)
      .groupBy(col("_prev").as("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("total_from",
        sum(col("n")).over(Window.partitionBy("from_type")))
      .withColumn("p",
        round(col("n").cast("double") / col("total_from"), 6))
  }
}
