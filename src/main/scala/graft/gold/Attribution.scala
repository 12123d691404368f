package graft.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-touch revenue attribution — "which touchpoints get credit for
  * this conversion": the marketing-analytics complement to the funnel
  * ([[Cohorts.funnel]] answers IF users convert; attribution answers
  * which of their touches to pay for). Linear model: each conversion's
  * value splits EQUALLY across the user's qualifying touches inside the
  * lookback window.
  */
object Attribution {

  /** Linear attribution: for every conversion event (type `convType`,
    * monetary `valueCol`), find the same user's touch events (type
    * `touchType`) with ts in `[conv_ts − lookbackSec, conv_ts]`
    * (inclusive), and credit each touch value/touches. Money is handled
    * as integer micros with truncating division — the semantics BOTH
    * engines share (Spark `div` and DuckDB `//` each truncate toward
    * zero, refunds included) — so the per-conversion remainder
    * (< touches micro-units) stays unattributed deterministically and
    * per-touch credit sums are engine- and partition-order independent.
    * The micros conversion itself is floor(v·10⁶ + 0.5): half-up for
    * v ≥ 0, floor-of-shifted for v < 0 —
    * one fixed deterministic rule applied identically on both engines. Conversions with zero in-window
    * touches simply contribute nothing (unattributed conversions —
    * count them upstream if needed).
    *
    * Output: one row per credited touch — (touch_id, n_conversions,
    * credit_micros).
    *
    * Shape: one equi-join on the user (per-user touch×conversion pairs,
    * bounded by per-user activity — the same containment argument as
    * the funnel), one count window partitioned by conversion id (pair
    * volume, not corpus volume), one groupBy on the touch.
    */
  def linear(events: DataFrame, convType: String, touchType: String,
      lookbackSec: Long, userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type", idCol: String = "event_id",
      valueCol: String = "value"): DataFrame = {
    require(lookbackSec >= 0, "lookbackSec must be non-negative")
    val conv = events.filter(col(typeCol) === convType).select(
      col(userCol), col(idCol).as("conv_id"), col(tsCol).as("_p_ts"),
      expr(s"CAST(floor($valueCol * 1e6 + 0.5) AS BIGINT)").as("value_micros"))
    val touch = events.filter(col(typeCol) === touchType).select(
      col(userCol), col(idCol).as("touch_id"), col(tsCol).as("_c_ts"))
    conv.join(touch, Seq(userCol))
      .filter(col("_c_ts") >= col("_p_ts") - expr(s"INTERVAL $lookbackSec SECOND") &&
        col("_c_ts") <= col("_p_ts"))
      .withColumn("touches",
        count(lit(1)).over(Window.partitionBy("conv_id")).cast("long"))
      .groupBy("touch_id")
      // Plain `div`: BOTH engines truncate integer division toward zero
      // (verified empirically against DuckDB 1.0: -10 // 3 = -3, matching
      // Spark's div) — a floor-division "correction" would diverge on
      // refund rows. Round-8 advice claimed DuckDB floors; it does not.
      .agg(count(lit(1)).as("n_conversions"),
        sum(expr("value_micros div touches")).as("credit_micros"))
  }

  /** Time-decay attribution: a touch's share halves for every
    * `halflifeSec` of age at conversion time — the standard recency model
    * next to [[linear]]'s equal split. EXACT integer weights: age bucket
    * k = floor(Δ/halflife); within a conversion, weight = 2^(kmax − k)
    * (the oldest in-window touch gets weight 1, each half-life younger
    * doubles it) — powers of two as longs, never a libm pow, so credit =
    * floor(value·w / Σw) is the same exact arithmetic on every engine and
    * partitioning (truncating division on both engines, like [[linear]];
    * the per-conversion remainder stays unattributed deterministically).
    * `lookbackSec/halflifeSec` ≤ 40 keeps 2^kmax far inside a long.
    *
    * Output: (touch_id, n_conversions, credit_micros). Same join shape
    * as [[linear]]: per-user pairs, conversion-keyed windows, one final
    * groupBy.
    */
  def timeDecay(events: DataFrame, convType: String, touchType: String,
      lookbackSec: Long, halflifeSec: Long, userCol: String = "user_id",
      tsCol: String = "ts", typeCol: String = "event_type",
      idCol: String = "event_id", valueCol: String = "value"): DataFrame = {
    require(lookbackSec >= 0, "lookbackSec must be non-negative")
    require(halflifeSec > 0, "halflifeSec must be positive")
    require(lookbackSec / halflifeSec <= 40,
      s"lookback/halflife must be <= 40 half-lives: $lookbackSec/$halflifeSec")
    val conv = events.filter(col(typeCol) === convType).select(
      col(userCol), col(idCol).as("conv_id"), col(tsCol).as("_p_ts"),
      expr(s"CAST(floor($valueCol * 1e6 + 0.5) AS BIGINT)").as("value_micros"))
    val touch = events.filter(col(typeCol) === touchType).select(
      col(userCol), col(idCol).as("touch_id"), col(tsCol).as("_c_ts"))
    val w = Window.partitionBy("conv_id")
    conv.join(touch, Seq(userCol))
      .filter(col("_c_ts") >= col("_p_ts") - expr(s"INTERVAL $lookbackSec SECOND") &&
        col("_c_ts") <= col("_p_ts"))
      // TIMESTAMP_NTZ → epoch seconds via the explicit timestamp hop
      // (session tz pinned UTC — the q_overlap idiom)
      .withColumn("_k", expr(
        "(CAST(CAST(_p_ts AS TIMESTAMP) AS LONG) - " +
          s"CAST(CAST(_c_ts AS TIMESTAMP) AS LONG)) div $halflifeSec"))
      .withColumn("_w", expr("shiftleft(1L, CAST(max(_k) OVER " +
        "(PARTITION BY conv_id) - _k AS INT))"))
      .withColumn("_sw", sum(col("_w")).over(w))
      .withColumn("_num", col("value_micros") * col("_w"))
      .groupBy("touch_id")
      .agg(count(lit(1)).as("n_conversions"),
        sum(expr("_num div _sw")).as("credit_micros"))
  }
}
