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
    * as integer micros with exact FLOOR division (matching DuckDB `//`,
    * including for negative refund values) — the per-conversion
    * remainder (< touches micro-units) stays unattributed
    * deterministically, so per-touch credit sums are engine- and
    * partition-order independent. The micros conversion itself is
    * floor(v·10⁶ + 0.5): half-up for v ≥ 0, floor-of-shifted for v < 0 —
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
      // FLOOR division, not Spark's truncate-toward-zero `div`: DuckDB's
      // `//` floors, so a refund (-10 micros over 3 touches) is -4 there
      // but -3 under `div` — the correction term makes both engines agree
      // for negative conversion values too (touches is always > 0).
      .agg(count(lit(1)).as("n_conversions"),
        sum(expr("value_micros div touches - (CASE WHEN value_micros < 0 " +
          "AND value_micros % touches != 0 THEN 1 ELSE 0 END)"))
          .as("credit_micros"))
  }
}
