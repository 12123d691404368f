package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-frame analytics beyond the reference's row_number usage:
  * moving averages (rowsBetween frames), lag/lead deltas, cumulative sums,
  * and gap-based sessionization.
  *
  * All windows here are PARTITIONED (by entity or calendar scope) — one
  * shuffle on the partition key, each partition sorted locally; none of the
  * global-ordering hazards of W1.
  */
object Windows {

  /** Trailing moving average + day-over-day delta over a per-key ordered
    * metric.
    */
  def movingStats(df: DataFrame, partitionCols: Seq[String], orderCol: String,
      valueCol: String, windowRows: Int): DataFrame = {
    val base = Window.partitionBy(partitionCols.map(col): _*).orderBy(col(orderCol))
    val trailing = base.rowsBetween(-(windowRows - 1), Window.currentRow)
    // moving average from the EXACT frame sum (decimal-safe): frame avg on
    // doubles is summation-order dependent across engines
    df.withColumn(s"${valueCol}_ma",
        round(sum(col(valueCol)).over(trailing).cast("double")
          / count(col(valueCol)).over(trailing), 6))
      .withColumn(s"${valueCol}_prev", lag(col(valueCol), 1).over(base))
      .withColumn(s"${valueCol}_delta",
        col(valueCol) - coalesce(col(s"${valueCol}_prev"), col(valueCol)))
      .withColumn(s"${valueCol}_cum",
        sum(col(valueCol)).over(base.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Gap-based sessionization: a new session starts when the time since the
    * previous event for the same key exceeds `gapSeconds`. Two window passes
    * over one shuffle on the key: lag to flag starts, running sum to number
    * sessions.
    */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String,
      gapSeconds: Long, tieBreakCols: Seq[String] = Seq.empty): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol) +: tieBreakCols.map(col): _*)
    df.withColumn("_prev_ts", lag(col(tsCol), 1).over(w))
      .withColumn("_new_session",
        when(col("_prev_ts").isNull ||
          unix_timestamp(col(tsCol)) - unix_timestamp(col("_prev_ts")) > gapSeconds, 1L)
          .otherwise(0L))
      .withColumn("session_seq",
        sum(col("_new_session")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_prev_ts", "_new_session")
  }

  /** Per-session rollup: bounds, event count, value sum. */
  def sessionStats(sessionized: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame =
    sessionized.groupBy(col(keyCol), col("session_seq"))
      .agg(
        count(lit(1)).as("events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        sum(col(valueCol).cast("decimal(18,2)")).as("session_value"))

  /** Calendar-spine gap fill: aggregate a timestamped metric per day, then
    * left-join it onto the full min..max date spine so missing days appear
    * as explicit zero rows — the prerequisite for every moving-average /
    * lag computation ([[movingStats]] windows silently skip absent rows
    * otherwise). The spine bounds come from `boundsDf` (usually the
    * unfiltered stream, so a filtered metric still spans the full
    * calendar) as a 1-row aggregate exploded into dates — lazy, broadcast,
    * no driver collect; the spine is bounded by days-in-range regardless
    * of corpus size.
    */
  def gapFillDaily(metric: DataFrame, boundsDf: DataFrame, tsCol: String,
      valueCol: String): DataFrame = {
    val daily = metric
      .groupBy(to_date(col(tsCol)).as("d"))
      .agg(sum(col(valueCol).cast("decimal(18,2)")).as("_rev"),
        count(lit(1)).as("_n"))
    val spine = boundsDf
      .agg(to_date(min(col(tsCol))).as("lo"), to_date(max(col(tsCol))).as("hi"))
      .select(explode(expr("sequence(lo, hi, interval 1 day)")).as("d"))
    spine.join(daily, Seq("d"), "left")
      .select(col("d"),
        coalesce(col("_rev"), lit(0).cast("decimal(28,2)")).as("revenue"),
        coalesce(col("_n"), lit(0L)).as("n_events"))
  }

  /** Native `session_window` sessionization — the engine-managed form of
    * [[sessionize]]: one aggregation, sessions merge while events fall
    * within the previous event's [ts, ts + gap] horizon INCLUSIVE — an
    * event at exactly prev + gap still merges (verified against Spark
    * 4.1; the same `> gap`-starts-new convention as [[sessionize]]). Same
    * expression works unchanged under Structured Streaming with a
    * watermark, where the state store expires closed sessions — the
    * reason to prefer it over the lag/running-sum form for streaming
    * pipelines. session_end = last event + gap by definition.
    */
  def sessionWindowStats(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, gap: String = "30 minutes"): DataFrame =
    df.groupBy(col(keyCol), session_window(col(tsCol), gap).as("sw"))
      .agg(
        count(lit(1)).as("events"),
        sum(col(valueCol).cast("decimal(18,2)")).as("session_value"))
      .select(col(keyCol), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("events"), col("session_value"))
}
