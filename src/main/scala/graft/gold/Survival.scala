package graft.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival estimation — retention/churn curves with
  * censoring done right: a customer still active at the as-of date is
  * CENSORED (their lifetime is a lower bound), not a survivor forever;
  * naive retention curves that ignore censoring bias survival downward.
  * The product estimator handles it exactly:
  *
  *   S(t) = Π_{tᵢ ≤ t, dᵢ > 0} (1 − dᵢ / nᵢ)
  *
  * with dᵢ = events (churns) at duration tᵢ and nᵢ = subjects still at
  * risk (duration ≥ tᵢ — events AND censored both count until they
  * leave).
  */
object Survival {

  /** KM estimator over per-subject (duration, event) rows: `eventCol` =
    * 1 when the terminal event was observed, 0 when censored. Output:
    * one row per duration with observed events — (t, d, n_risk,
    * ln_s_micros, survival) — where ln_s_micros is the EXACT integer
    * cumulative sum of per-step floor(ln(1 − d/n)·1e6 + 0.5) (the
    * engine-portable determinism contract: each step is one fixed
    * double sequence from exact longs) and survival = round(exp(·), 6)
    * is the boundary double. A step that exhausts the risk set
    * (d = n_risk) drives survival to exactly 0 from that point on
    * (ln undefined — handled, not NaN'd).
    *
    * Shape: one groupBy on duration (the only corpus-sized shuffle);
    * the cumulative windows run on the AGGREGATED duration table —
    * |distinct durations| rows (days → thousands), model-sized, so the
    * unpartitioned ordered window is bounded by construction.
    */
  def kaplanMeier(df: DataFrame, durationCol: String,
      eventCol: String): DataFrame = {
    // Null durations are undefined lifetimes, not a t=NULL event time:
    // kept, they'd form a NULL group whose window placement differs
    // between engines (Spark sorts NULL first, DuckDB last), skewing
    // every cumulative n_risk. Excluded from the risk set entirely.
    val obs = df.filter(col(durationCol).isNotNull)
    val agg = obs
      .groupBy(col(durationCol).cast("long").as("t"))
      .agg(
        sum(when(col(eventCol) === 1, 1L).otherwise(0L)).as("d"),
        count(lit(1)).as("c"))
    val total = obs.agg(count(lit(1)).as("_n"))
    val wOrd = Window.orderBy(col("t"))
    val risk = agg
      .withColumn("_cumc", sum(col("c")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, -1)))
      .crossJoin(broadcast(total))
      .withColumn("n_risk", col("_n") - coalesce(col("_cumc"), lit(0L)))
      .filter(col("d") > 0)
    risk
      .withColumn("_lnf", when(col("d") < col("n_risk"), expr(
        "CAST(floor(ln(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)"))
        .otherwise(lit(0L))) // d = n_risk: factor 0 handled via _dead flag
      .withColumn("_dead", max((col("d") === col("n_risk")).cast("int")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("ln_s_micros", sum(col("_lnf")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("survival", when(col("_dead") === 1, lit(0.0))
        .otherwise(round(exp(col("ln_s_micros").cast("double") / 1e6), 6)))
      .select("t", "d", "n_risk", "ln_s_micros", "survival")
  }

  /** Nelson–Aalen cumulative hazard — [[kaplanMeier]]'s additive
    * companion: H(t) = Σ_{tᵢ ≤ t} dᵢ/nᵢ. Where KM answers "what fraction
    * survives to t", the cumulative hazard answers "how much churn
    * pressure has accumulated by t" — near-linear H(t) means a constant
    * hazard, convexity means accelerating churn. Entirely integer
    * micros (each step is one floor of an exact-longs division, summed
    * exactly), so no boundary transcendental at all; same plan shape as
    * KM (one duration groupBy, cumulative windows on the model-sized
    * distinct-duration table).
    */
  def nelsonAalen(df: DataFrame, durationCol: String,
      eventCol: String): DataFrame = {
    // Same null-duration exclusion as kaplanMeier (engine-dependent NULL
    // ordering would skew the cumulative risk counts).
    val obs = df.filter(col(durationCol).isNotNull)
    val agg = obs
      .groupBy(col(durationCol).cast("long").as("t"))
      .agg(
        sum(when(col(eventCol) === 1, 1L).otherwise(0L)).as("d"),
        count(lit(1)).as("c"))
    val total = obs.agg(count(lit(1)).as("_n"))
    val wOrd = Window.orderBy(col("t"))
    agg
      .withColumn("_cumc", sum(col("c")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, -1)))
      .crossJoin(broadcast(total))
      .withColumn("n_risk", col("_n") - coalesce(col("_cumc"), lit(0L)))
      .filter(col("d") > 0)
      .withColumn("_h", expr(
        "CAST(floor(CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE) * 1e6 + 0.5) AS BIGINT)"))
      .withColumn("cum_hazard_micros", sum(col("_h")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .select("t", "d", "n_risk", "cum_hazard_micros")
  }
}
