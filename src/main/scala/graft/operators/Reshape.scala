package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Wide→long reshaping (unpivot / melt) — the inverse of the engine's
  * explicit-value pivot ([[graft.gold.CustomerAnalytics]] A5).
  *
  * The reference pivots metrics wide for its gold marts
  * (reference/terraform/modules/glue/templates/silver_to_gold_sales_summary.py:214-229)
  * but has no way back; ML feature interchange and metric-ledger sinks
  * both want the long form (one (entity, metric, value) row per cell).
  *
  * Implemented on Spark's native `unpivot` (the Catalyst `Unpivot` node —
  * a zero-shuffle projection: each input row expands to `values.size`
  * output rows in place; no explode/join, fully codegen'd). At any scale
  * the cost is the row fan-out itself, which is the answer's size.
  */
object Reshape {

  /** Melt `values` columns into (`varName`, `valName`) long rows, keyed
    * by `ids`.
    *
    * `dropNulls = true` (default) removes cells whose value is null —
    * exactly the rows an aggregation dual (groupBy over the long form)
    * never produces, so `melt(pivot(x)) ≡ groupBy(x)` holds; pass false
    * to keep the full dense grid (every id × every value column).
    */
  def melt(df: DataFrame, ids: Seq[String], values: Seq[String],
      varName: String, valName: String, dropNulls: Boolean = true): DataFrame = {
    require(values.nonEmpty, "need at least one value column to melt")
    val long = df.unpivot(ids.map(col).toArray, values.map(col).toArray,
      varName, valName)
    if (dropNulls) long.filter(col(valName).isNotNull) else long
  }
}
