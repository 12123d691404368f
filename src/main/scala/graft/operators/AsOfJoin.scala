package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of (point-in-time) join — the feature-store primitive: for
  * every left row, attach the LATEST right row with `right.ts <= left.ts`
  * on the same key (attribution, point-in-time-correct feature lookup,
  * slowly-changing reference data).
  *
  * Scale shape: the naive formulation is a range join
  * (`l.key = r.key AND r.ts <= l.ts` + a per-row argmax), which Spark
  * plans as a per-key quadratic nested loop. This implementation uses the
  * union+window form instead: tag both sides, union, and carry the last
  * seen right row forward with `last(..., ignoreNulls)` over a
  * (key, ts)-ordered running window — ONE shuffle on the key, one sort,
  * one linear scan, no pair explosion at any scale.
  */
object AsOfJoin {

  /** Backward as-of join, inclusive (`right.ts == left.ts` matches).
    *
    * Output: every left column, plus `asof_ts` (the matched right
    * timestamp) and each non-key right column prefixed `asof_` — all null
    * when no right row precedes the left row. The matched columns always
    * come from ONE right row (they ride in a single struct payload), even
    * when some of its fields are null.
    *
    * `right` must be unique per (keyCol, tsCol) — pre-aggregate it
    * otherwise — or the row carried forward among timestamp ties is
    * ordering-dependent.
    */
  def asOfBackward(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String): DataFrame = {
    val rightVals = right.columns.filter(c => c != keyCol && c != tsCol).toSeq
    val payload = struct(
      col(tsCol).as("asof_ts") +: rightVals.map(c => col(c).as(s"asof_$c")): _*)
    val l = left.withColumn("_side", lit(0))
    val r = right
      .select(col(keyCol), col(tsCol), payload.as("_payload"), lit(1).as("_side"))
    // right rows sort BEFORE left rows at equal ts (_side desc), making the
    // join inclusive; the running window then carries the latest right
    // row's payload forward into every subsequent left row of the key
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).asc, col("_side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchedCols = ("asof_ts" +: rightVals.map(c => s"asof_$c"))
      .map(n => col(s"_m.$n").as(n))
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("_m", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 0)
      .select(left.columns.map(col).toSeq ++ matchedCols: _*)
  }
}
