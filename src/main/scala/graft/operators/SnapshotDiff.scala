package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-based reconciliation between two versions of a table — the
  * snapshot-diff a pipeline runs to audit what an incremental load
  * actually changed (and to derive a CDC stream from two full snapshots
  * when the source system has no changelog; cf. the reference's
  * incremental watermark loads, glue/jobs/bronze_to_silver_orders.py —
  * it advances watermarks but never audits the delta itself).
  *
  * Output: one row per key that DIFFERS — change_type ∈
  * {added, removed, changed} plus `changed_cols`, the comma-joined list
  * of value columns whose content changed (schema order; null-safe
  * compare, so null→value and value→null both count). Unchanged keys are
  * deliberately absent: at 100 TB the diff is the small output, and
  * emitting unchanged rows would rewrite the table.
  *
  * Scale shape: ONE full-outer sort-merge join on the key columns (the
  * single unavoidable shuffle), then a pure projection; the per-column
  * comparison is a codegen'd expression, not a UDF.
  */
object SnapshotDiff {

  def diff(oldDf: DataFrame, newDf: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    require(oldDf.columns.sameElements(newDf.columns),
      s"schemas must match: ${oldDf.columns.mkString(",")} vs ${newDf.columns.mkString(",")}")
    val valCols = oldDf.columns.filterNot(keyCols.contains).toSeq
    val o = oldDf.select(keyCols.map(col) ++
      valCols.map(c => col(c).as(s"_o_$c")) :+ lit(true).as("_in_o"): _*)
    val n = newDf.select(keyCols.map(col) ++
      valCols.map(c => col(c).as(s"_n_$c")) :+ lit(true).as("_in_n"): _*)
    val j = o.join(n, keyCols, "full_outer")
    // concat_ws drops nulls in BOTH Spark and DuckDB, so the per-column
    // markers compose into the changed list without an array round-trip
    val changed = concat_ws(",",
      valCols.map(c => when(not(col(s"_o_$c") <=> col(s"_n_$c")), lit(c))): _*)
    j.withColumn("change_type",
        when(col("_in_o").isNull, lit("added"))
          .when(col("_in_n").isNull, lit("removed"))
          .otherwise(lit("changed")))
      .withColumn("changed_cols",
        when(col("change_type") === "changed", changed).otherwise(lit("")))
      .filter(col("change_type") =!= "changed" || col("changed_cols") =!= "")
      .select(keyCols.map(col) :+ col("change_type") :+ col("changed_cols"): _*)
  }

  /** Schema-evolution report between two table versions: one row per
    * column that was added, removed, or retyped — the metadata companion
    * to [[diff]] a pipeline runs before attempting the row-level diff
    * (a retyped key column makes the row diff meaningless). Pure
    * driver-side metadata — no job is launched.
    */
  def schemaDiff(oldDf: DataFrame, newDf: DataFrame): DataFrame = {
    val o = oldDf.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    val n = newDf.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    val rows: Seq[(String, String, String, String)] =
      (n.keySet -- o.keySet).toSeq.sorted.map(c => (c, "added", null: String, n(c))) ++
      (o.keySet -- n.keySet).toSeq.sorted.map(c => (c, "removed", o(c), null: String)) ++
      (o.keySet & n.keySet).toSeq.sorted.collect {
        case c if o(c) != n(c) => (c, "retyped", o(c), n(c))
      }
    val spark = oldDf.sparkSession
    import spark.implicits._
    rows.toDF("column", "change_type", "old_type", "new_type")
  }
}
