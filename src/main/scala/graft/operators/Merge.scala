package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** General MERGE (upsert): the three-way matched / not-matched /
  * not-matched-by-source reconciliation every warehouse load needs.
  *
  * The reference only ever OVERWRITES silver tables per run
  * (reference/terraform/modules/glue/templates/bronze_to_silver_customers.py:159-162
  * stubs SCD2 and rewrites the snapshot; incremental arrivals are handled
  * by the watermark `>` predicate alone). [[Scd2.merge]] covers the
  * history-keeping dimension case; this operator is the plain upsert the
  * same pipelines need for fact tables: update matched rows in place,
  * insert new keys, and optionally delete keys the source no longer
  * carries (the `WHEN NOT MATCHED BY SOURCE THEN DELETE` arm of ANSI
  * MERGE).
  *
  * Plan shape: ONE full-outer shuffle join on the key, then a pure
  * projection — no per-arm scans, no union of three filtered passes. Both
  * sides shuffle once; at 100 TB the join is the unavoidable cost and
  * everything else is free. AQE handles a skewed key; a small source side
  * broadcast-joins automatically.
  */
object Merge {

  /** Apply MERGE semantics of `source` into `target` on `key`.
    *
    *  - matched (key in both): `updateCols` take the source value, every
    *    other column keeps the target value → tagged `update`
    *  - not matched (source-only key): the source row is inserted →
    *    tagged `insert`
    *  - not matched by source (target-only key): kept (`keep`) by
    *    default, removed when `deleteUnmatched` → never emitted
    *
    * `source` must carry every target column (a conformed snapshot) and
    * be unique per key — enforced structurally for columns; key
    * uniqueness is the caller's contract (a duplicate source key would
    * fan out the join exactly as ANSI MERGE rejects).
    *
    * Output schema = target schema + `merge_action` tag (drop it with
    * `.drop` if unwanted).
    */
  def merge(target: DataFrame, source: DataFrame, key: String,
      updateCols: Seq[String], deleteUnmatched: Boolean = false): DataFrame = {
    val missing = target.columns.filterNot(source.columns.contains)
    require(missing.isEmpty,
      s"source must carry every target column; missing: ${missing.mkString(", ")}")
    require(updateCols.forall(target.columns.contains),
      s"updateCols must be target columns: ${updateCols.mkString(", ")}")

    val t = target.alias("t")
    val s = source.alias("s")
    val joined = t.join(s, col(s"t.$key") === col(s"s.$key"), "full_outer")

    val matched    = col(s"t.$key").isNotNull && col(s"s.$key").isNotNull
    val insertOnly = col(s"t.$key").isNull

    val outCols = target.columns.toIndexedSeq.map { c =>
      if (c == key) coalesce(col(s"t.$key"), col(s"s.$key")).as(key)
      else if (updateCols.contains(c))
        // matched AND inserted rows both read the source; only
        // target-only rows keep the old value
        when(col(s"s.$key").isNotNull, col(s"s.$c"))
          .otherwise(col(s"t.$c")).as(c)
      else
        when(insertOnly, col(s"s.$c")).otherwise(col(s"t.$c")).as(c)
    }
    val action = when(matched, lit("update"))
      .when(insertOnly, lit("insert"))
      .otherwise(lit("keep"))

    val merged = joined.select(outCols :+ action.as("merge_action"): _*)
    if (deleteUnmatched) merged.filter(col("merge_action") =!= "keep")
    else merged
  }
}
