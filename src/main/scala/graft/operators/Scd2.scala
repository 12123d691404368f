package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.GraftConf

/** Slowly-changing-dimension type 2 and duplicate-arrival handling.
  *
  * The reference only STUBS SCD2 — it sets effective_date / end_date /
  * is_current on every load without merging history
  * (reference/terraform/modules/glue/templates/bronze_to_silver_customers.py:159-162),
  * and handles late/duplicate arrivals with nothing beyond the watermark
  * `>` predicate (SURVEY.md §2.10 I5). [[withScd2Columns]] reproduces that
  * parity behavior; [[merge]] and [[dedupKeepFirst]] are the honest
  * versions a production dimension needs.
  */
object Scd2 {

  /** Reference-parity SCD2 columns (stub semantics). */
  def withScd2Columns(df: DataFrame, conf: GraftConf = GraftConf.default): DataFrame = {
    val asOf = lit(java.sql.Date.valueOf(conf.asOfDate))
    df.withColumn("effective_date", asOf)
      .withColumn("end_date", lit(null).cast("date"))
      .withColumn("is_current", lit(true))
  }

  /** I5: keep exactly one row per key — the first by `orderCol` (earliest
    * arrival wins, deterministic tie-break on all key columns). Window is
    * partitioned by the key: shuffles once on the key, no global sort.
    */
  def dedupKeepFirst(df: DataFrame, keys: Seq[String], orderCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(orderCol).asc +: keys.map(col(_).asc): _*)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** Real SCD2 merge: close current rows whose tracked attributes changed
    * (end_date = asOf, is_current = false) and append the incoming version
    * (effective_date = asOf, is_current = true). Both sides shuffle once on
    * the key; unchanged rows pass through untouched.
    *
    * `current` must carry effective_date/end_date/is_current; `incoming` is
    * the new snapshot keyed by `key`.
    */
  def merge(current: DataFrame, incoming: DataFrame, key: String,
      trackedCols: Seq[String], conf: GraftConf = GraftConf.default): DataFrame = {
    val asOf = lit(java.sql.Date.valueOf(conf.asOfDate))
    val changeCond = trackedCols
      .map(c => not(col(s"cur.$c") <=> col(s"inc.$c")))
      .reduce(_ || _)

    // History rows never participate in change detection — joining incoming
    // against ALL versions would both multiply incoming rows and misread
    // old versions as "changes". Only the open version of each key joins.
    val history = current.filter(!col("is_current"))
    val cur = current.filter(col("is_current")).alias("cur")
    val inc = withScd2Columns(incoming, conf).alias("inc")

    val joined = cur.join(inc, col(s"cur.$key") === col(s"inc.$key"), "full_outer")
      .withColumn("_changed", when(
        col(s"cur.$key").isNotNull && col(s"inc.$key").isNotNull, changeCond)
        .otherwise(lit(false)))

    val outCols = current.columns

    // 1. current rows with no change (or absent from incoming): keep as-is
    val kept = joined.filter(col(s"cur.$key").isNotNull && !col("_changed"))
      .select(outCols.toIndexedSeq.map(c => col(s"cur.$c")): _*)
    // 2. current rows whose attributes changed: close them
    val closed = joined.filter(col("_changed"))
      .select(outCols.toIndexedSeq.map(c => col(s"cur.$c")): _*)
      .withColumn("end_date", asOf)
      .withColumn("is_current", lit(false))
    // 3. incoming rows that are new keys or changed versions: append open
    val opened = joined.filter(col(s"inc.$key").isNotNull &&
        (col(s"cur.$key").isNull || col("_changed")))
      .select(outCols.toIndexedSeq.map(c => col(s"inc.$c")): _*)

    history.unionByName(kept).unionByName(closed).unionByName(opened)
  }
}
