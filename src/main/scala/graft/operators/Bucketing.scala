package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed co-located joins: pre-shuffle both sides of a recurring join
  * into the same bucket layout so every subsequent join on the bucket key
  * runs WITHOUT a shuffle exchange — at 100 TB, repeatedly joining
  * fact×dim on the same key makes the one-time bucketed write pay for
  * itself on the first re-join.
  *
  * (Spark bucketing requires a catalog table, hence saveAsTable; the
  * in-memory catalog + a warehouse dir is sufficient — no Hive needed.)
  */
object Bucketing {

  /** Write a frame as a bucketed, sorted catalog table. With `path` the
    * table is external at `path/table` (keeps the default warehouse dir —
    * the process working directory in local mode — clean).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int, sortCols: Seq[String] = Seq.empty,
      path: Option[String] = None): Unit = {
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
    val ws = if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    path.foreach(p => ws.option("path", s"$p/$table"))
    ws.format("parquet").saveAsTable(table)
  }

  /** Join two same-bucketed tables on the bucket key — plan contains no
    * shuffle Exchange on either side (verify with hasShuffleFreeJoin).
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String, joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key), joinType)

  /** True when the executed plan's join has no shuffle exchange feeding it. */
  def hasShuffleFreeJoin(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan.toString
    !plan.contains("Exchange hashpartitioning")
  }
}
