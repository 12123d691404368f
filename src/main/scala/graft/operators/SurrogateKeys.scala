package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Surrogate-key generation (W1).
  *
  * The reference generates surrogate keys with
  * `row_number().over(Window.orderBy(...))`
  * (reference/terraform/modules/glue/templates/bronze_to_silver_orders.py:209-214,
  * bronze_to_silver_customers.py:169-174) — a GLOBAL, unpartitioned window.
  * That is fine at test scale but serializes the whole table through one task
  * at 100 TB (SURVEY.md §7.4 risk 6). Two variants behind one semantic:
  *
  *  - [[rowNumberKeys]]: exact reference parity (global window). Use only for
  *    small frames / oracle checks.
  *  - [[scalableKeys]]: SAME output (dense 1..N keys in the given order), but
  *    computed with a distributed range-sort: repartitionByRange keeps the
  *    sort parallel, per-partition row_number is local, and the per-partition
  *    offsets are a tiny driver-side cumulative sum (numPartitions values,
  *    not data rows) broadcast back. No single-partition shuffle anywhere.
  */
object SurrogateKeys {

  def rowNumberKeys(df: DataFrame, keyName: String, orderCols: Seq[Column]): DataFrame =
    df.withColumn(keyName, row_number().over(Window.orderBy(orderCols: _*)).cast("long"))

  def scalableKeys(df: DataFrame, keyName: String, orderCols: Seq[Column]): DataFrame = {
    val sorted = df.orderBy(orderCols: _*)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+ org.apache.spark.sql.types.StructField(
        keyName, org.apache.spark.sql.types.LongType, nullable = false))
    // zipWithIndex runs a per-partition count job + the main job over the
    // SAME materialized sort lineage (one partitioner instance), so indices
    // are globally consecutive and deterministic. Note repartitionByRange +
    // a second independent job would NOT be: SQL range exchanges re-sample
    // boundaries per action.
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }
}
