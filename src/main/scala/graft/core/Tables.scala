package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Thin catalog over a scale-factor directory of parquet tables.
  *
  * The reference reads "cataloged" tables through Glue's catalog
  * (bronze_to_silver_orders.py:63-80, silver_to_gold_sales_summary.py:67-103);
  * here the catalog IS the directory layout — parquet is self-describing, so
  * `spark.read.parquet` gives schema inference for free (SURVEY.md §1.3).
  * Filters/projections applied downstream are pushed into these scans by
  * Catalyst (PushedFilters / ReadSchema), which is what makes the layer
  * viable at 100 TB: the scan only materializes the columns and row groups a
  * query needs.
  */
final case class Tables(spark: SparkSession, dir: String) {
  def apply(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def lineitem: DataFrame   = apply("lineitem")
  def orders: DataFrame     = apply("orders")
  def customer: DataFrame   = apply("customer")
  def supplier: DataFrame   = apply("supplier")
  def part: DataFrame       = apply("part")
  def nation: DataFrame     = apply("nation")
  def region: DataFrame     = apply("region")
  def events: DataFrame     = apply("events")
  def documents: DataFrame  = apply("documents")
  def embeddings: DataFrame = apply("embeddings")
}

/** Engine-wide determinism knobs (SURVEY.md §7.4 risk 1).
  *
  * The reference leans on wall-clock (`current_date`, driver-side
  * `datetime.now()` — bronze_to_silver_orders.py:52-53,143) and unseeded
  * `rand()` (silver_to_gold_ml_features.py:484-489). Every graft operator
  * that needs "now" or randomness takes it from here instead, so results are
  * reproducible and oracle-checkable.
  */
final case class GraftConf(
    asOfDate: java.time.LocalDate = java.time.LocalDate.parse("2026-01-01"),
    seed: Long = 42L
)

object GraftConf {
  val default: GraftConf = GraftConf()
}
