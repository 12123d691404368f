package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bronze→silver cleaning of the customer dimension.
  *
  * Re-expresses the reference's customer cleaning
  * (reference/terraform/modules/glue/templates/bronze_to_silver_customers.py:82-174):
  * string normalization lower/upper/trim (F4), regexp_replace scrubbing (F5),
  * concat-derived columns (F3), a nested STRUCT profile (F18) with dot-path
  * access back out (F19), rename (F21), and a completeness score (F20).
  *
  * TPC-H customer stands in for the reference's customer table: c_name plays
  * full_name, c_mktsegment plays segment, c_acctbal plays a numeric profile
  * field.
  */
object SilverCustomers {

  def clean(customer: DataFrame): DataFrame =
    customer
      // c_name looks like "Customer#000000001" — split into a label and a
      // zero-padded customer number (regexp_replace, F5).
      .withColumn("name_normalized", lower(trim(col("c_name"))))
      .withColumn("customer_number", regexp_replace(col("c_name"), "[^0-9]", ""))
      .withColumn("segment_standardized", upper(trim(col("c_mktsegment"))))
      .withColumn("display_name",
        concat(col("segment_standardized"), lit(":"), col("name_normalized")))
      .withColumn("acctbal_dec", col("c_acctbal").cast("decimal(18,2)"))
      .withColumn("is_positive_balance", col("c_acctbal") > 0)
      // Nested profile struct (F18): the reference builds address_standardized
      // the same way (bronze_to_silver_customers.py:126-135).
      .withColumn("profile", struct(
        col("segment_standardized").as("segment"),
        col("acctbal_dec").as("acctbal"),
        col("c_nationkey").cast("int").as("nation_key")
      ))
      // Dot-path access (F19) — mirrors silver_to_gold_customer_analytics.py:278-281.
      .withColumn("profile_segment", col("profile.segment"))
      .withColumn(
        "data_quality_score",
        (Seq(
          col("c_custkey").isNotNull,
          col("name_normalized").isNotNull && length(col("name_normalized")) > 0,
          col("segment_standardized").isin("BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"),
          col("c_acctbal").isNotNull
        ).map(c => when(c, 1).otherwise(0)).reduce(_ + _).cast("double") / 4.0)
      )
      .withColumnRenamed("c_mktsegment", "mktsegment_raw")
}
