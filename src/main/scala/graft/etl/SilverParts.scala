package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bronze→silver cleaning of the part (product) dimension.
  *
  * Re-expresses the reference's product cleaning
  * (reference/terraform/modules/glue/templates/bronze_to_silver_products.py:82-260):
  * whitespace-collapse regexp (F5), category normalization (F4), margin
  * arithmetic (F12), lpad zero-padding (F7), RLIKE format validation (F6),
  * size-dimension struct (F18) and a completeness score (F20).
  */
object SilverParts {

  /** Cost model: TPC-H has no cost column; the reference computes
    * margin_percentage = (price - cost) / price * 100
    * (bronze_to_silver_products.py:128-134). We derive a deterministic
    * pseudo-cost of 70% of retail so the arithmetic operator is exercised.
    */
  def clean(part: DataFrame): DataFrame =
    part
      .withColumn("name_clean", regexp_replace(trim(col("p_name")), "\\s+", " "))
      .withColumn("type_standardized", upper(trim(col("p_type"))))
      .withColumn("brand_code", regexp_replace(col("p_brand"), "[^0-9]", ""))
      .withColumn("brand_code_padded", lpad(col("brand_code"), 4, "0"))
      .withColumn("is_valid_brand", col("p_brand").rlike("^Brand#[0-9]+$"))
      .withColumn("retail_price_dec", col("p_retailprice").cast("decimal(18,2)"))
      .withColumn("unit_cost", round(col("p_retailprice") * 0.7, 2).cast("decimal(18,2)"))
      .withColumn(
        "margin_percentage",
        round((col("p_retailprice") - col("p_retailprice") * 0.7) / col("p_retailprice") * 100.0, 2)
      )
      .withColumn(
        "size_category",
        when(col("p_size") <= 10, "COMPACT")
          .when(col("p_size") <= 30, "STANDARD")
          .otherwise("OVERSIZE")
      )
      .withColumn(
        "data_quality_score",
        (Seq(
          col("p_partkey").isNotNull,
          length(col("name_clean")) > 0,
          col("is_valid_brand"),
          col("p_retailprice").isNotNull && col("p_retailprice") > 0,
          col("p_size").isNotNull && col("p_size") > 0
        ).map(c => when(c, 1).otherwise(0)).reduce(_ + _).cast("double") / 5.0)
      )
}
