package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Q8: extraction-side validation — the checks the reference runs on every
  * extracted batch BEFORE it lands in bronze
  * (reference/lambda/snowflake_extractor/watermark_manager.py:306-392):
  * minimum row count, required columns present, per-column null percentage
  * caps, and duplicate key check. All data-touching checks fuse into one
  * aggregation pass plus one duplicate groupBy.
  */
object ExtractionValidator {

  final case class Config(
      minRows: Long = 1,
      requiredColumns: Seq[String] = Seq.empty,
      nonNullColumns: Map[String, Double] = Map.empty, // column -> max null pct
      uniqueKeys: Seq[String] = Seq.empty)

  final case class Violation(check: String, detail: String)
  final case class Result(rows: Long, violations: Seq[Violation]) {
    def valid: Boolean = violations.isEmpty
  }

  def validate(df: DataFrame, config: Config): Result = {
    val vs = scala.collection.mutable.ArrayBuffer.empty[Violation]

    val missing = config.requiredColumns.filterNot(df.columns.contains)
    missing.foreach(c => vs += Violation("required_column", s"missing: $c"))

    val nullCols = config.nonNullColumns.keys.toSeq.filter(df.columns.contains)
    val aggs = count(lit(1)).as("_rows") +: nullCols.zipWithIndex.map { case (c, i) =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"_n$i")
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val rows = row.getLong(0)

    if (rows < config.minRows)
      vs += Violation("min_rows", s"$rows < ${config.minRows}")
    for ((c, i) <- nullCols.zipWithIndex) {
      val pct = if (rows == 0) 0.0 else row.getLong(i + 1).toDouble / rows * 100.0
      val cap = config.nonNullColumns(c)
      if (pct > cap) vs += Violation("null_pct", f"$c: $pct%.2f%% > $cap%.2f%%")
    }
    if (config.uniqueKeys.nonEmpty && config.uniqueKeys.forall(df.columns.contains)) {
      val dup = DataQuality.duplicateCheck(df, config.uniqueKeys).head()
      val dupRows = dup.getAs[Long]("duplicate_rows")
      if (dupRows > 0)
        vs += Violation("duplicate_keys", s"$dupRows rows in duplicate key groups")
    }
    Result(rows, vs.toSeq)
  }
}
