package graft.core

import org.apache.spark.sql.{AnalysisException, DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Parquet read with an explicit first-run contract: a path that does not
  * exist yet (the bootstrap case of an incremental loop) yields an empty
  * frame of the given schema; EVERY OTHER failure — permission errors,
  * corrupted footers, transient FS faults — rethrows. Swallowing those as
  * "bootstrap" would silently run an append against an empty corpus and
  * commit an artifact version missing real edges (a quality hole no one
  * alerts on), where the reference's extraction loop fails loudly and
  * retries under its at-least-once mark
  * (`lambda/snowflake_extractor/watermark_manager.py:211-259`).
  */
object ParquetIo {

  def readOrEmpty(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    try spark.read.parquet(path)
    catch {
      case e: AnalysisException if isPathNotFound(e) => empty(spark, schema)
      case _: java.io.FileNotFoundException => empty(spark, schema)
    }

  private def isPathNotFound(e: AnalysisException): Boolean =
    Option(e.getCondition).contains("PATH_NOT_FOUND") ||
      e.getMessage.contains("PATH_NOT_FOUND") ||
      e.getMessage.contains("Path does not exist")

  private def empty(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
}
