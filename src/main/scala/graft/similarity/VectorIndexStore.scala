package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet persistence for ANN index artifacts — the build-once /
  * query-many contract that matters at corpus scale: a 100 TB corpus
  * trains its coarse centroids, PQ codebooks and code table in one
  * (expensive) indexing job, writes them here, and every retrieval job
  * after that loads model-sized artifacts plus the compressed code table
  * instead of re-running KMeans over the corpus. All artifacts are plain
  * DataFrames (no opaque model binaries), so they are engine-portable
  * and inspectable like any other table.
  */
object VectorIndexStore {

  def savePq(path: String, books: DataFrame, codes: DataFrame): Unit = {
    books.write.mode("overwrite").parquet(s"$path/books")
    codes.write.mode("overwrite").parquet(s"$path/codes")
  }

  def loadPq(spark: SparkSession, path: String): (DataFrame, DataFrame) =
    (spark.read.parquet(s"$path/books"), spark.read.parquet(s"$path/codes"))

  def saveIvfPq(path: String, centroids: DataFrame, books: DataFrame,
      codes: DataFrame): Unit = {
    centroids.write.mode("overwrite").parquet(s"$path/centroids")
    savePq(path, books, codes)
  }

  def loadIvfPq(spark: SparkSession, path: String): (DataFrame, DataFrame, DataFrame) = {
    val (books, codes) = loadPq(spark, path)
    (spark.read.parquet(s"$path/centroids"), books, codes)
  }
}
