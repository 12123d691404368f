package graft.ml

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** M12: parquet-backed offline feature store with keyed feature groups,
  * event time, monotonically increasing versions, and lineage records.
  *
  * Mirrors reference/lambda/feature_store_integration/lambda_function.py:
  * 104-266 (ingest + version bump + lineage) and :329-355 (keyed get).
  * Layout: store/<group>/v=<version>/part-*.parquet — the version is a
  * partition directory, so "latest version" reads prune to one partition.
  */
final class FeatureStore(spark: SparkSession, root: String) {
  private def groupDir(group: String) = s"$root/$group"

  def versions(group: String): Seq[Int] = {
    val dir = new java.io.File(groupDir(group))
    if (!dir.exists()) Seq.empty
    else dir.listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("v="))
      .map(_.getName.stripPrefix("v=").toInt).sorted
  }

  def latestVersion(group: String): Option[Int] = versions(group).lastOption

  /** Ingest a feature frame as a new version; stamps event_time if absent.
    * Returns the new version number.
    */
  def ingest(group: String, df: DataFrame, keyCol: String,
      eventTime: java.time.LocalDateTime): Int = {
    require(df.columns.contains(keyCol), s"missing key column $keyCol")
    val v = latestVersion(group).getOrElse(0) + 1
    val stamped =
      if (df.columns.contains("event_time")) df
      else df.withColumn("event_time", to_timestamp(lit(eventTime.format(
        java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")))))
    stamped.write.mode(SaveMode.ErrorIfExists).parquet(s"${groupDir(group)}/v=$v")
    appendLineage(group, v, df.count(), keyCol)
    v
  }

  /** Latest (or pinned) version of a feature group. */
  def read(group: String, version: Option[Int] = None): DataFrame = {
    val v = version.orElse(latestVersion(group))
      .getOrElse(throw new IllegalArgumentException(s"no versions for $group"))
    spark.read.parquet(s"${groupDir(group)}/v=$v")
  }

  /** "Online" get: keyed lookup against the latest version. At scale this is
    * a broadcast-join of the key set, not a collect of the store.
    */
  def getByKeys(group: String, keyCol: String, keys: Seq[Any]): DataFrame =
    read(group).filter(col(keyCol).isin(keys: _*))

  /** Lineage: one record per ingest (group, version, rows, key, written_at
    * versions are the audit trail — deliberately append-only).
    */
  private def appendLineage(group: String, version: Int, rows: Long, keyCol: String): Unit = {
    val line = s"""{"group":"$group","version":$version,"rows":$rows,"key":"$keyCol"}"""
    val p = java.nio.file.Paths.get(s"$root/_lineage.jsonl")
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, line + "\n",
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
  }

  def lineage(): Seq[String] = {
    val p = java.nio.file.Paths.get(s"$root/_lineage.jsonl")
    if (!java.nio.file.Files.exists(p)) Seq.empty
    else scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(p)).asScala.toSeq
  }
}
