package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Versioned commit-after-write store for STANDING artifacts (pair
  * graphs, cluster tables, shingle stats, suffix-ladder dictionaries):
  * each commit writes every table under `root/v<N>/<name>/` and ONLY
  * THEN creates the `root/v<N>/_COMMIT` marker — the reference's
  * at-least-once contract (advance the watermark only after the write
  * lands, `lambda/snowflake_extractor/watermark_manager.py:211-259`)
  * applied to artifact maintenance. Readers resolve the highest version
  * THAT HAS a marker, so a writer dying mid-commit leaves the previous
  * version live and the half-written directory inert; re-running the
  * append overwrites it (idempotent recovery, no cleanup step needed).
  *
  * Hadoop-FS based (local paths in tests, HDFS/S3 in production).
  */
object ArtifactStore {

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val VersionRe = "v(\\d+)".r

  /** Highest committed version under `root`, if any. */
  def latestVersion(spark: SparkSession, root: String): Option[Long] = {
    val f = fs(spark, root)
    val rootPath = new Path(root)
    if (!f.exists(rootPath)) return None
    val versions = f.listStatus(rootPath).iterator
      .filter(_.isDirectory)
      .flatMap(s => s.getPath.getName match {
        case VersionRe(n) => Some(n.toLong)
        case _ => None
      })
      .filter(v => f.exists(new Path(s"$root/v$v/_COMMIT")))
      .toSeq
    if (versions.isEmpty) None else Some(versions.max)
  }

  /** Write every table, THEN the marker. Returns the committed version.
    *
    * `meta` rides INSIDE the marker file (`key\tvalue` lines, keys and
    * values must be newline/tab-free) — so metadata becomes visible
    * atomically with the commit itself. Appenders use it to record which
    * batch a version covers (e.g. a batch high-watermark), turning
    * at-least-once replays into exactly-once skips ([[readMeta]]).
    *
    * A pre-existing `v<N>` directory (a writer that died mid-commit) is
    * deleted wholesale before the first table lands: a committed version
    * must contain ONLY the tables of the commit that published its
    * marker — per-table overwrite alone would leave a stale table behind
    * whenever the table set changed between the torn write and this one.
    *
    * SINGLE-WRITER contract: version selection (latest + 1) and the
    * delete-then-write recovery both assume at most one writer per root
    * at a time — two concurrent appenders could pick the same v<N>,
    * delete each other's in-flight tables, and publish a marker over a
    * mixed directory. The nightly/streaming maintenance loops satisfy
    * this by construction (one scheduled run per store;
    * foreachBatch serializes micro-batches); a deployment with
    * competing writers must serialize them externally (a scheduler
    * lock or a lease file) before calling commit / the
    * appendBatchCommitted family.
    */
  def commit(spark: SparkSession, root: String,
      tables: Map[String, DataFrame],
      meta: Map[String, String] = Map.empty): Long = {
    require(tables.nonEmpty, "nothing to commit")
    meta.foreach { case (k, mv) =>
      require(!k.exists(c => c == '\n' || c == '\t') &&
          !mv.exists(c => c == '\n' || c == '\t'),
        s"meta keys/values must be newline/tab-free: $k")
    }
    val f = fs(spark, root)
    val v = latestVersion(spark, root).getOrElse(0L) + 1L
    val vDir = new Path(s"$root/v$v")
    if (f.exists(vDir)) f.delete(vDir, true)
    tables.foreach { case (name, df) =>
      require(name.nonEmpty && !name.startsWith("_"), s"bad table name $name")
      df.write.mode(SaveMode.Overwrite).parquet(s"$root/v$v/$name")
    }
    // the point of the design: the marker is LAST — a crash anywhere
    // above leaves the previous committed version the readable one
    val out = f.create(new Path(s"$root/v$v/_COMMIT"), true)
    try {
      val body = meta.toSeq.sorted.map { case (k, mv) => s"$k\t$mv\n" }.mkString
      out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } finally out.close()
    v
  }

  /** The metadata recorded in a committed version's marker (empty map for
    * versions committed without metadata, None for uncommitted versions). */
  def readMeta(spark: SparkSession, root: String,
      version: Long): Option[Map[String, String]] = {
    val f = fs(spark, root)
    val marker = new Path(s"$root/v$version/_COMMIT")
    if (!f.exists(marker)) return None
    val in = f.open(marker)
    val body = try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      var n = in.read(buf)
      while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
      new String(bos.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
    Some(body.split("\n").iterator.filter(_.nonEmpty).flatMap { line =>
      line.split("\t", 2) match {
        case Array(k, mv) => Some(k -> mv)
        case _ => None
      }
    }.toMap)
  }

  /** Read a table from the latest committed version. */
  def read(spark: SparkSession, root: String, name: String): Option[DataFrame] =
    latestVersion(spark, root).map(v => spark.read.parquet(s"$root/v$v/$name"))

  /** Retention: delete every version directory strictly OLDER than the
    * newest `keepLast` committed versions (torn uncommitted dirs below
    * that cutoff go too; anything at or above it is left alone — a torn
    * dir newer than the cutoff may be an in-flight writer). Returns the
    * versions deleted.
    */
  def prune(spark: SparkSession, root: String, keepLast: Int = 2): Seq[Long] = {
    require(keepLast >= 1, s"keepLast must be >= 1: $keepLast")
    val f = fs(spark, root)
    val rootPath = new Path(root)
    if (!f.exists(rootPath)) return Seq.empty
    val all = f.listStatus(rootPath).iterator
      .filter(_.isDirectory)
      .flatMap(s => s.getPath.getName match {
        case VersionRe(n) => Some(n.toLong)
        case _ => None
      }).toSeq
    val committed = all
      .filter(v => f.exists(new Path(s"$root/v$v/_COMMIT"))).sorted
    if (committed.isEmpty) return Seq.empty
    val cutoff = committed.takeRight(keepLast).head
    val victims = all.filter(_ < cutoff).sorted
    victims.foreach(v => f.delete(new Path(s"$root/v$v"), true))
    victims
  }

  /** Read a table from a specific committed version (time travel for
    * audits / reproducing a historical run). */
  def readAt(spark: SparkSession, root: String, name: String,
      version: Long): Option[DataFrame] = {
    val f = fs(spark, root)
    if (f.exists(new Path(s"$root/v$version/_COMMIT")))
      Some(spark.read.parquet(s"$root/v$version/$name"))
    else None
  }
}
