package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — the multi-dimensional data-layout
  * optimization of lakehouse OPTIMIZE ZORDER: interleaving the bits of
  * two dimension keys gives a single sort key under which rows close in
  * EITHER dimension land close on disk, so min/max file statistics prune
  * scans filtered on either column (a plain sort only prunes its leading
  * column).
  *
  * The 16-bit spread uses the classic magic-number shifts — integer-only
  * arithmetic, bit-identical on every engine. Codes fit comfortably in a
  * BIGINT (32 interleaved bits).
  */
object ZOrder {

  private val Steps = Seq((8, 0x00FF00FFL), (4, 0x0F0F0F0FL),
    (2, 0x33333333L), (1, 0x55555555L))

  /** SQL spreading the low 16 bits of `e` with zeros between them
    * (0b1011 → 0b01000101), built for either dialect via `shl`. */
  private def spread(e: String, shl: (String, Int) => String): String =
    Steps.foldLeft(s"(($e) & 65535)") { case (x, (s, m)) =>
      s"((($x) | ${shl(x, s)}) & $m)"
    }

  private def mortonSql(a: String, b: String,
      shl: (String, Int) => String): String =
    s"(${spread(a, shl)} | ${shl(spread(b, shl), 1)})"

  /** The Morton interleave as a Spark SQL string over two expressions
    * (each clamped to its low 16 bits). */
  def mortonSparkSql(a: String, b: String): String =
    mortonSql(a, b, (x, s) => s"shiftleft($x, $s)")

  /** The identical formula in DuckDB syntax, for oracle queries. */
  def mortonDuckDbSql(a: String, b: String): String =
    mortonSql(a, b, (x, s) => s"(($x) << $s)")

  /** Adds `outCol` = morton(colA, colB) — a pure projection. Inputs must
    * be non-negative; only the low 16 bits of each participate. */
  def withZOrderKey(df: DataFrame, colA: String, colB: String,
      outCol: String = "z_key"): DataFrame =
    df.withColumn(outCol, expr(mortonSparkSql(colA, colB)))

  /** The OPTIMIZE ZORDER write shape: range-partition by the Morton key
    * (so files cover disjoint code ranges → tight min/max stats on BOTH
    * dimensions) and sort within partitions. `numFiles` bounds output
    * file count; the range exchange samples the key distribution, no
    * driver materialization.
    */
  def clusterByZOrder(df: DataFrame, colA: String, colB: String,
      numFiles: Int, outCol: String = "z_key"): DataFrame = {
    require(numFiles > 0, "numFiles must be positive")
    withZOrderKey(df, colA, colB, outCol)
      .repartitionByRange(numFiles, col(outCol))
      .sortWithinPartitions(outCol)
  }
}
