package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join — "which intervals contain this point":
  * event-in-session attribution, date-in-promo-window, IP-in-CIDR-block
  * style lookups. The as-of join ([[AsOfJoin]]) answers "the latest row
  * at or before t"; this answers containment against intervals that
  * OVERLAP arbitrarily, which the union+window trick cannot express.
  *
  * Scale shape: the naive `p.v BETWEEN i.lo AND i.hi` is a pure theta
  * join — Spark plans BroadcastNestedLoop (or a cartesian) and every
  * point scans every interval. This is the standard bucketed prejoin
  * instead (the batch form of Flink's interval join): explode each
  * interval into the coarse buckets it touches (⌈span/width⌉ + 1 copies
  * — bounded, asserted below), map each point to its ONE bucket, hash
  * equi-join on the bucket, then apply the exact BETWEEN as a residual
  * filter. One shuffle on the bucket key per side, no pair explosion:
  * candidates are only point×interval pairs whose buckets collide. A
  * (point, interval) pair can meet at most once — the point lives in
  * exactly one bucket — so no dedup pass is needed.
  */
object RangeJoin {

  /** Inner point-in-interval join on numeric bucket units (days for
    * dates, seconds for timestamps — anything `bucketUnits` maps to a
    * LONG). Output: every point column, plus every interval column, one
    * row per (point, containing interval); containment is inclusive on
    * both ends. Null points or bounds simply never match (bucket or
    * BETWEEN is null), matching SQL BETWEEN semantics.
    *
    * @param bucketUnits column → integer position on the shared axis
    *                    (e.g. `datediff(c, lit("1970-01-01"))` for dates,
    *                    `unix_timestamp(c)` for timestamps)
    * @param bucketWidth bucket width in those units — pick it near the
    *                    TYPICAL interval span: wider buckets mean fewer
    *                    interval copies but more residual-filter misses
    *                    per bucket collision
    * @param maxCopies   per-interval copy bound; an interval exploding
    *                    into more buckets than this (span ≫ width — a
    *                    mis-chosen width, a silent row blowup at scale)
    *                    raises per-row instead of degrading
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      ptCol: String, loCol: String, hiCol: String,
      bucketUnits: Column => Column, bucketWidth: Long,
      maxCopies: Int = 64): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(maxCopies > 0, "maxCopies must be positive")
    val iu = intervals
      // a malformed interval (lo > hi) can never satisfy the BETWEEN —
      // drop it here, or sequence() would descend and emit bucket copies
      // that only ever fail the residual filter
      .filter(col(loCol) <= col(hiCol))
      .withColumn("_lo_b",
        floor(bucketUnits(col(loCol)).cast("double") / lit(bucketWidth)).cast("long"))
      .withColumn("_hi_b",
        floor(bucketUnits(col(hiCol)).cast("double") / lit(bucketWidth)).cast("long"))
      .withColumn("_hi_b", when(col("_hi_b") - col("_lo_b") >= lit(maxCopies.toLong),
          raise_error(concat(
            lit(s"RangeJoin: interval explodes into > $maxCopies buckets of width $bucketWidth: "),
            col(loCol).cast("string"), lit(".."), col(hiCol).cast("string"))))
        .otherwise(col("_hi_b")))
      .withColumn("_bucket", explode(expr("sequence(_lo_b, _hi_b)")))
      .drop("_lo_b", "_hi_b")
    points
      .withColumn("_bucket",
        floor(bucketUnits(col(ptCol)).cast("double") / lit(bucketWidth)).cast("long"))
      .join(iu, Seq("_bucket"))
      .filter(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("_bucket")
  }
}
