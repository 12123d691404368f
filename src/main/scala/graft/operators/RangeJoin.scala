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

  /** Interval×interval OVERLAP join — "which left intervals intersect
    * which right intervals" (ad-exposure windows × purchase-consideration
    * windows, outage windows × job runs): inclusive overlap
    * `l.lo <= r.hi AND r.lo <= l.hi`, optionally under extra equi-keys
    * (`keys`, e.g. the user) that both bound the pair volume and express
    * the usual per-entity semantics.
    *
    * Same bucketed shape as [[pointInInterval]], but BOTH sides explode
    * into their covered buckets. A pair sharing several buckets would
    * surface once per shared bucket; instead of a distinct shuffle, each
    * pair is emitted ONLY in its first shared bucket — `bucket ==
    * max(l.firstBucket, r.firstBucket)`, which for overlapping intervals
    * is always a bucket both cover — so the join output is exact without
    * any dedup pass. Column names of the two inputs must be disjoint
    * apart from `keys`.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame, keys: Seq[String],
      loL: String, hiL: String, loR: String, hiR: String,
      bucketUnits: Column => Column, bucketWidth: Long,
      maxCopies: Int = 64): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(maxCopies > 0, "maxCopies must be positive")
    def exploded(df: DataFrame, lo: String, hi: String, loB: String) = df
      .filter(col(lo) <= col(hi))
      .withColumn(loB,
        floor(bucketUnits(col(lo)).cast("double") / lit(bucketWidth)).cast("long"))
      .withColumn("_hi_b",
        floor(bucketUnits(col(hi)).cast("double") / lit(bucketWidth)).cast("long"))
      .withColumn("_hi_b", when(col("_hi_b") - col(loB) >= lit(maxCopies.toLong),
          raise_error(concat(
            lit(s"RangeJoin: interval explodes into > $maxCopies buckets of width $bucketWidth: "),
            col(lo).cast("string"), lit(".."), col(hi).cast("string"))))
        .otherwise(col("_hi_b")))
      .withColumn("_bucket", explode(expr(s"sequence($loB, _hi_b)")))
      .drop("_hi_b")
    exploded(left, loL, hiL, "_lo_bl")
      .join(exploded(right, loR, hiR, "_lo_br"), keys :+ "_bucket")
      .filter(col(loL) <= col(hiR) && col(loR) <= col(hiL))
      .filter(col("_bucket") === greatest(col("_lo_bl"), col("_lo_br")))
      .drop("_bucket", "_lo_bl", "_lo_br")
  }
}
