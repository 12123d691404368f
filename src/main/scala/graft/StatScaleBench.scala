package graft

import org.apache.spark.sql.functions._

/** Scale validation for the rank/ECDF drift statistics and the bucketed
  * range join: synthesize hash-drawn distributions at increasing sizes
  * and confirm wall time grows ~linearly. The claims under test:
  *
  * - `Drift.ksStatistic` / `Drift.mannWhitneyU` never serialize the
  *   distinct-value domain through one task (the two-pass prefix sum
  *   replaces the global ordered window), so a near-unique value domain
  *   (~n distinct values) scales like the groupBy that feeds it.
  * - `RangeJoin.pointInInterval` stays a hash equi-join on the bucket:
  *   candidates scale with true matches, not points × intervals.
  *
  * Usage: runMain graft.StatScaleBench [n1 n2 ...]  (default 1000000 4000000)
  */
object StatScaleBench {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(1000000, 4000000)
    val spark = graft.core.GraftSession.local(8)
    spark.sparkContext.setLogLevel("WARN")
    for (n <- sizes) {
      // near-unique numeric domain: ~n/2 distinct values per side, cur
      // shifted by 10% of the range so D and z are materially nonzero
      val ref = spark.range(n).select(
        (abs(xxhash64(col("id"), lit(1))) % lit(10L * n)).as("v"))
      val cur = spark.range(n).select(
        (abs(xxhash64(col("id"), lit(2))) % lit(10L * n) + lit(n.toLong)).as("v"))
      val t0 = System.nanoTime()
      val ks = quality.Drift.ksStatistic(ref, cur, "v").head
      val tKs = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val mwu = quality.Drift.mannWhitneyU(ref, cur, "v").head
      val tMwu = (System.nanoTime() - t1) / 1e9
      println(f"n=$n ks_micros=${ks.getAs[Long]("ks_micros")} sec=$tKs%.1f | " +
        f"u2=${mwu.getAs[Long]("u2")} z_micros=${mwu.getAs[Long]("z_micros")} sec=$tMwu%.1f")

      // range join: n intervals of span <= 50 on a 10n-wide axis, n/10
      // points; expected matches ~ points * intervals * 50 / (10n) = n/2
      val iv = spark.range(n).select(col("id").as("iv_id"),
          (abs(xxhash64(col("id"), lit(3))) % lit(10L * n)).as("lo"))
        .withColumn("hi", col("lo") + abs(xxhash64(col("iv_id"), lit(4))) % 50)
      val pts = spark.range(n / 10).select(
        (abs(xxhash64(col("id"), lit(5))) % lit(10L * n)).as("p"))
      val t2 = System.nanoTime()
      val matches = operators.RangeJoin.pointInInterval(
        pts, iv, "p", "lo", "hi", c => c, bucketWidth = 64L).count()
      val tRj = (System.nanoTime() - t2) / 1e9
      println(f"n=$n range_join_matches=$matches sec=$tRj%.1f")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
