package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def units = (c: org.apache.spark.sql.Column) => c.cast("long")

  test("matches the brute-force BETWEEN join exactly, including inclusive " +
      "endpoints and bucket-straddling intervals") {
    val pts = (0L to 100L).toDF("p")
    // spans 0..9 units, lo at every 7th position — many straddle the
    // width-10 bucket boundary
    val iv = (0L until 40L).map(i => (i, i * 7 % 95, i * 7 % 95 + i % 10))
      .toDF("iv_id", "lo", "hi")
    val got = RangeJoin.pointInInterval(pts, iv, "p", "lo", "hi", units, bucketWidth = 10L)
      .select("p", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = pts.join(iv, col("p") >= col("lo") && col("p") <= col("hi"))
      .select("p", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
    assert(want.nonEmpty)
    // endpoints are inclusive: a width-0 interval matches its single point
    val single = RangeJoin.pointInInterval(
      Seq(5L).toDF("p"), Seq((1L, 5L, 5L)).toDF("iv_id", "lo", "hi"),
      "p", "lo", "hi", units, bucketWidth = 10L)
    assert(single.count() === 1L)
  }

  test("each (point, interval) pair is emitted exactly once — no dedup " +
      "pass, so bucket copies must never double-match") {
    // interval straddles 3 buckets; points inside it in each bucket
    val iv = Seq((1L, 8L, 25L)).toDF("iv_id", "lo", "hi")
    val pts = Seq(9L, 15L, 22L).toDF("p")
    val out = RangeJoin.pointInInterval(pts, iv, "p", "lo", "hi", units, bucketWidth = 10L)
      .groupBy("p").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(9L -> 1L, 15L -> 1L, 22L -> 1L))
  }

  test("a malformed interval (lo > hi) matches nothing, exactly like SQL " +
      "BETWEEN") {
    val iv = Seq((1L, 20L, 10L), (2L, 3L, 7L)).toDF("iv_id", "lo", "hi")
    val out = RangeJoin.pointInInterval(Seq(5L, 15L).toDF("p"), iv,
        "p", "lo", "hi", units, bucketWidth = 10L)
      .select("p", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((5L, 2L))) // only the well-formed interval matches
  }

  test("an interval exploding past maxCopies raises instead of silently " +
      "ballooning") {
    val iv = Seq((1L, 0L, 1000L)).toDF("iv_id", "lo", "hi")
    val pts = Seq(5L).toDF("p")
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(pts, iv, "p", "lo", "hi", units,
        bucketWidth = 10L, maxCopies = 4).count()
    }
    assert(e.getMessage.contains("RangeJoin") ||
      Option(e.getCause).exists(_.getMessage.contains("RangeJoin")))
  }

  test("the plan is a hash equi-join on the bucket, not a nested loop") {
    val pts = (0L to 50L).toDF("p")
    val iv = (0L until 10L).map(i => (i, i * 5, i * 5 + 3)).toDF("iv_id", "lo", "hi")
    val plan = RangeJoin.pointInInterval(pts, iv, "p", "lo", "hi", units, bucketWidth = 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  test("intervalOverlap matches the brute-force overlap join exactly — " +
      "inclusive endpoints, bucket-straddling spans, keyed sides") {
    val l = (0L until 60L).map(i => (i % 4, i, i * 7 % 90, i * 7 % 90 + i % 13))
      .toDF("grp", "l_id", "l_lo", "l_hi")
    val r = (0L until 60L).map(i => (i % 4, i, i * 11 % 90, i * 11 % 90 + i % 9))
      .toDF("grp", "r_id", "r_lo", "r_hi")
    val got = RangeJoin.intervalOverlap(l, r, Seq("grp"),
        "l_lo", "l_hi", "r_lo", "r_hi", units, bucketWidth = 10L)
      .select("l_id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val want = l.join(r.withColumnRenamed("grp", "grp2"),
        col("grp") === col("grp2") &&
          col("l_lo") <= col("r_hi") && col("r_lo") <= col("l_hi"))
      .select("l_id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got === want)
    assert(want.nonEmpty)
  }

  test("intervalOverlap emits each overlapping pair exactly once even when " +
      "the pair shares many buckets") {
    // both intervals span 4 buckets of width 10 and overlap across 3
    val l = Seq((1L, 5L, 38L)).toDF("l_id", "l_lo", "l_hi")
    val r = Seq((9L, 12L, 45L)).toDF("r_id", "r_lo", "r_hi")
    val out = RangeJoin.intervalOverlap(l, r, Seq.empty,
      "l_lo", "l_hi", "r_lo", "r_hi", units, bucketWidth = 10L)
    assert(out.count() === 1L)
    // touching endpoints overlap inclusively
    val touch = RangeJoin.intervalOverlap(
      Seq((1L, 0L, 10L)).toDF("l_id", "l_lo", "l_hi"),
      Seq((2L, 10L, 20L)).toDF("r_id", "r_lo", "r_hi"),
      Seq.empty, "l_lo", "l_hi", "r_lo", "r_hi", units, bucketWidth = 7L)
    assert(touch.count() === 1L)
  }

  test("intervalOverlap plans a hash equi-join and raises past maxCopies") {
    val l = (0L until 20L).map(i => (i, i * 3, i * 3 + 5)).toDF("l_id", "l_lo", "l_hi")
    val r = (0L until 20L).map(i => (i, i * 4, i * 4 + 5)).toDF("r_id", "r_lo", "r_hi")
    val plan = RangeJoin.intervalOverlap(l, r, Seq.empty,
        "l_lo", "l_hi", "r_lo", "r_hi", units, bucketWidth = 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
    val e = intercept[Exception] {
      RangeJoin.intervalOverlap(
        Seq((1L, 0L, 1000L)).toDF("l_id", "l_lo", "l_hi"),
        Seq((2L, 5L, 6L)).toDF("r_id", "r_lo", "r_hi"),
        Seq.empty, "l_lo", "l_hi", "r_lo", "r_hi", units,
        bucketWidth = 10L, maxCopies = 4).count()
    }
    assert(e.getMessage.contains("RangeJoin") ||
      Option(e.getCause).exists(_.getMessage.contains("RangeJoin")))
  }
}
