package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Equivalence property: the bucketed prejoin must match the naive theta
  * join (every point against every interval) on arbitrary inputs and
  * bucket widths — including widths far narrower than the interval
  * spans, where an interval explodes into many copies, and widths far
  * wider, where the residual filter does all the work.
  */
class RangeJoinPropertySpec extends SparkSpec {
  import spark.implicits._

  test("pointInInterval equals the naive theta join for arbitrary " +
      "widths, spans, and partitionings") {
    val rnd = new scala.util.Random(31)
    for (trial <- 1 to 5) {
      val span = 1 + rnd.nextInt(40)
      val width = 1L + rnd.nextInt(30)
      val intervals = (0L until 60L).map { i =>
        val lo = rnd.nextInt(300).toLong
        (i, lo, lo + rnd.nextInt(span + 1))
      }
      val points = Seq.fill(80)(rnd.nextInt(340).toLong)
      val expect = (for {
        p <- points; (id, lo, hi) <- intervals if p >= lo && p <= hi
      } yield (p, id)).toSet
      val got = RangeJoin.pointInInterval(
          points.toDF("p").repartition(1 + rnd.nextInt(5)),
          intervals.toDF("iv_id", "lo", "hi").repartition(1 + rnd.nextInt(5)),
          "p", "lo", "hi", c => c, bucketWidth = width, maxCopies = 256)
        .select("p", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === expect, s"trial $trial width=$width span<=$span")
      // multiplicity: duplicate points must each match independently
      val dupCount = RangeJoin.pointInInterval(
        points.toDF("p"), intervals.toDF("iv_id", "lo", "hi"),
        "p", "lo", "hi", c => c, bucketWidth = width, maxCopies = 256).count()
      val expectCount = (for {
        p <- points; (_, lo, hi) <- intervals if p >= lo && p <= hi
      } yield 1).size.toLong
      assert(dupCount === expectCount, s"trial $trial multiplicity")
    }
  }

  test("intervalOverlap equals the naive theta join for arbitrary widths, " +
      "spans, keys, and partitionings — exactly once per pair") {
    val rnd = new scala.util.Random(37)
    for (trial <- 1 to 5) {
      val span = 1 + rnd.nextInt(50)
      val width = 1L + rnd.nextInt(25)
      def side(n: Int) = (0L until n.toLong).map { i =>
        val lo = rnd.nextInt(250).toLong
        (i % 3, i, lo, lo + rnd.nextInt(span + 1))
      }
      val ls = side(50); val rs = side(45)
      val expect = (for {
        (gl, li, llo, lhi) <- ls; (gr, ri, rlo, rhi) <- rs
        if gl == gr && llo <= rhi && rlo <= lhi
      } yield (li, ri)).toList
      val got = RangeJoin.intervalOverlap(
          ls.toDF("grp", "l_id", "l_lo", "l_hi").repartition(1 + rnd.nextInt(5)),
          rs.toDF("grp", "r_id", "r_lo", "r_hi").repartition(1 + rnd.nextInt(5)),
          Seq("grp"), "l_lo", "l_hi", "r_lo", "r_hi",
          c => c, bucketWidth = width, maxCopies = 256)
        .select("l_id", "r_id").collect().map(r => (r.getLong(0), r.getLong(1))).toList
      // set equality AND multiplicity: no pair lost, no pair double-emitted
      assert(got.sorted === expect.sorted, s"trial $trial width=$width span<=$span")
    }
  }
}
