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
}
