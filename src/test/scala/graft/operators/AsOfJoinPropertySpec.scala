package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Equivalence property: the union+window as-of join must match the naive
  * range-join-and-argmax formulation on arbitrary inputs. The naive form
  * is what the operator exists to avoid at scale (per-key quadratic), but
  * at spec scale it is an independent reference implementation.
  */
class AsOfJoinPropertySpec extends SparkSpec {
  import spark.implicits._

  private def naiveAsOf(left: Seq[(String, Long, String)],
      right: Seq[(String, Long, Double)]): Map[(String, Long, String), Option[(Long, Double)]] =
    left.map { case (k, t, id) =>
      val candidates = right.filter { case (rk, rt, _) => rk == k && rt <= t }
      (k, t, id) -> (if (candidates.isEmpty) None
        else Some(candidates.maxBy(_._2) match { case (_, rt, v) => (rt, v) }))
    }.toMap

  test("asOfBackward equals the naive range-join argmax on random frames") {
    val rnd = new scala.util.Random(99)
    for (trial <- 1 to 5) {
      val keys = Seq("a", "b", "c", "d")
      // distinct right timestamps per key (the operator's documented
      // uniqueness precondition)
      val right = keys.flatMap { k =>
        rnd.shuffle((1 to 50).toList).take(rnd.nextInt(12))
          .map(t => (k, t.toLong, rnd.nextInt(1000) / 10.0))
      }
      val left = (1 to 40).map { i =>
        (keys(rnd.nextInt(keys.size)), (rnd.nextInt(55) + 1).toLong, s"t$trial-$i")
      }
      val out = AsOfJoin.asOfBackward(
        left.toDF("k", "t", "trade_id"), right.toDF("k", "t", "price"), "k", "t")
        .collect().map { r =>
          (r.getAs[String]("k"), r.getAs[Long]("t"), r.getAs[String]("trade_id")) ->
            (Option(r.getAs[java.lang.Long]("asof_ts")).map(_.toLong),
             Option(r.getAs[java.lang.Double]("asof_price")).map(_.toDouble))
        }.toMap
      val expect = naiveAsOf(left, right)
      assert(out.keySet === expect.keySet, s"trial $trial row set")
      expect.foreach { case (row, m) =>
        assert(out(row) === ((m.map(_._1), m.map(_._2))), s"trial $trial row $row")
      }
    }
  }
}
