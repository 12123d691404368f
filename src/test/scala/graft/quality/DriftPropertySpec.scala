package graft.quality

import graft.SparkSpec

/** Equivalence properties: the distributed two-pass KS and Mann–Whitney
  * implementations must match independent in-JVM reference computations
  * on arbitrary inputs — the reference forms are what the operators
  * avoid at scale (a full sort through one task), but at spec scale
  * they are exact oracles.
  */
class DriftPropertySpec extends SparkSpec {
  import spark.implicits._

  private def naiveKs(ref: Seq[Double], cur: Seq[Double]): Long = {
    val values = (ref ++ cur).distinct.sorted
    val d = values.map { v =>
      math.abs(ref.count(_ <= v).toDouble / ref.size
        - cur.count(_ <= v).toDouble / cur.size)
    }.max
    math.floor(d * 1e6 + 0.5).toLong
  }

  private def naiveU2(ref: Seq[Double], cur: Seq[Double]): Long =
    ref.map(r => 2L * cur.count(_ < r) + cur.count(_ == r)).sum

  test("ksStatistic and mannWhitneyU equal naive references on random " +
      "tied-heavy samples across repartitionings") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      // small value domain forces heavy ties — the hard case for both
      val ref = Seq.fill(60 + rnd.nextInt(60))(rnd.nextInt(20).toDouble)
      val cur = Seq.fill(60 + rnd.nextInt(60))(rnd.nextInt(25).toDouble)
      val rdf = ref.toDF("v").repartition(1 + rnd.nextInt(6))
      val cdf = cur.toDF("v").repartition(1 + rnd.nextInt(6))
      val ks = Drift.ksStatistic(rdf, cdf, "v").head
      assert(ks.getAs[Long]("ks_micros") === naiveKs(ref, cur), s"trial $trial ks")
      assert(ks.getAs[Long]("n_ref") === ref.size.toLong)
      val mwu = Drift.mannWhitneyU(rdf, cdf, "v").head
      assert(mwu.getAs[Long]("u2") === naiveU2(ref, cur), s"trial $trial u2")
      // complement identity: U_ref + U_cur = n_ref * n_cur (doubled)
      val flipped = Drift.mannWhitneyU(cdf, rdf, "v").head
      assert(mwu.getAs[Long]("u2") + flipped.getAs[Long]("u2") ===
        2L * ref.size * cur.size, s"trial $trial complement")
    }
  }
}
