package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RandomProjectionSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16
  private def vec(seed: Int): Seq[Float] =
    (0 until dim).map(i => (((seed * 31 + i) % 13) - 6) / 4.0f)

  private def emb = Seq(
    (1L, vec(1)), (2L, vec(2)), (3L, vec(3)), (4L, vec(1)) // 4 duplicates 1
  ).toDF("vec_id", "embedding")

  test("matches a naive driver-side replay of the md5 sign matrix") {
    val k = 4
    val got = Similarity.randomProjection(emb, "vec_id", dim, k)
      .as[(Long, Long, Long)].collect()
      .map { case (id, j, p) => (id, j) -> p }.toMap
    val vs = Map(1L -> vec(1), 2L -> vec(2), 3L -> vec(3), 4L -> vec(1))
    for ((id, v) <- vs; j <- 0 until k) {
      val expected = v.zipWithIndex.map { case (x, i) =>
        Similarity.projSign(i, j).toLong * math.floor(x.toDouble * 1e6 + 0.5).toLong
      }.sum
      assert(got((id, j)) == expected, s"id=$id j=$j")
    }
  }

  test("identical inputs project identically; distinct inputs differ somewhere") {
    val r = Similarity.randomProjection(emb, "vec_id", dim, k = 6)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (id, rows) =>
        id -> rows.sortBy(_._2).map(_._3).toSeq }
    assert(r(1L) == r(4L))
    assert(r(1L) != r(2L) && r(2L) != r(3L))
  }

  test("sign matrix is roughly balanced (md5 nibbles are uniform)") {
    val signs = for (i <- 0 until 64; j <- 0 until 8) yield Similarity.projSign(i, j)
    val pos = signs.count(_ == 1)
    assert(pos > 512 * 0.4 && pos < 512 * 0.6, s"pos=$pos of 512")
  }

  test("deterministic under repartitioning") {
    val a = Similarity.randomProjection(emb.repartition(3), "vec_id", dim, 4)
      .orderBy("vec_id", "j").collect().toSeq
    val b = Similarity.randomProjection(emb, "vec_id", dim, 4)
      .orderBy("vec_id", "j").collect().toSeq
    assert(a == b)
  }
}
