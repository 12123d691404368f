package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NllTilesSpec extends SparkSpec {
  import spark.implicits._

  // 9 docs: three made of the common token, three mixed, three of rare
  // tokens — the common-token docs must land in the head (lowest NLL),
  // the rare-token docs in the tail.
  private def docs = (
    (1 to 3).map(i => (i.toLong, "the the the the")) ++
    (4 to 6).map(i => (i.toLong, s"the the rare$i x$i")) ++
    (7 to 9).map(i => (i.toLong, s"zzz$i yyy$i www$i vvv$i"))
  ).toDF("doc_id", "text")

  test("ranks are a permutation of 1..n, ordered by mean_nll") {
    val r = ImportanceSampling.nllTiles(docs)
      .orderBy("ppl_rank")
      .select("ppl_rank", "mean_nll").as[(Long, Double)].collect()
    assert(r.map(_._1).toSeq == (1L to 9L))
    assert(r.map(_._2).toSeq == r.map(_._2).sortBy(identity).toSeq)
  }

  test("thirds: fluent docs head, rare-token docs tail") {
    val b = ImportanceSampling.nllTiles(docs)
      .select("doc_id", "ppl_bucket").as[(Long, String)].collect().toMap
    assert(Seq(1L, 2L, 3L).forall(b(_) == "head"))
    assert(Seq(4L, 5L, 6L).forall(b(_) == "middle"))
    assert(Seq(7L, 8L, 9L).forall(b(_) == "tail"))
  }

  test("deterministic under repartitioning") {
    val a = ImportanceSampling.nllTiles(docs.repartition(7)).orderBy("doc_id").collect().toSeq
    val b = ImportanceSampling.nllTiles(docs.repartition(2)).orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("uneven split gives earlier buckets no more than one extra row") {
    val many = (1 to 11).map(i => (i.toLong, s"tok$i uniq$i")).toDF("doc_id", "text")
    val sizes = ImportanceSampling.nllTiles(many)
      .groupBy("ppl_bucket").count().as[(String, Long)].collect().toMap
    // rank*3<=11 → 3 head; rank*3<=22 → ranks 4..7 middle; rest tail
    assert(sizes == Map("head" -> 3L, "middle" -> 4L, "tail" -> 4L))
  }
}
