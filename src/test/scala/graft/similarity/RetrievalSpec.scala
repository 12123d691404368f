package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("rankByScore cuts to n and assigns dense 1..n ranks by (score desc, key)") {
    val scored = Seq(("d", 5L), ("a", 9L), ("b", 9L), ("c", 7L), ("e", 1L))
      .toDF("k", "s")
    val out = Retrieval.rankByScore(scored, "k", "s", 3).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("rank")).toMap
    // tie at 9 broken by key: a before b
    assert(out === Map("a" -> 1L, "b" -> 2L, "c" -> 3L))
  }

  test("rrfFuse: hand-computed points, agreement count and best rank") {
    val l1 = Seq(("a", 1L), ("b", 2L)).toDF("k", "rank")
    val l2 = Seq(("b", 1L), ("c", 2L)).toDF("k", "rank")
    val out = Retrieval.rrfFuse(Seq(l1, l2), "k").collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("n_lists"), r.getAs[Long]("best_rank"), r.getAs[Long]("rrf_micros"))))
      .toMap
    // floor(1e6/61+0.5)=16393, floor(1e6/62+0.5)=16129
    assert(out("b") === ((2L, 1L, 16393L + 16129L)))
    assert(out("a") === ((1L, 1L, 16393L)))
    assert(out("c") === ((1L, 2L, 16129L)))
    // both-lists doc outscores either single-list doc: the agreement signal
    assert(out("b")._3 > out("a")._3)
  }

  private def emb(rows: (Long, Seq[Float])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  test("mmr with lambda = 1 is pure relevance order (= brute-force cosine top-k)") {
    val df = emb(
      0L -> Seq(1f, 0f),
      1L -> Seq(0.9f, 0.1f), 2L -> Seq(0.8f, 0.2f), 3L -> Seq(0.7f, 0.3f),
      4L -> Seq(0.1f, 0.9f), 5L -> Seq(0.0f, 1.0f))
    val got = Retrieval.mmr(df, "vec_id", queryId = 0L, k = 3, lambda = 1.0,
        candPool = 5)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    val want = Similarity.bruteForceTopK(df, "vec_id", col("vec_id") === 0L, 3)
      .orderBy("rank").collect().map(_.getAs[Long]("neighbor_id")).toSeq
    assert(got === want)
  }

  test("mmr with small lambda diversifies: second pick jumps to the far cluster") {
    // cluster A hugs the query; b is less relevant but orthogonal-ish.
    val df = emb(
      0L -> Seq(1f, 0f),
      1L -> Seq(0.99f, 0.05f), 2L -> Seq(0.98f, 0.08f), 3L -> Seq(0.97f, 0.1f),
      9L -> Seq(0.5f, 0.87f))
    val picks = Retrieval.mmr(df, "vec_id", queryId = 0L, k = 2, lambda = 0.3,
        candPool = 4)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(picks.head === 1L)   // first pick is always max relevance
    assert(picks(1) === 9L)     // redundancy penalty evicts cluster A
    // ...while high lambda stays in the cluster
    val greedy = Retrieval.mmr(df, "vec_id", queryId = 0L, k = 2, lambda = 1.0,
        candPool = 4)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(greedy === Seq(1L, 2L))
  }

  test("mmr is deterministic under repartitioning and caps at the pool size") {
    val rnd = new scala.util.Random(11)
    val df = emb((0L until 40L).map(i =>
      i -> Seq.fill(8)(rnd.nextFloat() - 0.5f)): _*)
    val a = Retrieval.mmr(df, "vec_id", 0L, k = 6, candPool = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val b = Retrieval.mmr(df.repartition(7), "vec_id", 0L, k = 6, candPool = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(a === b)
    // k beyond the available pool returns the whole pool, no crash
    val small = emb(0L -> Seq(1f, 0f), 1L -> Seq(0f, 1f), 2L -> Seq(1f, 1f))
    assert(Retrieval.mmr(small, "vec_id", 0L, k = 2, candPool = 2)
      .count() === 2L)
  }
}
