package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-checked nDCG/MRR/recall arithmetic and the integer-weight
  * portability contract. */
class RankEvalSpec extends SparkSpec {
  import spark.implicits._

  test("dcgWeightMicros: w(1) = 10^6, w(3) = 5*10^5, monotone decreasing") {
    val w = RankEval.dcgWeightMicros(10)
    assert(w(0) === 1000000L)
    assert(w(2) === 500000L, "log2(4) = 2 exactly")
    assert(w(1) === 630930L, "floor(1e6/log2(3) + 0.5)")
    assert(w === w.sorted.reverse, "discounts decrease with rank")
    assert(RankEval.dcgWeightCase(3, "r").contains("WHEN r = 2 THEN CAST(630930 AS BIGINT)"))
  }

  test("per-query metrics on a hand-built run") {
    // q1: judged {10:3, 11:2, 12:1}; run finds 11@1, 99@2, 10@3
    // q2: judged {20:2}; run finds only irrelevant docs
    // q3: judged {30:1}; no run rows at all
    val run = Seq(
      (1L, 11L, 1L), (1L, 99L, 2L), (1L, 10L, 3L),
      (2L, 98L, 1L), (2L, 97L, 2L)).toDF("query_id", "neighbor_id", "rank")
    val qrels = Seq(
      (1L, 10L, 3), (1L, 11L, 2), (1L, 12L, 1),
      (2L, 20L, 2), (3L, 30L, 1)).toDF("query_id", "neighbor_id", "rel")
    val out = RankEval.rankingMetrics(run, qrels, k = 3)
      .orderBy("query_id").collect()

    val w = RankEval.dcgWeightMicros(3) // (1000000, 630930, 500000)
    val q1 = out(0)
    val dcg1 = 2L * w(0) + 3L * w(2)                    // 11 rel2 @1 + 10 rel3 @3
    val idcg1 = 3L * w(0) + 2L * w(1) + 1L * w(2)       // ideal order 10,11,12
    assert(q1.getAs[Long]("n_rel") === 3L)
    assert(q1.getAs[Long]("found_rel") === 2L)
    assert(q1.getAs[Long]("dcg_micros") === dcg1)
    assert(q1.getAs[Long]("idcg_micros") === idcg1)
    assert(q1.getAs[Long]("ndcg_micros") === dcg1 * 1000000L / idcg1)
    assert(q1.getAs[Long]("mrr_micros") === 1000000L, "first relevant at rank 1")
    assert(q1.getAs[Long]("recall_micros") === 2L * 1000000L / 3L)
    // AP@3: hits at ranks 1 and 3 -> prec 1/1, 2/3; each term floored
    // independently, sum div min(n_rel, k) = 3
    assert(q1.getAs[Long]("ap_micros") ===
      (1000000L + 2L * 1000000L / 3L) / 3L)

    val q2 = out(1)
    assert(q2.getAs[Long]("n_rel") === 1L)
    assert(q2.getAs[Long]("found_rel") === 0L)
    assert(q2.getAs[Long]("dcg_micros") === 0L)
    assert(q2.getAs[Long]("idcg_micros") === 2L * w(0))
    assert(q2.getAs[Long]("ndcg_micros") === 0L)
    assert(q2.getAs[Long]("mrr_micros") === 0L)
    assert(q2.getAs[Long]("ap_micros") === 0L)
    assert(q2.getAs[Long]("recall_micros") === 0L)

    val q3 = out(2)
    assert(q3.getAs[Long]("found_rel") === 0L && q3.getAs[Long]("mrr_micros") === 0L,
      "a judged query absent from the run scores zero, not null")
  }

  test("explicit rel = 0 judgments are excluded, not counted as relevant") {
    // q1: doc 10 judged rel 0 (TREC-style negative), doc 11 rel 1.
    // Run finds 10@1, 11@2: the rel-0 hit must not enter found_rel,
    // first_rel_rank, AP, or recall.
    val run = Seq((1L, 10L, 1L), (1L, 11L, 2L)).toDF("query_id", "neighbor_id", "rank")
    val qrels = Seq((1L, 10L, 0), (1L, 11L, 1)).toDF("query_id", "neighbor_id", "rel")
    val r = RankEval.rankingMetrics(run, qrels, k = 3).collect().head
    val w = RankEval.dcgWeightMicros(3)
    assert(r.getAs[Long]("n_rel") === 1L)
    assert(r.getAs[Long]("found_rel") === 1L)
    assert(r.getAs[Long]("mrr_micros") === 1000000L / 2L, "first RELEVANT at rank 2")
    assert(r.getAs[Long]("dcg_micros") === w(1))
    assert(r.getAs[Long]("idcg_micros") === w(0))
    assert(r.getAs[Long]("recall_micros") === 1000000L)
    // AP: one hit, at rank 2, hit_idx 1 -> 500000 div 1
    assert(r.getAs[Long]("ap_micros") === 500000L)
  }

  test("cutoff k: hits below the cutoff do not count, idcg truncates at k") {
    val run = Seq((1L, 10L, 1L), (1L, 11L, 4L)).toDF("query_id", "neighbor_id", "rank")
    val qrels = Seq((1L, 10L, 1), (1L, 11L, 3), (1L, 12L, 1), (1L, 13L, 1), (1L, 14L, 1))
      .toDF("query_id", "neighbor_id", "rel")
    val w = RankEval.dcgWeightMicros(3)
    val r = RankEval.rankingMetrics(run, qrels, k = 3).collect().head
    assert(r.getAs[Long]("found_rel") === 1L, "rank-4 hit is outside k=3")
    assert(r.getAs[Long]("dcg_micros") === 1L * w(0))
    // ideal top-3 of rels (3,1,1,1,1): 3*w1 + 1*w2 + 1*w3
    assert(r.getAs[Long]("idcg_micros") === 3L * w(0) + w(1) + w(2))
    // AP@3: one hit at rank 1, denominator min(n_rel = 5, k = 3) = 3
    assert(r.getAs[Long]("ap_micros") === 1000000L / 3L)
  }
}
