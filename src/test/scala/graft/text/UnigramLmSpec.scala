package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  // corpus built from two true pieces "ab" and "cd": EM should
  // concentrate probability mass on them, and Viterbi should recover the
  // planted segmentation instead of falling back to characters
  private lazy val docs = Seq(
    (1L, "abab abcd cdcd"),
    (2L, "abcd abab"),
    (3L, "cdab cdcd abab")
  ).toDF("doc_id", "text")

  test("candidate inventory covers all single chars and ranks true pieces high") {
    val cand = UnigramLm.candidatePieces(docs, maxPieceLen = 2, maxVocab = 6)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("cnt")).toMap
    assert(Set("a", "b", "c", "d").subsetOf(cand.keySet)) // cover guarantee
    assert(cand.contains("ab") && cand.contains("cd"))
    // "ab" occurs more often than the boundary-straddling "ba"
    assert(cand("ab") > cand.getOrElse("ba", 0L))
  }

  test("EM concentrates mass on the planted pieces and Viterbi recovers them") {
    val model = UnigramLm.trainUnigram(docs, rounds = 3, maxPieceLen = 2,
      maxVocab = 6)
    val p = model.collect().map(r => r.getString(0) -> r.getAs[Long]("p_micros")).toMap
    // the true pieces end with more mass than any single character
    val charMax = Seq("a", "b", "c", "d").map(p.getOrElse(_, 0L)).max
    assert(p("ab") > charMax, s"p=$p")
    assert(p("cd") > charMax, s"p=$p")
    val seg = UnigramLm.viterbiSegment(docs, model, "doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // "abab abcd cdcd": 3 words, each 2 pieces -> fertility 2.0
    assert(seg(1L).getAs[Long]("n_words") === 3L)
    assert(seg(1L).getAs[Long]("n_pieces") === 6L)
    assert(seg(1L).getAs[Long]("fertility_micros") === 2000000L)
    // repartitioning changes neither the model nor the segmentation
    val model2 = UnigramLm.trainUnigram(docs.repartition(5), rounds = 3,
      maxPieceLen = 2, maxVocab = 6)
    assert(model2.collect().map(r => r.getString(0) -> r.getAs[Long]("p_micros")).toMap === p)
    val seg2 = UnigramLm.viterbiSegment(docs.repartition(5), model2, "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("seg_hash")).toMap
    assert(seg2 === seg.map { case (k, v) => k -> v.getAs[String]("seg_hash") })
  }

  test("every word stays segmentable (single-char cover) even off-corpus") {
    val model = UnigramLm.trainUnigram(docs, rounds = 2, maxPieceLen = 2,
      maxVocab = 6)
    // "dcba" contains no planted piece; the cover guarantees 4 char pieces
    val probe = Seq((9L, "dcba")).toDF("doc_id", "text")
    val out = UnigramLm.viterbiSegment(probe, model, "doc_id").collect().head
    assert(out.getAs[Long]("n_pieces") === 4L)
  }
}
