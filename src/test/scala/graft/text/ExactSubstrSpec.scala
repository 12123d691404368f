package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Prefix-doubling ExactSubstr: hand-checkable spans, the power-of-two
  * window path, and the corpus-wide cross-check against the independent
  * md5-gram implementation.
  */
class ExactSubstrSpec extends SparkSpec {
  import spark.implicits._

  test("hand-planted duplicated spans: exact coverage, no false spans") {
    // docs 1 and 2 share tokens a1..a13 (one 13-window each); doc 3 is
    // disjoint; doc 4 repeats ITS OWN 13-gram (self-duplication counts)
    val a = (1 to 13).map(i => s"a$i").mkString(" ")
    val docs = Seq(
      (1L, s"$a x1 x2 x3"),
      (2L, s"y1 y2 $a"),
      (3L, (1 to 16).map(i => s"z$i").mkString(" ")),
      (4L, s"$a q $a")
    ).toDF("doc_id", "text")
    val r = ExactSubstr.duplicatedSpanCoverageExact(docs, "doc_id", L = 13)
      .orderBy("doc_id").collect()
    assert(r.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L))
    def row(id: Long) = r.find(_.getLong(0) == id).get
    // doc 1: one duplicated window at pos 1 -> 13 covered of 16
    assert(row(1).getAs[Long]("n_dup_spans") === 1L)
    assert(row(1).getAs[Long]("covered_tokens") === 13L)
    // doc 2: window starts at pos 3 -> 13 covered of 15
    assert(row(2).getAs[Long]("covered_tokens") === 13L)
    // doc 3: nothing duplicated
    assert(row(3).getAs[Long]("n_dup_spans") === 0L)
    assert(row(3).getAs[Long]("dup_micros") === 0L)
    // doc 4: a...a (13) + q + a...a (13) = 27 tokens; the shared block
    // appears at pos 1 and 15, both full windows -> 26 of 27 covered
    assert(row(4).getAs[Long]("n_dup_spans") === 2L)
    assert(row(4).getAs[Long]("covered_tokens") === 26L)
  }

  test("power-of-two window (off = 0 path)") {
    val a = (1 to 8).map(i => s"a$i").mkString(" ")
    val docs = Seq((1L, s"$a t1"), (2L, s"u1 $a")).toDF("doc_id", "text")
    val r = ExactSubstr.duplicatedSpanCoverageExact(docs, "doc_id", L = 8)
      .orderBy("doc_id").collect()
    assert(r.forall(_.getAs[Long]("covered_tokens") === 8L))
  }

  test("maxPow2DupLen brackets the true longest duplicated span") {
    // docs 1/2 share an exact 21-token block -> true M = 21, bracket
    // [16, 31]: max_dup_pow2 must be 16. doc 3 shares only one token
    // ("a1") -> 1. doc 4 is fully fresh -> 0.
    val block = (1 to 21).map(i => s"a$i").mkString(" ")
    val docs = Seq(
      (1L, s"$block p1 p2 p3"),
      (2L, s"q1 $block"),
      (3L, "a1 r1 r2 r3"),
      (4L, "s1 s2 s3 s4")
    ).toDF("doc_id", "text")
    val r = ExactSubstr.maxPow2DupLen(docs, "doc_id", maxLen = 64)
      .orderBy("doc_id").collect()
    assert(r.map(x => (x.getLong(0), x.getAs[Long]("max_dup_pow2"))).toSeq ===
      Seq((1L, 16L), (2L, 16L), (3L, 1L), (4L, 0L)))
  }

  test("maxDupSpanExact: exact planted span lengths, bracket relation corpus-wide") {
    val block = (1 to 21).map(i => s"a$i").mkString(" ")
    val docs = Seq(
      (1L, s"$block p1 p2 p3"),
      (2L, s"q1 $block"),
      (3L, "a1 r1 r2 r3"),
      (4L, "s1 s2 s3 s4")
    ).toDF("doc_id", "text")
    val r = ExactSubstr.maxDupSpanExact(docs, "doc_id").orderBy("doc_id").collect()
    assert(r.map(x => (x.getLong(0), x.getAs[Long]("max_dup_span"))).toSeq ===
      Seq((1L, 21L), (2L, 21L), (3L, 1L), (4L, 0L)))

    // the power-of-two bracket holds for every doc on real corpus data:
    // bracket <= exact <= 2*bracket - 1 (0 iff 0)
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val exact = ExactSubstr.maxDupSpanExact(corpus, "doc_id")
      .select(col("doc_id"), col("max_dup_span"))
    val bracket = ExactSubstr.maxPow2DupLen(corpus, "doc_id", maxLen = 64)
      .select(col("doc_id"), col("max_dup_pow2"))
    val joined = exact.join(bracket, Seq("doc_id"))
    assert(joined.count() === corpus.count())
    assert(joined.filter(
      (col("max_dup_pow2") === 0 && col("max_dup_span") =!= 0) ||
      (col("max_dup_pow2") > 0 &&
        (col("max_dup_span") < col("max_dup_pow2") ||
         col("max_dup_span") > col("max_dup_pow2") * 2 - 1))).count() === 0L)
  }

  test("ordered suffix ranks reproduce lexicographic suffix order") {
    // hand corpus where order is checkable: suffixes of "b a c a b" and
    // "a b" — shorter-prefix-first (terminator) cases included
    val docs = Seq((1L, "b a c a b"), (2L, "a b")).toDF("doc_id", "text")
    val rounds = ExactSubstr.orderedSuffixRounds(docs, "doc_id", prefixLen = 8)
    val last = rounds.last._2
    val got = last.orderBy("rank", "pk")
      .select("doc_id", "pos").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // suffixes sorted lexicographically (token-wise, shorter prefix first):
    // "a"(1,4) < "a b"(2,1) < "a b"(1,2)... wait doc1 pos2 = "a c a b"
    // doc1: [b a c a b] suffixes: p1="b a c a b" p2="a c a b" p3="c a b"
    //       p4="a b" p5="b"; doc2: p1="a b" p2="b"
    // sorted: "a b"(1,4)=(2,1) tie -> pk order: doc1 first? pk(1,4) =
    // 1*2^20+4 < 2*2^20+1 -> (1,4) then (2,1); then "a c a b"(1,2);
    // then "b"(1,5)=(2,2) -> (1,5),(2,2); then "b a c a b"(1,1);
    // then "c a b"(1,3)
    assert(got === Seq((1L, 4L), (2L, 1L), (1L, 2L), (1L, 5L), (2L, 2L),
      (1L, 1L), (1L, 3L)))
    // rank equality == identical suffix: the two "a b" share a rank,
    // the two "b" share a rank, everything else distinct
    val ranks = last.select("rank").distinct().count()
    assert(ranks === 5)
  }

  test("agrees with the independent md5-gram implementation corpus-wide") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val exact = ExactSubstr.duplicatedSpanCoverageExact(docs, "doc_id", L = 13)
    val grams = CorpusCuration.duplicatedSpanCoverage(docs, "doc_id", k = 13)
    assert(exact.count() === grams.count())
    assert(exact.exceptAll(grams).count() === 0L)
    assert(grams.exceptAll(exact).count() === 0L)
  }

  test("removeDuplicatedSpans cuts every copy of a duplicated 13-gram and reassembles in order") {
    val a = (1 to 13).map(i => s"a$i").mkString(" ")
    val docs = Seq(
      (1L, s"u1 u2 u3 $a"),     // 16 tokens, dup window at pos 4
      (2L, s"$a v1 v2"),        // 15 tokens, dup window at pos 1
      (3L, a),                  // fully duplicated -> empty survivor
      (4L, "w1 w2 w3")          // short doc: untouchable
    ).toDF("doc_id", "text")
    val r = ExactSubstr.removeDuplicatedSpans(docs, "doc_id", L = 13)
      .collect()
      .map(x => x.getLong(0) -> (x.getAs[Long]("n_tokens"),
        x.getAs[Long]("kept_tokens"), x.getAs[Long]("removed_tokens"),
        x.getAs[String]("clean_text")))
      .toMap
    assert(r(1L) === (16L, 3L, 13L, "u1 u2 u3"))
    assert(r(2L) === (15L, 2L, 13L, "v1 v2"))
    assert(r(3L) === (13L, 0L, 13L, ""))
    assert(r(4L) === (3L, 3L, 0L, "w1 w2 w3"))
    // reassembly preserves original token order across a removed middle
    val mid = Seq(
      (7L, s"p1 $a p2"),
      (8L, s"q0 $a")).toDF("doc_id", "text")
    val m = ExactSubstr.removeDuplicatedSpans(mid, "doc_id", L = 13)
      .collect().map(x => x.getLong(0) -> x.getAs[String]("clean_text")).toMap
    assert(m(7L) === "p1 p2")
    assert(m(8L) === "q0")
  }
}
