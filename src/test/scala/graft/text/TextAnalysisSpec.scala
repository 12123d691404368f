package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("stats computes token counts, ratios and quality on a crafted doc") {
    val doc = Seq((1L, "the cat sat on the mat, happily!")).toDF("doc_id", "text")
    val r = TextAnalysis.stats(doc).collect().head
    assert(r.getAs[Int]("n_tokens") === 7)
    assert(r.getAs[Int]("token_estimate") === 9) // 7 words + ',' + '!'
    assert(r.getAs[Long]("stopword_count") === 3L) // the, on, the
    assert(math.abs(r.getAs[Double]("punct_ratio") - 2.0 / 32) < 1e-9)
  }

  test("langId picks the language with most marker hits, 'und' when none") {
    val docs = Seq(
      (1L, "der hund und die katze ist hier"),
      (2L, "the cat and the dog of the house"),
      (3L, "xyzzy plugh qwerty")).toDF("doc_id", "text")
    val m = TextAnalysis.langId(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang_guess")).toMap
    assert(m === Map(1L -> "de", 2L -> "en", 3L -> "und"))
  }

  test("fingerprint is invariant to case and surrounding whitespace") {
    val docs = Seq((1L, "Hello World"), (2L, "  hello world "), (3L, "other"))
      .toDF("doc_id", "text")
    val fps = docs.select(TextAnalysis.fingerprint(col("text")).as("fp"))
      .collect().map(_.getString(0))
    assert(fps(0) === fps(1))
    assert(fps(0) !== fps(2))
  }

  test("tfIdf ranks rare terms above ubiquitous ones") {
    val docs = Seq(
      (1L, "spark spark rare"),
      (2L, "spark common words"),
      (3L, "spark more words")).toDF("doc_id", "text")
    val out = TextAnalysis.tfIdf(docs, "doc_id", "text", 3).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("token")) -> r.getAs[Double]("tf_idf")).toMap
    assert(out((1L, "spark")) === 0.0) // df=3 of 3 -> idf 0
    assert(out((1L, "rare")) > 0.0)
  }
}
