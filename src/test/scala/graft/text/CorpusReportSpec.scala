package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusReportSpec extends SparkSpec {
  import spark.implicits._

  test("per-language card composes volume, dedup, length and PII correctly") {
    val docs = Seq(
      (1L, "en", "Shared chrome sentence. Unique en one."),
      (2L, "en", "Shared chrome sentence. Mail me at a@b.co now."),
      (3L, "fr", "Phrase unique. Une autre phrase.")
    ).toDF("doc_id", "lang", "text")
    val out = CorpusReport.perLanguage(docs).collect()
      .map(r => r.getAs[String]("lang") -> r).toMap
    assert(out.keySet === Set("en", "fr"))
    val en = out("en"); val fr = out("fr")
    assert(en.getAs[Long]("n_docs") === 2L)
    assert(fr.getAs[Long]("n_docs") === 1L)
    assert(en.getAs[Long]("total_chars") ===
      docs.filter($"lang" === "en").agg(sum(length($"text"))).head.getLong(0))
    // en: 5 sentences (the email's dot splits doc 2's last span in two),
    // "Shared chrome sentence" repeated -> 1 dropped of 5
    assert(en.getAs[Long]("dup_sent_micros") === 200000L)
    assert(fr.getAs[Long]("dup_sent_micros") === 0L)
    assert(en.getAs[Long]("pii_total") === 1L) // the email
    assert(fr.getAs[Long]("pii_total") === 0L)
    // sketch columns present and sane (estimates, not exact): positive,
    // and p50 <= p99 with both within the 2x bucket envelope of true lens
    assert(en.getAs[Double]("est_distinct_tokens") > 0.0)
    val p50 = fr.getAs[Double]("p50_chars"); val p99 = fr.getAs[Double]("p99_chars")
    val frLen = "Phrase unique. Une autre phrase.".length.toDouble
    assert(p50 <= p99 && p50 >= frLen / 2 && p99 <= frLen * 2)
  }
}
