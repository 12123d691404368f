package graft.text

import graft.SparkSpec

class EncodingAnomaliesSpec extends SparkSpec {
  import spark.implicits._

  test("counts replacement chars, Latin-1 mojibake pairs, and C0 controls") {
    val docs = Seq(
      (1L, "perfectly clean ascii text"),
      // "café" mis-decoded (Ã©) plus an NBSP mis-decode (Â + U+00A0)
      (2L, "cafÃ© and nÂ b"),
      (3L, "lost bytes � here �"),
      (4L, "bell \u0007 and null \u0000 and esc \u001B"),
      // tab / newline / CR are legitimate whitespace, not anomalies
      (5L, "tab\there\nnewline\rcr"),
      // bare Ã before plain ASCII is NOT the mojibake shape (needs a
      // continuation codepoint in U+0080–U+00BF right after)
      (6L, "Ã alone and Ãz too")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.encodingAnomalies(docs, "doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_repl"), r.getAs[Long]("n_moji"),
          r.getAs[Long]("n_ctrl"), r.getAs[Boolean]("enc_clean")))).toMap
    assert(out(1L) === ((0L, 0L, 0L, true)))
    assert(out(2L) === ((0L, 2L, 0L, false)))
    assert(out(3L) === ((2L, 0L, 0L, false)))
    assert(out(4L) === ((0L, 0L, 3L, false)))
    assert(out(5L) === ((0L, 0L, 0L, true)))
    assert(out(6L) === ((0L, 0L, 0L, true)))
  }
}
