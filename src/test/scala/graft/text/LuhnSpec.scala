package graft.text

import graft.SparkSpec

class LuhnSpec extends SparkSpec {
  import spark.implicits._

  private def verdicts(rows: Seq[(Long, String)]) =
    TextAnalysis.luhnCandidates(rows.toDF("doc_id", "text"), "doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
      .toSet

  test("textbook PANs validate; off-by-one check digits fail") {
    val got = verdicts(Seq(
      (1L, "visa 4111111111111111 ok"),        // valid 16-digit
      (2L, "mc 5500005555555559 ok"),          // valid 16-digit
      (3L, "amex 378282246310005 ok"),         // valid 15-digit
      (4L, "bad 4111111111111112 nope"),       // check digit +1
      (5L, "short 123456789 and words only"))) // 9 digits: no candidate
    assert(got === Set(
      (1L, "4111111111111111", true),
      (2L, "5500005555555559", true),
      (3L, "378282246310005", true),
      (4L, "4111111111111112", false)))
  }

  test("extraction: multiple runs per doc; over-long runs truncate to the greedy 19") {
    val got = verdicts(Seq(
      (1L, "a 4111111111111111 b 378282246310005 c"),
      (2L, "x 12345678901234567890 y")))       // 20 digits -> greedy 19
    assert(got.filter(_._1 == 1L).map(_._2) ===
      Set("4111111111111111", "378282246310005"))
    assert(got.filter(_._1 == 2L).map(_._2) === Set("1234567890123456789"))
  }
}
