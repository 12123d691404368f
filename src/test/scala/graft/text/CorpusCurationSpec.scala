package graft.text

import graft.SparkSpec

class CorpusCurationSpec extends SparkSpec {
  import spark.implicits._

  // One good doc, one duplicate of it, one wrong language, one too short,
  // one low quality (no stopwords, all punctuation-free short tokens).
  private lazy val docs = Seq(
    (1L, "en", "the quick brown fox jumps over the lazy dog and then runs off to the woods again with friends " * 2),
    (2L, "en", "the quick brown fox jumps over the lazy dog and then runs off to the woods again with friends " * 2),
    (3L, "de", "the quick brown fox jumps over the lazy dog and then runs off to the woods again with friends " * 2),
    (4L, "en", "too short text here"),
    (5L, "en", "zz yy xx ww vv uu tt ss rr qq pp oo nn mm ll kk jj ii hh gg ff ee dd cc bb aa " * 4)
  ).toDF("doc_id", "lang", "text")

  test("funnel accounts for every document exactly once") {
    val f = CorpusCuration.funnel(docs).collect().head
    assert(f.getAs[Long]("total_docs") === 5L)
    assert(f.getAs[Long]("dropped_lang") === 1L)    // doc 3
    assert(f.getAs[Long]("dropped_quality") === 1L) // doc 4: short AND stopword-free -> 0.3
    assert(f.getAs[Long]("dropped_length") === 0L)  // length failures already failed quality here
    assert(f.getAs[Long]("passed") === 3L)          // docs 1, 2, 5
    assert(f.getAs[Long]("distinct_passed") === 2L) // 1 == 2 by fingerprint
  }

  test("curate dedupes by fingerprint keeping the smallest doc id") {
    val out = CorpusCuration.curate(docs).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out.contains(1L) && !out.contains(2L)) // exact dup dropped
    assert(!out.contains(3L)) // language
  }
}
