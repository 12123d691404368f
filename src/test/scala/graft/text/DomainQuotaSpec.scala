package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

class DomainQuotaSpec extends SparkSpec {
  import spark.implicits._

  // one mega-domain (60 docs), one exactly-at-cap domain, one under-cap
  private def docs = (
    (1 to 60).map(i => (i.toLong, "mega", (i % 7).toLong)) ++
    (61 to 65).map(i => (i.toLong, "atcap", 100L)) ++
    (66 to 67).map(i => (i.toLong, "small", 1L))
  ).toDF("doc_id", "source", "n_chars")

  test("caps every domain and ranks by quality desc, key asc") {
    val r = CorpusCuration.domainQuota(docs, "source", cap = 5,
      qualityCol = "n_chars", preSalt = 4)
    val bySrc = r.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(bySrc == Map("mega" -> 5L, "atcap" -> 5L, "small" -> 2L))
    // mega's quality ties at n_chars=6 resolve to the lowest doc_ids
    val mega = r.filter($"source" === "mega").orderBy("quota_rank")
      .select("doc_id").as[Long].collect().toSeq
    assert(mega == Seq(6L, 13L, 20L, 27L, 34L))
  }

  test("two-phase salted ranking equals the single-window reference") {
    val cap = 3
    val expected = docs.withColumn("quota_rank", row_number().over(
        Window.partitionBy($"source").orderBy($"n_chars".desc, $"doc_id".asc)).cast("long"))
      .filter($"quota_rank" <= cap)
      .select("doc_id", "source", "quota_rank")
      .orderBy("doc_id").collect().toSeq
    for (salt <- Seq(1, 2, 16)) {
      val got = CorpusCuration.domainQuota(docs.repartition(5), "source", cap,
        qualityCol = "n_chars", preSalt = salt).orderBy("doc_id").collect().toSeq
      assert(got == expected, s"preSalt=$salt")
    }
  }
}
