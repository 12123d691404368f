package graft.dedup

import graft.SparkSpec
import graft.core.Tables

class PairGraphSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_a", "doc_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(x => (x._1, x._2)).toSeq

  test("materialized pair graph ≡ direct generation, and repeat calls serve " +
      "the same materialization") {
    val direct = canon(Dedup.jaccardPairsScalable(
      Tables(spark, dir).documents, "doc_id", n = 3, minJaccard = 0.5,
      numHashTables = 8))
    val first = canon(PairGraph.documentsPairs(spark, dir, n = 3))
    assert(first === direct)
    // second call must survive a cache clear (Bench/Verify clear between
    // queries) — the memo is a parquet materialization, not a .cache()
    spark.catalog.clearCache()
    val second = canon(PairGraph.documentsPairs(spark, dir, n = 3))
    assert(second === direct)
  }

  test("memo is keyed per parameterization — the n=5 entry matches its own " +
      "direct generation, not the n=3 materialization") {
    val direct5 = canon(Dedup.jaccardPairsScalable(
      Tables(spark, dir).documents, "doc_id", n = 5, minJaccard = 0.5,
      numHashTables = 8))
    assert(canon(PairGraph.documentsPairs(spark, dir, n = 5)) === direct5)
  }
}
