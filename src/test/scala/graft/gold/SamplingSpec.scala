package graft.gold

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (1 to 2000).map { i =>
    (i.toLong, if (i % 10 == 0) "de" else "en") // 90% en, 10% de
  }.toDF("id", "lang")

  test("stratifiedSample keeps ~fraction per stratum and is repartition-stable") {
    val out = Sampling.stratifiedSample(docs, "lang", "id",
      Map("en" -> 0.1), defaultFraction = 1.0)
    val counts = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("de") === 200L)                     // default 1.0 keeps all
    assert(counts("en") > 100L && counts("en") < 260L) // ~180 expected
    // purely hash-determined: identical sample under any partitioning
    val again = Sampling.stratifiedSample(docs.repartition(7), "lang", "id",
      Map("en" -> 0.1), defaultFraction = 1.0)
    assert(again.select("id").collect().map(_.getLong(0)).toSet ===
      out.select("id").collect().map(_.getLong(0)).toSet)
  }

  test("rebalanceByCount hits the target exactly where possible") {
    val out = Sampling.rebalanceByCount(docs, "lang", "id", 150)
    val counts = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("en") === 150L)  // capped
    assert(counts("de") === 150L)  // de has 200 rows -> capped too
    val small = Sampling.rebalanceByCount(docs, "lang", "id", 500)
    val c2 = small.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(c2("de") === 200L)      // stratum smaller than target -> all kept
    assert(c2("en") === 500L)
  }
}
