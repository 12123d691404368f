package graft.text

import graft.SparkSpec

class DomainWeightsSpec extends SparkSpec {
  import spark.implicits._

  private def weights(rows: Seq[(Long, String, String)]) =
    ImportanceSampling.domainExcessWeights(
      rows.toDF("doc_id", "text", "source"))
      .collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("excess_micros"),
        r.getAs[Long]("weight_micros")))
      .toMap

  test("the sole above-reference domain takes the whole excess share; the easy domain keeps only the eps floor") {
    // domain X: every token unique (rare -> high NLL); domain Y: one token
    // repeated (common -> low NLL). X is the only excess domain, so its
    // raw share is exactly 1e6 and the smoothed split is 900000 / 100000.
    val rows = Seq(
      (1L, "alpha beta gamma delta", "X"),
      (2L, "epsilon zeta eta theta", "X"),
      (3L, "w w w w w w w w w w w w w w w w", "Y"),
      (4L, "w w w w w w w w w w w w w w w w", "Y"))
    val w = weights(rows)
    assert(w("Y")._1 === 0L)
    assert(w("X")._1 > 0L)
    assert(w("X")._2 === 900000L) // (8e5*1e6 + 2e5*(1e6 div 2)) div 1e6
    assert(w("Y")._2 === 100000L) // eps floor only
  }

  test("zero total excess falls back to the exact uniform mixture") {
    // identical text in both domains: every mean equals the reference
    val rows = Seq(
      (1L, "a b c", "p"), (2L, "a b c", "q"))
    val w = weights(rows)
    assert(w("p") === (0L, 500000L))
    assert(w("q") === (0L, 500000L))
  }

  test("weights are deterministic under repartitioning and eps is validated") {
    val rows = Seq(
      (1L, "one two three", "X"), (2L, "four five six", "X"),
      (3L, "x x x x x x x x", "Y"), (4L, "y y z z q q r r", "Z"))
    val df = rows.toDF("doc_id", "text", "source")
    val a = ImportanceSampling.domainExcessWeights(df).collect()
      .map(r => (r.getString(0), r.getAs[Long]("weight_micros"))).sorted.toSeq
    val b = ImportanceSampling.domainExcessWeights(df.repartition(7)).collect()
      .map(r => (r.getString(0), r.getAs[Long]("weight_micros"))).sorted.toSeq
    assert(a === b)
    assertThrows[IllegalArgumentException] {
      ImportanceSampling.domainExcessWeights(df, epsMicros = 1000001L)
    }
  }
}
