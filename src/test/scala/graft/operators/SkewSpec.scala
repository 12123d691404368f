package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 90% of rows on one hot key.
  private lazy val skewed = ((1 to 9000).map(_ => ("hot", 1.0)) ++
    (1 to 1000).map(i => (s"k${i % 50}", 2.0))).toDF("k", "v")

  test("saltedCountSum equals direct aggregation on skewed data") {
    val direct = skewed.groupBy("k")
      .agg(count(lit(1)).as("n"), sum(col("v").cast("decimal(18,2)")).as("total"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDecimal(2)))).toMap
    val salted = Skew.saltedAggregate(skewed, Seq("k"), 16,
      partialAggs = Seq(count(lit(1)).as("_n"),
        sum(col("v").cast("decimal(18,2)")).as("_s")),
      finalAggs = Seq(sum(col("_n")).as("n"), sum(col("_s")).as("total")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDecimal(2)))).toMap
    assert(salted.keySet === direct.keySet)
    for (k <- direct.keys) assert(salted(k)._1 === direct(k)._1, k)
    for (k <- direct.keys)
      assert(salted(k)._2.compareTo(direct(k)._2) === 0, k)
  }

  test("salted partial aggregation actually fans the hot key out") {
    val salted = skewed.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(16L)))
    val hotGroups = salted.filter(col("k") === "hot")
      .groupBy("_salt").count().count()
    assert(hotGroups > 8) // hot key spread across most salt buckets
  }

  test("saltedJoin equals plain join, including left rows and duplicates") {
    val dim = (0 to 49).map(i => (s"k$i", s"name$i")).toDF("k", "name")
      .union(Seq(("hot", "hotname")).toDF("k", "name"))
    val plain = skewed.join(dim, Seq("k")).groupBy("k").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedJoin(skewed, dim, "k").groupBy("k").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
  }

  test("saltedJoin left-outer keeps unmatched rows exactly once") {
    val dim = Seq(("hot", "hotname")).toDF("k", "name")
    val out = Skew.saltedJoin(skewed, dim, "k", joinType = "left")
    assert(out.count() === skewed.count())
    assert(out.filter(col("name").isNull).count() === 1000)
  }
}
