package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SurrogateKeysSpec extends SparkSpec {
  import spark.implicits._

  test("scalableKeys matches global row_number parity variant") {
    val rnd = new scala.util.Random(7)
    val df = Seq.fill(500)((rnd.nextInt(100000), rnd.nextInt(10)))
      .distinct.toDF("k", "v").repartition(8)
    val a = SurrogateKeys.rowNumberKeys(df, "sk", Seq(col("k"), col("v")))
      .select("k", "v", "sk").collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val b = SurrogateKeys.scalableKeys(df, "sk", Seq(col("k"), col("v")))
      .select("k", "v", "sk").collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(a === b)
  }

  test("keys are dense 1..N") {
    val df = (1 to 100).map(i => i * 3 % 97).distinct.toDF("k")
    val keys = SurrogateKeys.scalableKeys(df, "sk", Seq(col("k")))
      .select("sk").collect().map(_.getLong(0)).sorted
    assert(keys.toSeq === (1L to keys.length).toSeq)
  }
}
