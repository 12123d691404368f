package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    // warehouse dir is static config — set in SparkSpec's session builder
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      val facts = (1 to 10000).map(i => (i.toLong % 500, i.toDouble)).toDF("k", "v")
      val dim = (0L until 500L).map(i => (i, s"name$i")).toDF("k", "name")
      Bucketing.writeBucketed(facts, "b_facts", "k", 8, sortCols = Seq("k"))
      Bucketing.writeBucketed(dim, "b_dim", "k", 8, sortCols = Seq("k"))

      val joined = Bucketing.bucketedJoin(spark, "b_facts", "b_dim", "k")
      assert(Bucketing.hasShuffleFreeJoin(joined),
        joined.queryExecution.executedPlan.toString)
      assert(joined.count() === 10000)

      // control: the same join on unbucketed frames DOES shuffle
      val control = facts.join(dim, Seq("k"))
      assert(!Bucketing.hasShuffleFreeJoin(control))
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_facts")
      spark.sql("DROP TABLE IF EXISTS b_dim")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
