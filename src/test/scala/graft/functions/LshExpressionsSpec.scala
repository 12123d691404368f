package graft.functions

import graft.SparkSpec
import graft.similarity.Similarity
import org.apache.spark.sql.functions._

class LshExpressionsSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  test("graft_lsh_buckets equals the join+groupBy sign-bucket form") {
    val rng = new scala.util.Random(7)
    val df = (0 until 200).map { i =>
      (i.toLong, Seq.fill(16)(rng.nextGaussian()))
    }.toDF("vec_id", "embedding")

    val nPlanes = 4
    val numTables = 8
    val seed = 42L

    // the pre-optimization reference formulation
    val dim = 16
    val planes = (0 until numTables).flatMap { t =>
      Similarity.hyperplanes(dim, nPlanes, seed + t).map { case (p, vec) => (t, p, vec) }
    }
    val planesDf = spark.createDataFrame(planes).toDF("table_id", "plane_id", "pvec")
    val reference = Similarity.withNorm(df, "embedding")
      .select(col("vec_id"), col("v"))
      .join(broadcast(planesDf))
      .withColumn("bit",
        when(expr("graft_dot(pvec, v) > 0"), expr("shiftleft(1L, plane_id)")).otherwise(0L))
      .groupBy(col("vec_id"), col("table_id"))
      .agg(sum(col("bit")).as("bucket"))

    val native = Similarity.withBuckets(df, "vec_id", nPlanes, numTables, seed)

    assert(native.count() === 200L * numTables)
    assert(native.exceptAll(reference).count() === 0L)
    assert(reference.exceptAll(native).count() === 0L)
  }
}
