package graft.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sampling operators for training-data curation.
  *
  * Both are HASH-based rather than RNG-based: the keep/drop decision is a
  * pure function of the row's key and the seed, so samples are
  * reproducible across runs, partitionings, and engines — `sampleBy`'s
  * per-row RNG draws depend on row order within partitions, which makes
  * its output unstable under repartitioning (and impossible to oracle).
  */
object Sampling {

  /** Stratified downsampling: per-stratum keep fractions (e.g. cap the
    * dominant language/class of a corpus). A row stays iff the uniform
    * hash of (key, seed) falls below its stratum's fraction; strata not
    * listed default to `defaultFraction`. Pure projection + filter — no
    * shuffle, fully codegen'd.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, keyCol: String,
      fractions: Map[String, Double], defaultFraction: Double = 1.0,
      seed: Long = 42L): DataFrame = {
    require((fractions.values ++ Seq(defaultFraction)).forall(f => f >= 0 && f <= 1),
      "fractions must be in [0, 1]")
    // uniform in [0, 1): low 52 bits of the hash over 2^52
    val u = (abs(xxhash64(col(keyCol), lit(seed))) % lit(1L << 52)).cast("double") /
      lit((1L << 52).toDouble)
    val frac = fractions.foldLeft(lit(defaultFraction)) { case (acc, (k, f)) =>
      when(col(stratumCol) === k, lit(f)).otherwise(acc)
    }
    df.filter(u < frac)
  }

  /** Class rebalancing to a target count per stratum: keeps the
    * `targetPerStratum` rows with the smallest (hash, key) rank per
    * stratum — deterministic, and exactly the target size wherever the
    * stratum has enough rows (hash-fraction sampling only hits the target
    * in expectation). One shuffle on the stratum via the rank window.
    */
  def rebalanceByCount(df: DataFrame, stratumCol: String, keyCol: String,
      targetPerStratum: Long, seed: Long = 42L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.withColumn("_rk", row_number().over(
        Window.partitionBy(col(stratumCol))
          .orderBy(xxhash64(col(keyCol), lit(seed)), col(keyCol))))
      .filter(col("_rk") <= targetPerStratum)
      .drop("_rk")
  }
}
