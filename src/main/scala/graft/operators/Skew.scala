package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salting for hot keys.
  *
  * AQE's skew-join splitting (enabled in GraftSession) handles most runtime
  * skew; salting is the explicit tool for the cases AQE can't fix — a
  * heavily hot GROUP BY key, or a shuffle join where one key holds a large
  * fraction of the rows. At 100 TB a single hot key serializes one reducer;
  * salting fans it out across `saltBuckets` partial groups.
  */
object Skew {

  /** Salted two-phase aggregation: partial aggregate on (key, salt), final
    * aggregate on key. The caller supplies DECOMPOSABLE partials — e.g.
    * count → sum of partial counts, sum → sum of partial sums — via
    * `partialAggs` (applied per salt group) and `finalAggs` (applied to
    * merge the partials).
    */
  def saltedAggregate(df: DataFrame, keyCols: Seq[String], saltBuckets: Int,
      partialAggs: Seq[Column], finalAggs: Seq[Column]): DataFrame = {
    require(saltBuckets > 1, "saltBuckets must be > 1")
    // Salt from the row POSITION, not the row content: duplicate rows (the
    // defining feature of a hot key) would all hash to one bucket and
    // defeat the fan-out. The salt only routes rows to partial groups —
    // the final merge is salt-agnostic — so results are independent of the
    // particular salt assignment.
    val salted = df.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(saltBuckets.toLong)))
    val partial = salted
      .groupBy((keyCols :+ "_salt").map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    partial
      .groupBy(keyCols.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Convenience: salted count+sum per key (the common hot-key shape). */
  def saltedCountSum(df: DataFrame, keyCols: Seq[String], valueCol: String,
      saltBuckets: Int = 16): DataFrame =
    saltedAggregate(df, keyCols, saltBuckets,
      partialAggs = Seq(count(lit(1)).as("_n"), sum(col(valueCol)).as("_s")),
      finalAggs = Seq(sum(col("_n")).as("n"), sum(col("_s")).as("total")))

  /** Salted join for a skewed LEFT side against a small-ish right side that
    * is too big to broadcast outright: replicate the right side once per
    * salt bucket, salt the left deterministically, join on (key, salt).
    * Right-side replication is `saltBuckets`×, so this is for the
    * "medium dim, hot fact keys" regime; truly small dims should just
    * broadcast (and truly huge ones want AQE skew handling instead).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltBuckets: Int = 8, joinType: String = "inner"): DataFrame = {
    require(saltBuckets > 1, "saltBuckets must be > 1")
    val saltedLeft = left.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(saltBuckets.toLong)).cast("int"))
    val replicatedRight = right.withColumn("_salt",
      explode(expr(s"sequence(0, ${saltBuckets - 1})")))
    saltedLeft.join(replicatedRight, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
