package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed second-moment statistics with deterministic results.
  *
  * Spark's built-in `corr`/`covar_samp` stream doubles through Welford-style
  * updates, so the result depends on partition order — fine for analytics,
  * fatal for a reproducibility gate. Here every moment is an EXACT decimal
  * sum (one aggregation pass, map-side partial) and the statistic is
  * derived from those sums in a fixed IEEE op order — bit-identical on any
  * partitioning and any engine that follows the same formula.
  */
object Stats {

  /** Exact interpolated percentiles via a distributed range-sort instead
    * of the built-in `percentile` aggregate. The aggregate is a
    * TypedImperativeAggregate: every partial task builds a value→count
    * OpenHashMap, serializes it, and ONE final task merges and sorts the
    * whole distinct-value set — measured 3.5 s for 600k rows (583k
    * distinct) where this path takes ~0.5 s. Here the values are
    * range-sorted across partitions (the engine's standard two-pass
    * prefix-sum shape — nllTiles/Drift/tokenSpans), per-partition counts
    * (bounded by the partition count, the established driver-side class)
    * locate the global order statistics each probability needs, and a
    * second pass extracts just those rows. The interpolation replicates
    * Spark's Percentile.getPercentile expression order —
    * (higher − pos)·lowerV + (pos − lower)·higherV with pos = p·(n−1) —
    * so results are bit-identical to the aggregate (StatsSpec asserts it).
    * Returns one double per probability; nulls are excluded like the
    * aggregate does.
    */
  def exactPercentiles(df: DataFrame, valueCol: String,
      probs: Seq[Double]): Seq[Double] = {
    require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
      s"probabilities must be in [0,1]: $probs")
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val sorted = df.select(col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
      .repartitionByRange(parts, col("v"))
      .sortWithinPartitions("v")
    val rdd = sorted.rdd.map(_.getDouble(0))
    val perPart = rdd.mapPartitionsWithIndex(
        (i, it) => Iterator.single((i, it.size.toLong)),
        preservesPartitioning = true)
      .collect().sortBy(_._1).map(_._2)
    val offsets = perPart.scanLeft(0L)(_ + _)
    val n = offsets.last
    require(n > 0, s"exactPercentiles($valueCol) over an empty input")
    val positions = probs.map(p => p * (n - 1))
    val needed = positions
      .flatMap(pos => Seq(pos.floor.toLong, pos.ceil.toLong)).toSet
    val found = rdd.mapPartitionsWithIndex { (i, it) =>
      var idx = offsets(i) - 1
      it.flatMap { v =>
        idx += 1
        if (needed.contains(idx)) Iterator((idx, v)) else Iterator.empty
      }
    }.collect().toMap
    positions.map { pos =>
      val lower = pos.floor.toLong
      val higher = pos.ceil.toLong
      if (higher == lower) found(lower)
      else (higher - pos) * found(lower) + (pos - lower) * found(higher)
    }
  }

  /** Pearson correlation + sample covariance of two numeric columns in one
    * pass. Output: (n, mean_x, mean_y, cov_samp, corr) — all doubles
    * derived from exact sums; null corr when either variance is zero.
    */
  def exactCorrelation(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    def dec(c: String): Column = col(c).cast("decimal(18,2)")
    val agg = df.agg(
      count(lit(1)).as("n"),
      sum(dec(xCol)).as("sx"),
      sum(dec(yCol)).as("sy"),
      sum(dec(xCol) * dec(yCol)).as("sxy"),
      sum(dec(xCol) * dec(xCol)).as("sxx"),
      sum(dec(yCol) * dec(yCol)).as("syy"))
    // every factor cast to double FIRST (each an exact decimal), then one
    // fixed arithmetic shape — the oracle mirrors this op order exactly
    val n = col("n").cast("double")
    val (sx, sy) = (col("sx").cast("double"), col("sy").cast("double"))
    val (sxy, sxx, syy) = (col("sxy").cast("double"), col("sxx").cast("double"), col("syy").cast("double"))
    val covNum = n * sxy - sx * sy
    val varX = n * sxx - sx * sx
    val varY = n * syy - sy * sy
    agg.select(
      col("n"),
      (sx / n).as("mean_x"),
      (sy / n).as("mean_y"),
      (covNum / (n * (n - lit(1.0)))).as("cov_samp"),
      when(varX > 0 && varY > 0, covNum / (sqrt(varX) * sqrt(varY)))
        .otherwise(lit(null).cast("double")).as("corr"))
  }

  /** Simpson's-paradox screen over two BINARY indicators (Simpson 1951;
    * the aggregation trap every metrics dashboard eventually falls
    * into): the pooled association between x and y can carry the
    * OPPOSITE sign of every per-stratum association when stratum sizes
    * confound — a pipeline that reports only the pooled number ships
    * the wrong conclusion. Per stratum and pooled, the exact covariance
    * numerator n·Σxy − Σx·Σy (an integer whose SIGN is the association
    * direction — no division, no rounding anywhere), plus a `reversed`
    * flag where a stratum's sign is nonzero and opposite to the pooled
    * sign.
    *
    * Output: one row per stratum — (stratum, n, n_x, n_y, n_xy,
    * assoc_num, pooled_num, reversed).
    *
    * Scale shape: one keyed groupBy + the blessed broadcast-1-row
    * pooled combine. Overflow bound: n·n_xy exact while n ≤ 3·10⁹ rows
    * per stratum.
    */
  def simpsonScreen(df: DataFrame, stratumCol: String, xCol: Column,
      yCol: Column): DataFrame = {
    val base = df.select(col(stratumCol).as("stratum"),
      when(xCol, 1L).otherwise(0L).as("x"),
      when(yCol, 1L).otherwise(0L).as("y"))
    val per = base.groupBy("stratum").agg(
      count(lit(1)).as("n"), sum("x").as("n_x"), sum("y").as("n_y"),
      sum(col("x") * col("y")).as("n_xy"))
      .withColumn("assoc_num", expr("n * n_xy - n_x * n_y"))
    val pooled = per.agg(sum("n").as("_tn"), sum("n_x").as("_tx"),
        sum("n_y").as("_ty"), sum("n_xy").as("_txy"))
      .select(expr("_tn * _txy - _tx * _ty").as("pooled_num"))
    per.crossJoin(broadcast(pooled))
      .withColumn("reversed",
        col("assoc_num") =!= 0L && col("pooled_num") =!= 0L &&
          (col("assoc_num") > 0L) =!= (col("pooled_num") > 0L))
      .select("stratum", "n", "n_x", "n_y", "n_xy", "assoc_num",
        "pooled_num", "reversed")
  }
}
