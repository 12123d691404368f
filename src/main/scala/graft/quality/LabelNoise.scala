package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Confident-learning label-noise detection (Northcutt et al.'s
  * cleanlab core): find items whose GIVEN label disagrees with a
  * model's confident prediction, using class-conditional thresholds
  * rather than raw argmax — the data-centric screen that catches
  * systematic annotation errors before they train into a model.
  *
  * Method over a long (item, given, class, score) frame: the threshold
  * t_j for class j is the mean score_j over items GIVEN label j (exact
  * integer: sum div count, micros); an item is counted into the
  * confident joint C[given][suggested] when suggested ≠ given, its
  * score for `suggested` clears t_suggested, and `suggested` is the
  * argmax among clearing classes (ties break to the smallest class id —
  * max_by on (score, −class), deterministic). Off-diagonal mass IS the
  * estimated label-noise matrix.
  *
  * Exactness contract: thresholds round once via `div`; the argmax is
  * integer; outputs are exact counts — fully SQL-replayable.
  *
  * Scale shape: one K-row threshold aggregate (broadcast back), one
  * filtered keyed argmax groupBy(item), one K²-row count groupBy. No
  * windows, no collects.
  */
object LabelNoise {

  /** Confident joint counts: (given, suggested, n_flagged) for every
    * off-diagonal cell with mass, from a long-format score frame.
    * `scoreCol` is integer micros.
    */
  def confidentJoint(df: DataFrame, itemCol: String, givenCol: String,
      classCol: String, scoreCol: String): DataFrame = {
    val long = df.select(col(itemCol).as("item"),
      col(givenCol).cast("long").as("given"),
      col(classCol).cast("long").as("cls"),
      col(scoreCol).cast("long").as("score"))
    // Class-conditional thresholds: mean self-class score, K rows.
    val thresholds = long.filter(col("cls") === col("given"))
      .groupBy(col("cls"))
      .agg(expr("sum(score) div count(1)").as("t"))
    val clearing = long.filter(col("cls") =!= col("given"))
      .join(broadcast(thresholds), Seq("cls"))
      .filter(col("score") >= col("t"))
    clearing
      .groupBy("item", "given")
      .agg(max(struct(col("score"), (-col("cls")).as("negcls"))).as("best"))
      .select(col("given"), (-col("best.negcls")).as("suggested"))
      .groupBy("given", "suggested")
      .agg(count(lit(1)).as("n_flagged"))
  }
}
