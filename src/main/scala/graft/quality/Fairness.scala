package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Group-fairness audit over a binary classifier's decisions — the
  * parity screen a curation pipeline runs before a score-gated filter
  * ships (Hardt et al.'s equalized odds, the demographic-parity
  * selection-rate staple): per protected group (language, source
  * domain, …) the confusion cells, selection/TPR/FPR rates, and each
  * rate's gap to the corpus-wide reference — a filter that silently
  * drops one language's documents at 3× the rate of another's shows up
  * here as a selection-rate gap, not anecdote.
  *
  * Exactness contract: all cells are exact Long counts; every rate
  * rounds ONCE via `div` micros and gaps subtract the already-rounded
  * micros — bit-replayable on any engine. Degenerate groups (no
  * positives / no negatives) emit −1 sentinel rates rather than nulls,
  * so schema and comparisons stay total.
  *
  * Scale shape: ONE map-side-combinable groupBy over the data plus a
  * broadcast 1-row global aggregate — group cardinality is the only
  * thing that shuffles.
  */
object Fairness {

  private def rate(num: String, den: String): org.apache.spark.sql.Column =
    when(expr(den) === 0, lit(-1L)).otherwise(expr(s"($num) * 1000000L div ($den)"))

  /** Per-group parity audit: (group, n, tp, fp, fn, tn, sel_micros,
    * tpr_micros, fpr_micros, sel_gap_micros, tpr_gap_micros,
    * fpr_gap_micros). `labelCol`/`predCol` are 0/1 integers; gap columns
    * are −1 when either side's rate is degenerate.
    */
  def groupParityAudit(df: DataFrame, groupCol: String, labelCol: String,
      predCol: String): DataFrame = {
    val cells = df.select(col(groupCol).as("grp"),
        col(labelCol).cast("long").as("y"), col(predCol).cast("long").as("p"))
      .groupBy("grp")
      .agg(
        count(lit(1)).as("n"),
        sum(expr("CASE WHEN y = 1 AND p = 1 THEN 1 ELSE 0 END")).as("tp"),
        sum(expr("CASE WHEN y = 0 AND p = 1 THEN 1 ELSE 0 END")).as("fp"),
        sum(expr("CASE WHEN y = 1 AND p = 0 THEN 1 ELSE 0 END")).as("fn"),
        sum(expr("CASE WHEN y = 0 AND p = 0 THEN 1 ELSE 0 END")).as("tn"))
      .withColumn("sel_micros", rate("tp + fp", "n"))
      .withColumn("tpr_micros", rate("tp", "tp + fn"))
      .withColumn("fpr_micros", rate("fp", "fp + tn"))
    val global = cells
      .agg(sum("n").as("gn"), sum("tp").as("gtp"), sum("fp").as("gfp"),
        sum("fn").as("gfn"), sum("tn").as("gtn"))
      .withColumn("g_sel", rate("gtp + gfp", "gn"))
      .withColumn("g_tpr", rate("gtp", "gtp + gfn"))
      .withColumn("g_fpr", rate("gfp", "gfp + gtn"))
      .select("g_sel", "g_tpr", "g_fpr")
    def gap(g: String, r: String) =
      when(col(g) === -1L || col(r) === -1L, lit(-1L))
        .otherwise(abs(col(r) - col(g)))
    cells.crossJoin(broadcast(global))
      .withColumn("sel_gap_micros", gap("g_sel", "sel_micros"))
      .withColumn("tpr_gap_micros", gap("g_tpr", "tpr_micros"))
      .withColumn("fpr_gap_micros", gap("g_fpr", "fpr_micros"))
      .drop("g_sel", "g_tpr", "g_fpr")
  }
}
