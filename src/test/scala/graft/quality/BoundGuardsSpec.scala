package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The stated-exactness-bound guards added in round 11: each operator
  * that documents a Long-overflow bound must THROW when fed past it,
  * never return silently-aliased arithmetic. Triggered for real where
  * a bound-sized input is buildable in a spec (spearman 1.2e6 pairs,
  * Krippendorff 3e6 ratings, Chao1 3e6 singletons, ExactSubstr 2²⁰-token
  * doc); the Brier row bound (9e12) is parameterized and triggered
  * through the parameter.
  */
class BoundGuardsSpec extends SparkSpec {
  import spark.implicits._

  /** assert_true failures surface as a SparkException wrapping the
    * runtime error — walk the cause chain for the guard message. */
  private def interceptGuard(msgPart: String)(body: => Unit): Unit = {
    val e = intercept[Throwable](body)
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains(msgPart), s"expected guard '$msgPart' in: $msgs")
  }

  test("spearmanRho throws past the 1.2e6-pair exact-rank bound") {
    val df = spark.range(1200001L)
      .select(col("id").as("x"), col("id").as("y"))
    interceptGuard("exact-Long rank-product bound") {
      Drift.spearmanRho(df, "x", "y").collect()
    }
    // one row under the bound: no throw, exact rho = 1 on a monotone pair
    val ok = Drift.spearmanRho(
      spark.range(1000L).select(col("id").as("x"), col("id").as("y")),
      "x", "y").collect().head
    assert(math.abs(ok.getAs[Double]("rho") - 1.0) < 1e-12)
  }

  test("krippendorffAlpha throws past the 3e6-rating n^2 bound") {
    // 1.5e6+1 items x 2 raters, all one label -> n_ratings = 3,000,002
    val df = spark.range(3000002L).select(
      (col("id") / 2).cast("long").as("item"),
      (col("id") % 2).cast("int").as("rater"),
      lit("L").as("label"))
    interceptGuard("exact n^2*1e6 Long bound") {
      Agreement.krippendorffAlpha(df, "item", "rater", "label").collect()
    }
  }

  test("vocabRichness throws past the 3e6-singleton Chao1 bound") {
    // 3e6+1 docs, each one unique single-token text -> f1 = 3,000,001
    val docs = spark.range(3000001L)
      .select(col("id"), concat(lit("t"), col("id")).as("text"))
    interceptGuard("exact Chao1 Long bound") {
      graft.text.TextAnalysis.vocabRichness(docs).collect()
    }
  }

  test("calibrationSummary throws past the Brier row bound (parameterized)") {
    val df = spark.range(11L)
      .select((col("id") * 90909L).as("score_micros"),
        (col("id") % 2).cast("long").as("label"))
    interceptGuard("exact Brier-sum Long bound") {
      Calibration.calibrationSummary(df, "score_micros", "label",
        maxRowsExact = 10L).collect()
    }
    // default bound: same input passes
    assert(Calibration.calibrationSummary(df, "score_micros", "label")
      .count() === 1L)
  }

  test("suffixClassRounds throws on a 2^20-token document") {
    val big = Seq((1L, Array.fill(1 << 20)("a").mkString(" ")))
      .toDF("doc_id", "text")
    interceptGuard("packed-position bound") {
      graft.text.ExactSubstr.suffixClasses(big, "doc_id", prefixLen = 1)
    }
  }
}
