package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ShingleExpressionsSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  /** The HOF form graft_shingles replaces — any drift between the two is a
    * correctness bug, not a perf trade. */
  private def hofShingles(n: Int) =
    expr(s"""CASE WHEN size(tokens) >= $n
      | THEN array_distinct(transform(sequence(1, size(tokens) - ${n - 1}),
      |   i -> concat_ws(' ', slice(tokens, i, $n))))
      | ELSE array() END""".stripMargin)

  private def nativeShingles(n: Int) =
    expr(s"""CASE WHEN size(tokens) >= $n
      | THEN graft_shingles(tokens, $n)
      | ELSE array() END""".stripMargin)

  test("graft_shingles equals the HOF form on a randomized corpus (n = 3 and 5)") {
    val rng = new scala.util.Random(42)
    val vocab = Vector("a", "bb", "ccc", "dd", "e", "ffff", "café", "x1", "-", "..")
    val docs = (0 until 400).map { i =>
      val len = rng.nextInt(12) // 0..11 tokens: short docs hit the CASE guard
      (i.toLong, (0 until len).map(_ => vocab(rng.nextInt(vocab.size))).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
      .withColumn("tokens", split(trim(col("text")), "\\s+"))
    for (n <- Seq(3, 5)) {
      val both = df.select(col("doc_id"),
        hofShingles(n).as("hof"), nativeShingles(n).as("nat"))
      // exact equality including element ORDER (first occurrence)
      assert(both.filter(not(col("hof") <=> col("nat"))).count() === 0L,
        s"n=$n: native shingles differ from the HOF form")
    }
  }

  test("graft_shingles: repeated grams dedup to first occurrence, order kept") {
    val df = Seq((1L, "a b a b a b")).toDF("doc_id", "text")
      .withColumn("tokens", split(trim(col("text")), "\\s+"))
    val got = df.select(nativeShingles(3).as("sh")).head().getSeq[String](0)
    assert(got === Seq("a b a", "b a b"))
  }

  test("graft_shingles: fewer than n tokens yields an empty array") {
    val df = Seq((1L, "a b"), (2L, ""), (3L, "   ")).toDF("doc_id", "text")
      .withColumn("tokens", split(trim(col("text")), "\\s+"))
    val got = df.select(nativeShingles(3).as("sh"))
      .collect().map(_.getSeq[String](0))
    assert(got.forall(_.isEmpty))
  }

  test("graft_shingles agrees with the HOF form under codegen and interpreted eval") {
    // force both paths: wholestage on (default) and off
    val df = Seq((1L, "w1 w2 w3 w4 w5 w2 w3 w4")).toDF("doc_id", "text")
      .withColumn("tokens", split(trim(col("text")), "\\s+"))
    val expected = df.select(hofShingles(3).as("sh")).head().getSeq[String](0)
    for (flag <- Seq("true", "false")) {
      spark.conf.set("spark.sql.codegen.wholeStage", flag)
      try {
        val got = df.select(nativeShingles(3).as("sh")).head().getSeq[String](0)
        assert(got === expected, s"wholeStage=$flag")
      } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }
}
