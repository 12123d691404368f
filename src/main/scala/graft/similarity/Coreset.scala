package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** k-center greedy coreset selection (farthest-point sampling — the
  * Gonzalez 2-approximation, the standard data-pruning / diverse-subset
  * primitive, e.g. Sener & Savarese's core-set active learning): pick
  * the point farthest from everything chosen so far, k times. The
  * result is a maximally-spread k-subset plus the k-center objective
  * (the corpus coverage radius — how far the worst-covered point sits
  * from its nearest center).
  *
  * Exactness contract: coordinates are quantized ONCE to integer micros
  * (floor(x·10⁶ + 0.5) — identical on both engines), distances are
  * exact Long squared-L2 sums, the argmax tie-breaks to the smaller id
  * — the full selection trajectory replays bit-for-bit.
  *
  * Scale shape: the classic incremental form — each of the k rounds is
  * ONE projection over the corpus (squared distance to the single new
  * center, `least` with the running minimum) + one 1-row argmax
  * aggregate; never a corpus × chosen join. The driver sees exactly one
  * row per round (the new center — bounded by contract, the BPE-merge
  * pattern), and per-round state is lineage-truncated with an eager
  * localCheckpoint so the composed plan stays flat. Total work
  * k·O(n·d), the textbook optimum for exact greedy k-center.
  */
object Coreset {

  /** Greedy k-center selection over an embedding column. Output:
    * (sel_round, center_id, sel_d2) for rounds 1..k — sel_d2 is the squared
    * micro-distance at which that center was selected (−1 sentinel for
    * the seed, which is the minimum id) — plus a final row
    * (k+1, −1, objective): the corpus coverage radius² after all k.
    */
  def kCenterGreedy(df: DataFrame, keyCol: String, k: Int,
      embCol: String = "embedding"): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val quant = df.select(col(keyCol).cast("long").as("vec_id"), expr(
      s"transform($embCol, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0D + 0.5D) AS BIGINT))")
      .as("vq"))
    val d2 = "aggregate(zip_with(vq, cq, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)"
    // exhaustion (fewer than k points) is detected LAZILY inside the
    // selection loop — the argmax running dry — rather than by an eager
    // distinct-count pass: the misconfiguration guard must not cost the
    // happy path an extra corpus scan per invocation
    // seed: the minimum id (deterministic, data-independent choice)
    val seedRows = quant.orderBy(col("vec_id")).limit(1).collect()
    require(seedRows.nonEmpty,
      s"kCenterGreedy needs at least k=$k points, corpus is empty")
    val seed = seedRows(0)
    var chosen = Vector((1L, seed.getLong(0), -1L))
    var center = Seq((seed.getLong(0), seed.getSeq[Long](1))).toDF("cid", "cq")
    // state: every point's exact squared distance to its nearest center
    var state = quant.crossJoin(broadcast(center))
      .select(col("vec_id"), col("vq"), expr(d2).as("mind2"))
      .localCheckpoint()
    for (r <- 2 to k.toInt) {
      val chosenIds = chosen.map(_._2)
      val nextRows = state.filter(!col("vec_id").isin(chosenIds: _*))
        .orderBy(col("mind2").desc, col("vec_id")).limit(1)
        .collect()
      require(nextRows.nonEmpty,
        s"kCenterGreedy needs at least k=$k points, corpus exhausted after ${r - 1}")
      val next = nextRows(0)
      chosen :+= ((r.toLong, next.getLong(0), next.getLong(2)))
      center = Seq((next.getLong(0), next.getSeq[Long](1))).toDF("cid", "cq")
      state = state.crossJoin(broadcast(center))
        .select(col("vec_id"), col("vq"),
          least(col("mind2"), expr(d2)).as("mind2"))
        .localCheckpoint()
    }
    val objective = state.agg(max("mind2")).collect()(0).getLong(0)
    (chosen :+ ((k + 1L, -1L, objective)))
      .toDF("sel_round", "center_id", "sel_d2")
  }

  /** DuckDB oracle for [[kCenterGreedy]] with the k rounds unrolled as
    * chained MATERIALIZED CTEs (every state CTE is referenced by both
    * the next selection and the next update — without MATERIALIZED the
    * inlined replay goes exponential, same defect class as
    * [[graft.graph.Graph.hitsOracleSql]]). `sourceCte` must produce
    * (vec_id, embedding).
    */
  def kCenterOracleSql(sourceCte: String, k: Int): String = {
    val d2 = (a: String, b: String) =>
      s"list_sum(list_transform(list_zip($a, $b), z -> (z[1] - z[2]) * (z[1] - z[2])))"
    val steps = (2 to k).map { r =>
      s"""sel$r AS MATERIALIZED (SELECT m.vec_id, m.vq, m.mind2 FROM m${r - 1} m
         |  WHERE m.vec_id NOT IN (SELECT vec_id FROM ch${r - 1})
         |  ORDER BY m.mind2 DESC, m.vec_id LIMIT 1),
         |ch$r AS MATERIALIZED (SELECT vec_id FROM ch${r - 1} UNION ALL SELECT vec_id FROM sel$r),
         |m$r AS MATERIALIZED (SELECT m.vec_id, m.vq,
         |    least(m.mind2, ${d2("m.vq", "s.vq")}) AS mind2
         |  FROM m${r - 1} m CROSS JOIN sel$r s)""".stripMargin
    }.mkString(",\n")
    val rows = (2 to k).map { r =>
      s"SELECT CAST($r AS BIGINT) AS sel_round, vec_id AS center_id, CAST(mind2 AS BIGINT) AS sel_d2 FROM sel$r"
    }.mkString("\nUNION ALL ")
    s"""WITH src AS ($sourceCte),
       |e AS MATERIALIZED (SELECT vec_id, list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS vq FROM src),
       |c1 AS MATERIALIZED (SELECT vec_id, vq FROM e ORDER BY vec_id LIMIT 1),
       |ch1 AS MATERIALIZED (SELECT vec_id FROM c1),
       |m1 AS MATERIALIZED (SELECT e.vec_id, e.vq, ${d2("e.vq", "c.vq")} AS mind2
       |  FROM e CROSS JOIN c1 c),
       |$steps
       |SELECT CAST(1 AS BIGINT) AS sel_round, vec_id AS center_id, CAST(-1 AS BIGINT) AS sel_d2 FROM c1
       |UNION ALL $rows
       |UNION ALL SELECT CAST(${k + 1} AS BIGINT), CAST(-1 AS BIGINT),
       |  CAST((SELECT max(mind2) FROM m$k) AS BIGINT)""".stripMargin
  }
}
