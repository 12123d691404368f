package graft

import org.apache.spark.sql.functions._

/** Scale-path validation for similarity search: generates a synthetic
  * corpus (seeded, in /tmp) much larger than the shipped fixtures and
  * measures brute-force cosine top-k vs LSH-bucketed top-k — wall time and
  * recall@k. Usage: runMain graft.ScaleBench [nVectors] [dim] [k]
  */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(50000)
    val dim = args.lift(1).map(_.toInt).getOrElse(64)
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = graft.core.GraftSession.local(8)
    import spark.implicits._

    val path = s"/tmp/graft-scale-vectors-$n-$dim"
    if (!new java.io.File(path).exists()) {
      // hash-based components: decorrelated pseudo-random vectors (a smooth
      // sin(id*c) lattice makes every neighbor share sign patterns and
      // inflates LSH recall to 1.0). For each query id < 20, ids n..n+19 are
      // planted near-copies (small perturbation, cosine ~0.98) — the realistic
      // similar-document retrieval target.
      val base = spark.range(n).select(col("id").as("vec_id"),
        expr(s"transform(sequence(1, $dim), i -> CAST(sin(xxhash64(id, i)) AS FLOAT))")
          .as("embedding"))
      val planted = spark.range(20).select((col("id") + n).as("vec_id"),
        expr(s"transform(sequence(1, $dim), i -> CAST(sin(xxhash64(id, i)) + 0.1 * sin(xxhash64(id, i, 999)) AS FLOAT))")
          .as("embedding"))
      base.unionByName(planted).write.mode("overwrite").parquet(path)
    }
    val vecs = spark.read.parquet(path)
    val queryPred = col("vec_id") < 20
    val plantedPairs = (0L until 20L).map(q => (q, q + n)).toSet

    def timed[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$what: ${(System.nanoTime() - t0) / 1e9}%.1fs")
      r
    }

    val brute = timed(s"brute-force top-$k over $n vectors") {
      graft.similarity.Similarity.bruteForceTopK(vecs, "vec_id", queryPred, k)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    println(f"  planted-neighbor recall: ${plantedPairs.intersect(brute).size / 20.0}%.2f")
    for ((planes, tables) <- Seq((8, 4), (8, 8), (12, 8))) {
      val lsh = timed(s"LSH($planes planes x $tables tables) top-$k") {
        graft.similarity.Similarity.lshTopK(vecs, "vec_id", queryPred, k,
          nPlanes = planes, numTables = tables)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      println(f"  brute-agreement recall@$k: ${lsh.intersect(brute).size.toDouble / brute.size}%.3f" +
        f"   planted-neighbor recall: ${plantedPairs.intersect(lsh).size / 20.0}%.2f")
    }
    for ((clusters, probe) <- Seq((64, 8), (256, 16))) {
      val ivf = timed(s"IVF($clusters cells, probe $probe) top-$k") {
        graft.similarity.Similarity.ivfTopK(vecs, "vec_id", queryPred, k,
          nClusters = clusters, nProbe = probe)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      println(f"  brute-agreement recall@$k: ${ivf.intersect(brute).size.toDouble / brute.size}%.3f" +
        f"   planted-neighbor recall: ${plantedPairs.intersect(ivf).size / 20.0}%.2f")
    }
    spark.stop()
  }
}
