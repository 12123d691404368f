package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.multimodal.Multimodal

/** Round-14 phase probe (guide §1.4): times sub-phases of the slowest
  * registered queries with the noop sink so the computation is measured,
  * not the sink or count-pruning, and prints the partition count of each
  * phase's output — the round's hypothesis is that AQE byte-based
  * coalescing plus single-split local scans serialize compute-dense
  * stages. Disposable measurement tooling; not part of the registry.
  *
  * Usage: runMain graft.Probe14 [sfDir] [probe ...]
  */
object Probe14 {
  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def phase(spark: SparkSession, label: String)(df: => DataFrame): DataFrame = {
    val d = df
    spark.sparkContext.setJobDescription(label)
    val t0 = System.nanoTime()
    noop(d)
    val dt = (System.nanoTime() - t0) / 1e9
    val np = d.rdd.getNumPartitions
    println(f"PROBE $label%-40s $dt%8.3f s  parts=$np")
    spark.sparkContext.setJobDescription(null)
    d
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val only = args.drop(1).toSet
    def want(p: String): Boolean = only.isEmpty || only.contains(p)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = graft.core.Tables(spark, sfDir)

    if (want("simhash")) {
      println("== q_simhash ==")
      val docs = t.documents
      val sigs = phase(spark, "simhash: sigs")(
        Dedup.simHash(docs, "doc_id")).cache()
      sigs.count()
      val width = 64 / 8
      val banded = sigs.select(col("doc_id"), col("simhash"),
        explode(expr(
          s"transform(sequence(0, 7), b -> named_struct('band', b, 'key', (simhash >> (b * $width)) & ${(1L << width) - 1}L))"))
          .as("bk"))
        .select(col("doc_id"), col("simhash"), col("bk.band"), col("bk.key"))
      val raw = banded.toDF("doc_a", "sig_a", "band", "key")
        .join(banded.toDF("doc_b", "sig_b", "band", "key"), Seq("band", "key"))
        .filter(col("doc_a") < col("doc_b"))
        .withColumn("hamming", expr("bit_count(sig_a ^ sig_b)"))
        .filter(col("hamming") <= 15)
        .select("doc_a", "doc_b", "hamming")
      val rawp = phase(spark, "simhash: band-join+hamming")(raw)
      println("PROBE simhash raw pair count = " + rawp.count())
      val cand = phase(spark, "simhash: distinct")(
        raw.select("doc_a", "doc_b").distinct())
      println("PROBE simhash cand count = " + cand.count())
      phase(spark, "simhash: accept re-rank")(
        Dedup.acceptPairsByJaccard(docs, cand, "doc_id", n = 3, minJaccard = 0.5))
      spark.catalog.clearCache()
    }

    if (want("hits")) {
      println("== q_hits ==")
      val edges = t.orders
        .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_partkey") * 2 + 1).as("dst"))
        .distinct()
      phase(spark, "hits: edge build")(edges)
      spark.sparkContext.setJobDescription("hits: full")
      val t0 = System.nanoTime()
      graft.graph.Graph.hitsMicros(edges, iterations = 4).count()
      println(f"PROBE hits: full ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      spark.catalog.clearCache()
    }

    if (want("setsim")) {
      println("== q_setsim (prefixFilterJaccardPairs phases) ==")
      val docs = t.documents
      val arr = phase(spark, "setsim: shingleArrays")(
        Dedup.shingleArrays(docs, "doc_id").filter(size(col("sh")) > 0)).cache()
      arr.count()
      spark.sparkContext.setJobDescription("setsim: full")
      val t0 = System.nanoTime()
      val full = Dedup.prefixFilterJaccardPairs(docs, "doc_id", minJaccard = 0.5,
        maxDfRatio = 0.1)
      full.count()
      println(f"PROBE setsim: full ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      spark.catalog.clearCache()
    }

    if (want("img")) {
      println("== q_imgdedup phases ==")
      val docs = t.documents.select("doc_id")
      val images = Multimodal.syntheticBlockImages(docs, "doc_id")
      phase(spark, "img: synth+encode")(images)
      val hashes = phase(spark, "img: dHashes(synth+decode)")(
        Multimodal.dHashes(images, "img_id")).localCheckpoint()
      phase(spark, "img: pairs")(graft.dedup.ImageDedup.dHashPairs(
        hashes, "img_id", bands = 4, maxHamming = 3))
      spark.catalog.clearCache()
    }

    if (want("emb")) {
      println("== q_embdedup / ann partitions ==")
      val emb = t.embeddings
      println("embeddings scan parts = " + emb.rdd.getNumPartitions)
      spark.sparkContext.setJobDescription("embdedup: full")
      val t0 = System.nanoTime()
      Dedup.embeddingNearDupsScalable(emb
        .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("embedding")),
        "vec_id", 0.5, nPlanes = 4, numTables = 16)
        .filter(col("cosine") >= 0.95).count()
      println(f"PROBE embdedup full ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      spark.catalog.clearCache()
    }

    spark.stop()
  }
}
