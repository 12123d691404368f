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
    // per-stage wall/task accounting: prints every stage over 50 ms
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = (for (a <- si.completionTime; b <- si.submissionTime) yield a - b).getOrElse(-1L)
        if (ms >= 50)
          println(f"STAGE ${si.stageId}%4d ${ms / 1000.0}%7.3f s tasks=${si.numTasks}%4d ${si.name.takeWhile(_ != '(')}%-20s ${si.details.linesIterator.toSeq.drop(1).headOption.getOrElse("")}")
      }
    })
    val t = graft.core.Tables(spark, sfDir)

    if (want("simhash")) {
      println("== q_simhash ==")
      val docs = t.documents
      // warm pass of the full registered pipeline
      Dedup.acceptPairsByJaccard(docs,
        Dedup.simHashPairs(docs, "doc_id", bands = 8, maxHamming = 15),
        "doc_id", n = 3, minJaccard = 0.5).count()
      spark.catalog.clearCache()
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
      def edges = t.orders
        .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_partkey") * 2 + 1).as("dst"))
        .distinct()
      // warm pass: JIT/codegen of the whole path before any timing
      graft.graph.Graph.hitsMicros(edges, iterations = 4).count()
      spark.catalog.clearCache()
      phase(spark, "hits: edge build")(edges)
      spark.catalog.clearCache()
      for (it <- Seq(1, 2, 4)) {
        spark.sparkContext.setJobDescription(s"hits: it=$it")
        val t0 = System.nanoTime()
        graft.graph.Graph.hitsMicros(edges, iterations = it).count()
        println(f"PROBE hits it=$it ${(System.nanoTime() - t0) / 1e9}%8.3f s")
        spark.catalog.clearCache()
      }
      // repeat at 4 to see cache-warm steady state
      spark.sparkContext.setJobDescription("hits: it=4 again")
      val t1 = System.nanoTime()
      graft.graph.Graph.hitsMicros(edges, iterations = 4).count()
      println(f"PROBE hits it=4b ${(System.nanoTime() - t1) / 1e9}%8.3f s")
      spark.catalog.clearCache()
    }

    if (want("setsim")) {
      println("== q_setsim (prefixFilterJaccardPairs phases) ==")
      val docs = t.documents
      // warm
      Dedup.prefixFilterJaccardPairs(docs, "doc_id", minJaccard = 0.5,
        maxDfRatio = 0.2, precomputedDf = Some(graft.dedup.PairGraph.documentsShingleStats(spark, sfDir, 3))).count()
      spark.catalog.clearCache()
      for (rep <- 1 to 2) {
        spark.sparkContext.setJobDescription("setsim: full")
        var t0 = System.nanoTime()
        Dedup.prefixFilterJaccardPairs(docs, "doc_id", minJaccard = 0.5,
          maxDfRatio = 0.2, precomputedDf = Some(graft.dedup.PairGraph.documentsShingleStats(spark, sfDir, 3))).count()
        println(f"PROBE setsim: full rep$rep ${(System.nanoTime() - t0) / 1e9}%8.3f s")
        spark.catalog.clearCache()
        // phase: candidate generation only (same internals, public pieces)
        val arr = Dedup.shingleArrays(docs, "doc_id").filter(size(col("sh")) > 0).cache()
        t0 = System.nanoTime()
        arr.write.format("noop").mode("overwrite").save()
        println(f"PROBE setsim: arr fill rep$rep ${(System.nanoTime() - t0) / 1e9}%8.3f s parts=" + arr.rdd.getNumPartitions)
        spark.catalog.clearCache()
      }
      // containment full
      spark.sparkContext.setJobDescription("containment: full")
      val t1 = System.nanoTime()
      Dedup.containmentPairs(docs, "doc_id", minContainment = 0.7, maxDfRatio = 0.2, precomputedDf = Some(graft.dedup.PairGraph.documentsShingleStats(spark, sfDir, 3))).count()
      println(f"PROBE containment: full ${(System.nanoTime() - t1) / 1e9}%8.3f s")
      spark.catalog.clearCache()
      // volume breakdown: replicate the internal pipeline with counts
      locally {
        val tMicros = 500000L
        val rMicros = 200000L
        val arr = Dedup.shingleArrays(docs, "doc_id").filter(size(col("sh")) > 0).cache()
        val long = arr.select(col("doc_id"), explode(col("sh")).as("shingle"))
        val nDocs = arr.agg(count(lit(1)).as("_n"))
        val dfreq = graft.dedup.PairGraph.documentsShingleStats(spark, sfDir, 3)
          .select("shingle", "_df")
          .crossJoin(broadcast(nDocs))
          .withColumn("_stop", col("_df") * 1000000L > col("_n") * lit(rMicros))
          .select("shingle", "_df", "_stop")
        val t0 = System.nanoTime()
        val os = long.join(dfreq, Seq("shingle"))
          .groupBy("doc_id")
          .agg(sort_array(collect_list(struct(col("_df"), col("shingle"), col("_stop")))).as("_os"))
          .select(col("doc_id"),
            expr("transform(_os, s -> s.shingle)").as("_tF"),
            expr("transform(filter(_os, s -> NOT s._stop), s -> s.shingle)").as("_tR"),
            size(col("_os")).cast("long").as("sz"),
            expr("CAST(size(filter(_os, s -> NOT s._stop)) AS BIGINT)").as("szRed"))
          .withColumn("_ceilT", expr(s"(${tMicros}L * sz + 999999) div 1000000"))
          .withColumn("_req", col("_ceilT") - (col("sz") - col("szRed")))
          .select(col("doc_id"), col("sz"), col("szRed"), col("_req"), col("_ceilT"),
            posexplode(expr("CASE WHEN _req >= 1 " +
              "THEN slice(_tR, 1, CAST(szRed - _req + 1 AS INT)) " +
              "ELSE slice(_tF, 1, CAST(sz - _ceilT + 1 AS INT)) END")).as(Seq("_pos", "shingle")))
          .select(col("doc_id"), col("sz"), col("_pos"), col("shingle"))
          .localCheckpoint()
        println(f"PROBE setsim: emitted rows = ${os.count()} in ${(System.nanoTime()-t0)/1e9}%8.3f s")
        val t1 = System.nanoTime()
        val rawcand = os.toDF("doc_a", "size_a", "pos_a", "shingle")
          .join(os.toDF("doc_b", "size_b", "pos_b", "shingle"), Seq("shingle"))
          .filter(col("doc_a") < col("doc_b") &&
            least(col("size_a"), col("size_b")) * 1000000L >=
              lit(tMicros) * greatest(col("size_a"), col("size_b")))
        println(f"PROBE setsim: raw cand = ${rawcand.count()} in ${(System.nanoTime()-t1)/1e9}%8.3f s")
        val t2 = System.nanoTime()
        val cand = rawcand
          .filter((lit(1L) + least(col("size_a") - 1 - col("pos_a"),
              col("size_b") - 1 - col("pos_b"))) * lit(1000000L + tMicros) >=
            lit(tMicros) * (col("size_a") + col("size_b")))
          .select("doc_a", "doc_b").distinct().localCheckpoint()
        println(f"PROBE setsim: pos-filt cand = ${cand.count()} in ${(System.nanoTime()-t2)/1e9}%8.3f s")
        val t3 = System.nanoTime()
        val sized = arr.select(col("doc_id"), col("sh"), size(col("sh")).cast("long").as("sz2"))
        val hsized = sized.select(col("doc_id"),
          array_distinct(expr("transform(sh, s -> xxhash64(s))")).as("hs"), col("sz2"))
          .withColumn("loss", col("sz2") - size(col("hs")).cast("long"))
        val screened = cand
          .join(hsized.toDF("doc_a", "hs_a", "size_a", "loss_a"), Seq("doc_a"))
          .join(hsized.toDF("doc_b", "hs_b", "size_b", "loss_b"), Seq("doc_b"))
          .withColumn("_ih", size(array_intersect(col("hs_a"), col("hs_b"))).cast("long"))
          .filter(col("_ih") + col("loss_a") + col("loss_b") > 0 &&
            (col("_ih") + col("loss_a") + col("loss_b")) * lit(1000000L + tMicros) >=
              lit(tMicros) * (col("size_a") + col("size_b")))
          .select("doc_a", "doc_b")
        println(f"PROBE setsim: screened = ${screened.count()} in ${(System.nanoTime()-t3)/1e9}%8.3f s")
        spark.catalog.clearCache()
      }
      // AQE off A/B (runtime conf) — isolates AQE stage-sequencing latency
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      for (rep <- 1 to 2) {
        spark.sparkContext.setJobDescription("setsim: full noAQE")
        val t2 = System.nanoTime()
        Dedup.prefixFilterJaccardPairs(docs, "doc_id", minJaccard = 0.5,
          maxDfRatio = 0.2, precomputedDf = Some(graft.dedup.PairGraph.documentsShingleStats(spark, sfDir, 3))).count()
        println(f"PROBE setsim: full noAQE rep$rep ${(System.nanoTime() - t2) / 1e9}%8.3f s")
        spark.catalog.clearCache()
      }
      val t3 = System.nanoTime()
      Dedup.containmentPairs(docs, "doc_id", minContainment = 0.7, maxDfRatio = 0.2, precomputedDf = Some(graft.dedup.PairGraph.documentsShingleStats(spark, sfDir, 3))).count()
      println(f"PROBE containment: full noAQE ${(System.nanoTime() - t3) / 1e9}%8.3f s")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
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
