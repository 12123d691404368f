package graft.text

import graft.SparkSpec
import graft.quality.Drift

/** Property-style tests for the round-7 curation operators over seeded
  * random inputs (plain seeded generation — the scalatest/scalacheck
  * bridge artifact is not on the classpath).
  */
class CurationPropertySpec extends SparkSpec {
  import spark.implicits._

  test("packing invariants hold for random weights and capacities") {
    val rnd = new scala.util.Random(17)
    for (_ <- 1 to 8) {
      val n = 20 + rnd.nextInt(400)
      val cap = 16L + rnd.nextInt(200)
      val sep = rnd.nextInt(3)
      val docs = (1L to n).map(i => (i, rnd.nextInt(3 * cap.toInt).toLong))
        .toDF("doc_id", "n_tokens")
      val seqs = CorpusCuration.packSequences(docs, cap, "n_tokens", sepTokens = sep)
        .collect().map(r => (r.getAs[Long]("seq_id"),
          r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens")))
      val total = docs.collect().map(_.getLong(1) + sep).sum
      // sequence ids are dense 0..ceil(total/cap)-1
      assert(seqs.map(_._1).sorted.toSeq === (0L until (total + cap - 1) / cap))
      // all full except possibly the last; filled slots sum to the stream
      val last = seqs.maxBy(_._1)._1
      assert(seqs.filter(_._1 != last).forall(_._3 == cap))
      assert(seqs.map(_._3).sum === total)
      // assignment slices agree with the summary per sequence
      val slices = CorpusCuration.packAssignments(docs, cap, "n_tokens", sepTokens = sep)
        .collect().map(r => r.getAs[Long]("seq_id") -> r.getAs[Long]("slice_len"))
      val bySeq = slices.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      assert(seqs.forall { case (id, _, toks) => bySeq(id) === toks })
    }
  }

  test("PSI of a distribution against itself is exactly zero in every bin") {
    val rnd = new scala.util.Random(23)
    for (_ <- 1 to 5) {
      val vals = (1 to 300 + rnd.nextInt(700)).map(_ => rnd.nextDouble() * 1000)
      val df = vals.toDF("v")
      // identical counts per bin -> p == q -> (p-q)ln(p/q) == 0 exactly
      val rows = Drift.psi(df, df, "v").collect()
      assert(rows.forall(_.getAs[Long]("contrib_micros") === 0L))
      assert(rows.forall(r => r.getAs[Long]("ref_cnt") === r.getAs[Long]("cur_cnt")))
    }
  }

  test("shuffle shards partition the corpus for random sizes and shard counts") {
    val rnd = new scala.util.Random(31)
    for (_ <- 1 to 6) {
      val n = 1 + rnd.nextInt(500)
      val shards = Seq(1, 2, 4, 8, 16, 32)(rnd.nextInt(6))
      val docs = (1L to n.toLong).toDF("doc_id")
      val out = CorpusCuration.shuffleShards(docs, shards)
        .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"), r.getAs[Long]("pos")))
      assert(out.length === n && out.map(_._1).distinct.length === n)
      assert(out.forall(t => t._2 >= 0 && t._2 < shards))
      out.groupBy(_._2).values.foreach { g =>
        assert(g.map(_._3).sorted.toSeq === (1L to g.length))
      }
    }
  }

  test("gumbel top-k returns exactly min(k, n) rows and respects dominant weights") {
    val rnd = new scala.util.Random(47)
    for (_ <- 1 to 6) {
      val n = 5 + rnd.nextInt(100)
      val k = 1 + rnd.nextInt(20)
      // one doc gets an overwhelming weight: it must always be sampled
      val heavy = 1L + rnd.nextInt(n)
      val w = (1L to n.toLong).map(i =>
        (i, if (i == heavy) 100000000L else rnd.nextInt(1000).toLong))
        .toDF("doc_id", "logw_micros")
      val picked = graft.text.ImportanceSampling.gumbelTopK(w, k, salt = s"p$n")
        .collect().map(_.getAs[Long]("doc_id"))
      assert(picked.length === math.min(k, n))
      assert(picked.contains(heavy))
      assert(picked.distinct.length === picked.length)
    }
  }

  test("sentence dedup invariants hold for random duplicated corpora") {
    val rnd = new scala.util.Random(31)
    val vocab = Vector("alpha beta", "gamma delta", "epsilon zeta", "eta theta",
      "iota kappa", "lambda mu", "nu xi", "omicron pi", "rho sigma", "tau upsilon")
    for (_ <- 1 to 6) {
      val nDocs = 5 + rnd.nextInt(30)
      val docs = (1L to nDocs).map { i =>
        val k = 1 + rnd.nextInt(6)
        (i, Seq.fill(k)(vocab(rnd.nextInt(vocab.size))).mkString(". ") + ".")
      }.toDF("doc_id", "text")
      val out = CorpusCuration.sentenceDedup(docs, "doc_id").collect()
      // conservation: every emitted sentence instance is counted once
      val totalInstances = out.map(_.getAs[Long]("n_sentences")).sum
      val totalKept = out.map(_.getAs[Long]("n_kept")).sum
      // corpus-wide, kept count == number of DISTINCT sentences
      val distinctSentences = docs.collect().flatMap(
        _.getString(1).split("[.!?]+").map(_.trim).filter(_.nonEmpty)).toSet
      assert(totalKept === distinctSentences.size.toLong)
      assert(totalKept <= totalInstances)
      // first-owner rule: doc 1 (smallest id with sentences) keeps ALL its
      // distinct sentences (nothing can precede it)
      val d1 = out.find(_.getAs[Long]("doc_id") == 1L).get
      val d1Distinct = docs.filter($"doc_id" === 1L).collect().head.getString(1)
        .split("[.!?]+").map(_.trim).filter(_.nonEmpty).toSet
      assert(d1.getAs[Long]("n_kept") === d1Distinct.size.toLong)
    }
  }
}
