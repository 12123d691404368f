package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class CorpusCurationSpec extends SparkSpec {
  import spark.implicits._

  // One good doc, one duplicate of it, one wrong language, one too short,
  // one low quality (no stopwords, all punctuation-free short tokens).
  private lazy val docs = Seq(
    (1L, "en", "the quick brown fox jumps over the lazy dog and then runs off to the woods again with friends " * 2),
    (2L, "en", "the quick brown fox jumps over the lazy dog and then runs off to the woods again with friends " * 2),
    (3L, "de", "the quick brown fox jumps over the lazy dog and then runs off to the woods again with friends " * 2),
    (4L, "en", "too short text here"),
    (5L, "en", "zz yy xx ww vv uu tt ss rr qq pp oo nn mm ll kk jj ii hh gg ff ee dd cc bb aa " * 4)
  ).toDF("doc_id", "lang", "text")

  test("funnel accounts for every document exactly once") {
    val f = CorpusCuration.funnel(docs).collect().head
    assert(f.getAs[Long]("total_docs") === 5L)
    assert(f.getAs[Long]("dropped_lang") === 1L)    // doc 3
    assert(f.getAs[Long]("dropped_quality") === 1L) // doc 4: short AND stopword-free -> 0.3
    assert(f.getAs[Long]("dropped_length") === 0L)  // length failures already failed quality here
    assert(f.getAs[Long]("passed") === 3L)          // docs 1, 2, 5
    assert(f.getAs[Long]("distinct_passed") === 2L) // 1 == 2 by fingerprint
  }

  test("curate dedupes by fingerprint keeping the smallest doc id") {
    val out = CorpusCuration.curate(docs).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out.contains(1L) && !out.contains(2L)) // exact dup dropped
    assert(!out.contains(3L)) // language
  }

  test("contamination flags exactly the corpus docs sharing an n-gram with the benchmark") {
    val run = "alpha beta gamma delta epsilon zeta" // 6 tokens: one shared 6-gram
    val bench = Seq((100L, s"lead in $run trailing words here")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, s"prefix tokens $run and a suffix"),              // contains the run
      (2L, "alpha beta gamma delta epsilon other entirely"), // only a 5-gram prefix
      (3L, "completely unrelated content with many words")
    ).toDF("doc_id", "text")
    val hits = CorpusCuration.contamination(corpus, bench, "doc_id", n = 6).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("shared_ngrams")).toMap
    assert(hits === Map(1L -> 1L)) // doc 1 only, exactly the one shared 6-gram
  }

  test("noveltyScore counts seen vs new n-grams per candidate doc") {
    val ref = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text")
    val cands = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"), // identical: novelty 0
      (2L, "alpha beta gamma delta epsilon zeta eta NEW"),   // 3 grams, 2 seen
      (3L, "totally different words that never appeared anywhere before now"), // all new
      (4L, "too short")                                      // < n tokens: no row
    ).toDF("doc_id", "text")
    val out = CorpusCuration.noveltyScore(cands, ref, "doc_id", n = 6).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("seen_grams"), r.getAs[Long]("novelty_micros")))).toMap
    assert(!out.contains(4L))
    assert(out(1L) === ((3L, 3L, 0L)))        // 8 tokens, n=6 -> 3 grams, all seen
    assert(out(2L) === ((3L, 2L, 333333L)))   // last gram touches NEW -> 1/3 novel
    assert(out(3L)._2 === 0L)                 // nothing seen
    assert(out(3L)._3 === 1000000L)           // fully novel
  }

  test("boilerplate segments are flagged by cross-doc frequency and stripped in order") {
    val chrome = "copyright acme corp all rights" // 5-token shared footer
    val corpus = Seq(
      (1L, s"unique alpha words one two $chrome"),
      (2L, s"other beta content three four $chrome"),
      (3L, s"third gamma text five six $chrome"),
      (4L, "entirely standalone document nothing shared here")
    ).toDF("doc_id", "text")
    // 5-token segments: each doc = [5 unique tokens][chrome]; chrome df=3
    val segs = CorpusCuration.boilerplateSegments(corpus, "doc_id", segTokens = 5)
    val flagged = segs.filter($"is_boilerplate").collect()
    assert(flagged.map(_.getAs[Long]("doc_id")).sorted.toSeq === Seq(1L, 2L, 3L))
    assert(flagged.forall(_.getAs[String]("chunk") === chrome))
    assert(flagged.forall(_.getAs[Long]("doc_freq") === 3L))

    val sums = CorpusCuration.boilerplateSummary(corpus, "doc_id", segTokens = 5)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_segs"), r.getAs[Long]("n_boiler_segs"), r.getAs[Long]("boiler_micros")))).toMap
    assert(sums(1L) === ((2L, 1L, 500000L)))
    assert(sums(4L) === ((2L, 0L, 0L)))       // 8 tokens -> 2 segments, none shared

    val clean = CorpusCuration.stripBoilerplate(corpus, "doc_id", segTokens = 5)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(clean(1L) === "unique alpha words one two")
    assert(clean(4L) === "entirely standalone document nothing shared here")
  }

  test("duplicatedSpanCoverage merges overlapping spans and counts within-doc repeats") {
    val run = "alpha beta gamma delta epsilon" // 5-token cross-doc run
    val corpus = Seq(
      (1L, s"x1 x2 $run x3 x4"),                 // 9 tokens, covered 5
      (2L, s"y1 $run"),                          // 6 tokens, covered 5
      (3L, "p q r s t u v"),                     // no duplicated span
      (4L, "m1 m2 m3 m4 m5 zz m1 m2 m3 m4 m5"),  // same-doc repeat: 2 spans
      (5L, "n1 n2 n3 n4 n5 n6"),                 // 6-token run shared with 6
      (6L, "w0 n1 n2 n3 n4 n5 n6"),              // overlapping starts merge
      (7L, "a b c")                              // < k tokens: no row
    ).toDF("doc_id", "text")
    val out = CorpusCuration.duplicatedSpanCoverage(corpus, "doc_id", k = 5)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_dup_spans"),
          r.getAs[Long]("covered_tokens"), r.getAs[Long]("dup_micros")))).toMap
    assert(!out.contains(7L))
    assert(out(1L) === ((9L, 1L, 5L, 555556L)))
    assert(out(2L) === ((6L, 1L, 5L, 833333L)))
    assert(out(3L) === ((7L, 0L, 0L, 0L)))
    assert(out(4L) === ((11L, 2L, 10L, 909091L)))  // disjoint repeats both count
    assert(out(5L) === ((6L, 2L, 6L, 1000000L)))   // overlap: 1 + 5, not 10
    assert(out(6L) === ((7L, 2L, 6L, 857143L)))
  }

  test("contentDefinedChunks: exact cover, and chunks re-align after an insertion") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val edited = "INSERTED " + base // one token prepended at the front
    val corpus = Seq((1L, base), (2L, edited), (3L, "a b c")).toDF("doc_id", "text")
    val chunks = CorpusCuration.contentDefinedChunks(corpus, "doc_id").collect()
    val byDoc = chunks.groupBy(_.getAs[Long]("doc_id"))
    // chunks tile each doc exactly: starts are contiguous, lengths sum to n
    for ((id, n) <- Seq(1L -> 60, 2L -> 61, 3L -> 3)) {
      val cs = byDoc(id).sortBy(_.getAs[Int]("chunk_idx"))
      assert(cs.head.getAs[Int]("start") === 1)
      assert(cs.map(_.getAs[Int]("n_tokens")).sum === n)
      cs.sliding(2).foreach {
        case Array(a, b) => assert(b.getAs[Int]("start") ===
          a.getAs[Int]("start") + a.getAs[Int]("n_tokens"))
        case _ => ()
      }
    }
    // a doc shorter than the window is one whole chunk
    assert(byDoc(3L).length === 1)
    // CDC property: after the first boundary past the edit, the edited
    // doc's chunk hashes re-align with the original's (fixed-stride
    // chunking would shift every chunk)
    val h1 = byDoc(1L).sortBy(_.getAs[Int]("chunk_idx")).map(_.getAs[String]("chunk_hash"))
    val h2 = byDoc(2L).sortBy(_.getAs[Int]("chunk_idx")).map(_.getAs[String]("chunk_hash"))
    val shared = h1.toSet intersect h2.toSet
    assert(h1.length > 3, s"want several chunks, got ${h1.length}")
    assert(shared.size >= h1.length - 2,
      s"expected all but the first chunk(s) to re-align; shared=${shared.size}/${h1.length}")
    assert(h1.last === h2.last) // tails identical
  }

  test("temperatureMixture keeps the smallest stratum whole and downsamples by sqrt") {
    // en: 400 docs, de: 100, fr: 25 -> rates fr 1.0, de sqrt(1/4)=0.5, en sqrt(1/16)=0.25
    val corpus = (1L to 525L).map { i =>
      val lang = if (i <= 400) "en" else if (i <= 500) "de" else "fr"
      (i, lang, s"text $i")
    }.toDF("doc_id", "lang", "text")
    val sums = CorpusCuration.temperatureMixtureSummary(corpus, "lang")
      .collect().map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("n_total"), r.getAs[Long]("n_kept"), r.getAs[Long]("rate_micros")))).toMap
    assert(sums("fr") === ((25L, 25L, 1000000L)))  // smallest stratum: keep all
    assert(sums("de")._3 === 500000L)
    assert(sums("en")._3 === 250000L)
    // hash-uniform keeps land near rate * n
    assert(sums("de")._2 > 30L && sums("de")._2 < 70L)
    assert(sums("en")._2 > 70L && sums("en")._2 < 130L)
    // the kept rows are exactly the ones the summary counts, deterministically
    val kept = CorpusCuration.temperatureMixture(corpus, "lang")
    assert(kept.filter($"lang" === "de").count() === sums("de")._2)
    assert(kept.columns.toSeq === corpus.columns.toSeq) // passthrough schema
  }

  test("stratified sample takes an exact per-stratum quota, hash-deterministically") {
    val corpus = (1L to 40L).map(i => (i, if (i <= 25) "en" else "de", s"text $i"))
      .toDF("doc_id", "lang", "text")
    def run() = CorpusCuration.stratifiedSample(corpus, "lang", 10).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang")))
    val a = run()
    assert(a.count(_._2 == "en") === 10)
    assert(a.count(_._2 == "de") === 10)
    assert(run().toSet === a.toSet)        // same hash order every run
    // a stratum smaller than the quota is kept whole
    val small = CorpusCuration.stratifiedSample(corpus.filter($"lang" === "de"), "lang", 100)
    assert(small.count() === 15)
  }

  test("mixture sample applies per-stratum keep-rates via the hash threshold") {
    val corpus = (1L to 400L).map(i => (i, if (i % 2 == 0) "en" else "de", s"text $i"))
      .toDF("doc_id", "lang", "text")
    val kept = CorpusCuration.mixtureSample(corpus, "lang",
      Map("en" -> 1.0, "de" -> 0.5)).groupBy("lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    assert(kept("en") === 200L)                     // rate 1.0 keeps everything
    assert(kept("de") > 60L && kept("de") < 140L)   // ~half of 200, hash-uniform
    // deterministic: the same call keeps the same rows
    val ids = CorpusCuration.mixtureSample(corpus, "lang", Map("de" -> 0.5))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = CorpusCuration.mixtureSample(corpus, "lang", Map("de" -> 0.5))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids === ids2)
    assert(ids.forall(_ % 2 == 1)) // undeclared strata (en) are dropped
    // threshold encoding: 1.0 -> 'g' (keep-all), others are 8-char hex
    assert(CorpusCuration.thresholdHex(1.0) === "g")
    assert(CorpusCuration.thresholdHex(0.5) === "80000000")
    assert(CorpusCuration.thresholdHex(0.1) === "19999999")
  }

  test("packSequences cuts the concatenated stream with boundary straddles") {
    // widths+sep: doc1 [0,4) doc2 [4,14) doc3 [14,20) doc4 [20,21); cap 10
    val w = Seq((1L, 3L), (2L, 9L), (3L, 5L), (4L, 0L)).toDF("doc_id", "n_tokens")
    val out = CorpusCuration.packSequences(w, capacity = 10L, weightCol = "n_tokens")
      .collect().map(r => r.getAs[Long]("seq_id") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"))).toMap
    // doc2 straddles seqs 0/1, so it counts toward both
    assert(out === Map(0L -> (2L, 10L), 1L -> (2L, 10L), 2L -> (1L, 1L)))
  }

  test("packAssignments slices reconstruct every sequence exactly") {
    // same fixture as the straddle test: doc2 spans seqs 0 and 1
    val w = Seq((1L, 3L), (2L, 9L), (3L, 5L), (4L, 0L)).toDF("doc_id", "n_tokens")
    val rows = CorpusCuration.packAssignments(w, capacity = 10L, weightCol = "n_tokens")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("seq_id"),
        r.getAs[Long]("doc_offset"), r.getAs[Long]("seq_offset"), r.getAs[Long]("slice_len")))
    // doc2 contributes [0,6) of itself at seq0 offset 4, then [6,10) at seq1 offset 0
    assert(rows.toSet.contains((2L, 0L, 0L, 4L, 6L)))
    assert(rows.toSet.contains((2L, 1L, 6L, 0L, 4L)))
    // each sequence's slices tile it: offsets sorted, contiguous, gap-free
    rows.groupBy(_._2).foreach { case (_, slices) =>
      val sorted = slices.sortBy(_._4)
      assert(sorted.head._4 === 0L)
      sorted.sliding(2).foreach {
        case Array(p, n) => assert(n._4 === p._4 + p._5); case _ => }
    }
    // per-doc slices cover the doc's own stream in order
    rows.groupBy(_._1).foreach { case (_, slices) =>
      val sorted = slices.sortBy(_._3)
      assert(sorted.head._3 === 0L)
      sorted.sliding(2).foreach {
        case Array(p, n) => assert(n._3 === p._3 + p._5); case _ => }
    }
  }

  test("token spans are consecutive and partitioning-independent") {
    val rnd = new scala.util.Random(7)
    val docs = (1L to 500L).map(i => (i, rnd.nextInt(90).toLong + 10L))
    def spans(df: org.apache.spark.sql.DataFrame) =
      CorpusCuration.tokenSpans(df, "n_tokens").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val a = spans(docs.toDF("doc_id", "n_tokens"))
    val b = spans(docs.toDF("doc_id", "n_tokens").repartition(7))
    assert(a.toSeq === b.toSeq) // same spans whatever the input partitioning
    assert(a.head._2 === 0L)
    a.sliding(2).foreach { case Array(p, n) => assert(n._2 === p._3); case _ => }
    // every sequence except the last is filled to exactly the capacity
    val seqs = CorpusCuration.packSequences(
        docs.toDF("doc_id", "n_tokens"), capacity = 128L, weightCol = "n_tokens")
      .collect().map(r => r.getAs[Long]("seq_id") -> r.getAs[Long]("n_tokens"))
      .sortBy(_._1)
    assert(seqs.dropRight(1).forall(_._2 === 128L))
    assert(seqs.map(_._2).sum === a.map(s => s._3 - s._2).sum)
  }

  test("length buckets put exact powers of two in their own bucket, waste < 50%") {
    val w = Seq(1L, 2L, 3L, 4L, 5L, 64L, 65L, 127L, 128L, 129L, 9999L)
      .zipWithIndex.map { case (n, i) => (i.toLong, n) }.toDF("doc_id", "n_tokens")
    val out = CorpusCuration.lengthBuckets(w, "n_tokens", maxCeil = 8192)
      .collect().map(r => r.getAs[Long]("bucket_ceil") ->
        (r.getAs[Long]("n_docs"), r.getAs[Double]("waste_ratio"))).toMap
    // boundary exactness: 2^k belongs to bucket 2^k, 2^k+1 to 2^(k+1)
    assert(out(1L)._1 === 1L)      // w=1
    assert(out(2L)._1 === 1L)      // w=2
    assert(out(4L)._1 === 2L)      // w=3,4
    assert(out(8L)._1 === 1L)      // w=5
    assert(out(64L)._1 === 1L)     // w=64 NOT in 128
    assert(out(128L)._1 === 3L)    // w=65, 127, 128
    assert(out(256L)._1 === 1L)    // w=129
    assert(out.forall(_._2._2 < 0.5)) // padding waste bounded by bucket design
    // oversized docs clamp to maxCeil's bucket
    assert(out(8192L)._1 === 1L)   // w=9999 clamped
  }

  test("shuffleShards assigns every doc once, deterministically, with dense positions") {
    val corpus = (1L to 200L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame, salt: String) =
      CorpusCuration.shuffleShards(df, nShards = 8, salt = salt).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"), r.getAs[Long]("pos")))
    val a = run(corpus, "epoch0")
    assert(a.length === 200 && a.map(_._1).distinct.length === 200)
    assert(a.forall(t => t._2 >= 0 && t._2 < 8))
    // positions are 1..n within each shard (write order for shard files)
    a.groupBy(_._2).values.foreach { g =>
      assert(g.map(_._3).sorted.toSeq === (1L to g.length).toSeq)
    }
    // physical partitioning does not change the assignment; the salt does
    assert(run(corpus.repartition(5), "epoch0").toSet === a.toSet)
    assert(run(corpus, "epoch1").toSet !== a.toSet)
    intercept[IllegalArgumentException] {
      CorpusCuration.shuffleShards(corpus, nShards = 7)
    }
  }

  test("weightedStratumSample draws min(k, n) per stratum, excludes " +
      "non-positive weights, and is partition-independent") {
    val docs = ((1L to 30L).map(i => (i, "en", i * 10)) ++
      (31L to 33L).map(i => (i, "fr", 100L)) ++
      Seq((40L, "de", 0L), (41L, "de", -5L)))       // mass-less rows
      .toDF("doc_id", "lang", "n_chars")
    def run(df: org.apache.spark.sql.DataFrame) =
      CorpusCuration.weightedStratumSample(df, "lang", k = 5,
        weightCol = "n_chars").collect()
        .map(r => (r.getAs[String]("lang"), r.getAs[Long]("doc_id"),
          r.getAs[Long]("smp_rank")))
    val a = run(docs)
    val byLang = a.groupBy(_._1).view.mapValues(_.length).toMap
    // en has 30 candidates -> 5; fr has 3 -> all 3; de has none with mass
    assert(byLang === Map("en" -> 5, "fr" -> 3))
    // ranks dense 1..n within each stratum
    assert(a.filter(_._1 == "en").map(_._3).sorted.toSeq === (1L to 5L))
    assert(run(docs.repartition(7)).toSet === a.toSet)
  }

  test("weightedStratumSample favors weight: a dominant-weight doc wins " +
      "nearly every independent draw, a feather almost none") {
    val docs = ((1L to 9L).map(i => (i, "s", 1000L)) :+ ((99L, "s", 1L)))
      .toDF("doc_id", "lang", "n_chars")
    val salts = (0 until 30).map(i => s"salt$i")
    val winners = salts.map { salt =>
      CorpusCuration.weightedStratumSample(docs, "lang", k = 1,
        weightCol = "n_chars", salt = salt).collect().head.getAs[Long]("doc_id")
    }
    // doc 99 holds 1/9001 of the mass: it should essentially never win
    assert(winners.count(_ == 99L) <= 1)
  }

  test("negativeSamples: exactly k negatives per anchor, near-dups and self " +
      "excluded, deterministic yet salt-sensitive") {
    val docs = (0L until 30L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq((0L, 7L), (13L, 0L)).toDF("doc_a", "doc_b") // 0's near-dups: 7, 13
    val anchors = Seq(Tuple1(0L), Tuple1(10L)).toDF("doc_id")
    val out = CorpusCuration.negativeSamples(docs, pairs, anchors, "doc_id", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.count(_._1 == 0L) === 5 && out.count(_._1 == 10L) === 5)
    // near-dups of anchor 0 (both pair orientations) and the anchor itself
    // never appear as its negatives
    val neg0 = out.filter(_._1 == 0L).map(_._2).toSet
    assert(!neg0.contains(0L) && !neg0.contains(7L) && !neg0.contains(13L))
    // ranks dense 1..k per anchor
    assert(out.filter(_._1 == 0L).map(_._3).sorted.toSeq === (1L to 5L))
    // deterministic under repartitioning; different salt, different sample
    val again = CorpusCuration.negativeSamples(docs.repartition(7), pairs,
      anchors, "doc_id", k = 5).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.sorted.toSeq === out.sorted.toSeq)
    val salted = CorpusCuration.negativeSamples(docs, pairs, anchors, "doc_id",
      k = 5, salt = "other").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(salted !== out.map(r => (r._1, r._2)).toSet)
  }

  test("gopherQualityRules: each rule trips on its planted violator and " +
      "only the clean doc survives the composite gate") {
    val clean = (1 to 60).map(i => s"word$i").mkString(" ")      // all pass
    val short = "just five little words here"                    // wordcount
    val longTok = (1 to 60).map(_ => "honorificabilitudinity").mkString(" ") // mean len > 10 AND repetition
    val numeric = (1 to 60).map(i => s"$i${i * 7}").mkString(" ") // no letters
    val repetitive = ("spam " * 30 + clean).trim                  // top share > 20%
    val docs = Seq((0L, clean), (1L, short), (2L, longTok), (3L, numeric),
      (4L, repetitive)).toDF("doc_id", "text")
    val out = CorpusCuration.gopherQualityRules(docs, "doc_id", minTokens = 50L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Boolean]("r_wordcount"), r.getAs[Boolean]("r_mean_len"),
          r.getAs[Boolean]("r_alpha"), r.getAs[Boolean]("r_repetition"),
          r.getAs[Boolean]("keep")))).toMap
    assert(out(0L) === ((true, true, true, true, true)))
    assert(!out(1L)._1 && !out(1L)._5)            // too short
    assert(!out(2L)._2 && !out(2L)._4)            // 22-char tokens, all same
    assert(!out(3L)._3 && !out(3L)._5)            // digits only
    assert(!out(4L)._4 && out(4L)._1 && !out(4L)._5) // spam = 30/90 > 20%
    // micros are exact long divisions: clean doc mean len is hand-computable
    val cleanRow = CorpusCuration.gopherQualityRules(docs, "doc_id",
      minTokens = 50L).filter(col("doc_id") === 0L).collect().head
    val totalChars = (1 to 60).map(i => s"word$i".length.toLong).sum
    assert(cleanRow.getAs[Long]("mean_len_micros") === totalChars * 1000000L / 60L)
  }

  test("preference pairs: quartile pairing with strict margins per stratum") {
    // stratum "a": scores 8..1 (n=8 -> 2 pairs: (8,1) and (7,2));
    // stratum "b": all tied -> no strict margin -> no pairs
    val scored = ((1L to 8L).map(i => (i, "a", i * 100L)) ++
      (11L to 14L).map(i => (i, "b", 500L))).toDF("doc_id", "grp", "score")
    val out = CorpusCuration.preferencePairs(scored, "doc_id", "score", Seq("grp"))
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[Long]("pair_rank")) ->
        ((r.getAs[Long]("chosen_id"), r.getAs[Long]("rejected_id"),
          r.getAs[Long]("margin")))).toMap
    assert(out.keySet === Set(("a", 1L), ("a", 2L)))
    assert(out(("a", 1L)) === ((8L, 1L, 700L))) // best vs worst
    assert(out(("a", 2L)) === ((7L, 2L, 500L)))
    // chosen and rejected never coincide, margins strictly positive
    assert(out.values.forall { case (c, rej, m) => c != rej && m > 0 })
    // deterministic under repartitioning
    val rep = CorpusCuration.preferencePairs(scored.repartition(5), "doc_id",
      "score", Seq("grp")).collect()
      .map(r => (r.getAs[String]("grp"), r.getAs[Long]("pair_rank")) ->
        ((r.getAs[Long]("chosen_id"), r.getAs[Long]("rejected_id"),
          r.getAs[Long]("margin")))).toMap
    assert(rep === out)
  }

  test("span corruption: masked spans round-trip, sentinels align, counts exact") {
    val corpus = (1L to 40L)
      .map(i => (i, (1 to 30).map(t => s"w$t").mkString(" ")))
      .toDF("doc_id", "text")
    val out = CorpusCuration.spanCorruption(corpus, "doc_id").collect()
    assert(out.length === 40)
    for (r <- out) {
      val (n, masked, spans) = (r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_masked"), r.getAs[Long]("n_spans"))
      val inputs = r.getAs[String]("inputs").split(" ").filter(_.nonEmpty)
      val targets = r.getAs[String]("targets").split(" ").filter(_.nonEmpty)
      assert(n === 30L && masked <= n && spans <= masked)
      // conservation: unmasked tokens + one sentinel per span in inputs;
      // masked tokens + one sentinel per span in targets
      assert(inputs.length === (n - masked + spans))
      assert(targets.length === (masked + spans))
      // the sentinel sets agree between inputs and targets, in order
      val sIn = inputs.filter(_.startsWith("<extra_")).toSeq
      val sTg = targets.filter(_.startsWith("<extra_")).toSeq
      assert(sIn === sTg)
      // reconstruction: substituting each target span back at its
      // sentinel recovers the original token stream
      val spanMap = {
        var cur: String = null
        val m = scala.collection.mutable.Map.empty[String, List[String]]
        for (t <- targets) {
          if (t.startsWith("<extra_")) { cur = t; m(cur) = Nil }
          else m(cur) = m(cur) :+ t
        }
        m.toMap
      }
      val rebuilt = inputs.flatMap(t =>
        if (t.startsWith("<extra_")) spanMap(t) else Seq(t))
      assert(rebuilt.toSeq === (1 to 30).map(t => s"w$t"))
    }
    // expected mask rate lands in the T5 neighborhood corpus-wide
    val rate = out.map(_.getAs[Long]("n_masked")).sum.toDouble /
      out.map(_.getAs[Long]("n_tokens")).sum
    assert(rate > 0.05 && rate < 0.30, s"mask rate $rate")
    // deterministic per salt; a different salt moves the masks
    val again = CorpusCuration.spanCorruption(corpus.repartition(7), "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("inputs")).toMap
    assert(again === out.map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("inputs")).toMap)
    val salted = CorpusCuration.spanCorruption(corpus, "doc_id", salt = "other")
      .collect().map(r => r.getAs[String]("inputs")).toSet
    assert(salted !== out.map(_.getAs[String]("inputs")).toSet)
  }

  test("blocklist screen counts hits case-insensitively and gates on distinct terms") {
    val corpus = Seq(
      (1L, "clean text with nothing flagged"),
      (2L, "one BADWORD here"),                       // 1 distinct -> not blocked
      (3L, "badword and EVILTERM together"),          // 2 distinct -> blocked
      (4L, "badword badword badword")                 // repeats, still 1 distinct
    ).toDF("doc_id", "text")
    val terms = Seq("badword", "evilterm").toDF("term")
    val out = CorpusCuration.blocklistScreen(corpus, terms, "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_hits"), r.getAs[Long]("n_distinct_terms"),
          r.getAs[Boolean]("blocked")))).toMap
    assert(out(1L) === ((0L, 0L, false)))
    assert(out(2L) === ((1L, 1L, false)))
    assert(out(3L) === ((2L, 2L, true)))
    assert(out(4L) === ((3L, 1L, false)))
    // zero-tolerance mode: any distinct hit blocks
    val strict = CorpusCuration.blocklistScreen(corpus, terms, "doc_id",
      maxDistinctTerms = 0L)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("blocked")).toMap
    assert(strict === Map(1L -> false, 2L -> true, 3L -> true, 4L -> true))
  }

  test("sentence dedup keeps only the corpus-global first occurrence") {
    val corpus = Seq(
      (1L, "Alpha beta gamma. Click here to subscribe! Unique one."),
      // doc 2: repeats doc 1's chrome sentence AND repeats its own twice
      (2L, "Click here to subscribe. Own sentence here. Own sentence here."),
      // doc 3: every sentence already seen -> nothing kept
      (3L, "Click here to subscribe? Own sentence here."),
      // doc 4: punctuation runs and whitespace do not change identity
      (4L, "Fresh content!!!   Alpha beta gamma.")
    ).toDF("doc_id", "text")
    val out = CorpusCuration.sentenceDedup(corpus, "doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_sentences"), r.getAs[Long]("n_kept"),
          r.getAs[String]("kept_text")))).toMap
    assert(out(1L) === ((3L, 3L, "Alpha beta gamma. Click here to subscribe. Unique one")))
    assert(out(2L) === ((3L, 1L, "Own sentence here")))
    assert(out(3L) === ((2L, 0L, "")))
    assert(out(4L) === ((2L, 1L, "Fresh content")))
    // sentence conservation: kept + dropped = total, one keeper per hash
    val totals = out.values.map(_._1).sum
    val kepts = out.values.map(_._2).sum
    assert(totals === 10L && kepts === 5L) // 5 distinct sentences corpus-wide
    // first-occurrence choice is partitioning-independent (groupBy-min)
    val rep = CorpusCuration.sentenceDedup(corpus.repartition(5), "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("kept_text")).toMap
    assert(rep === out.map { case (k, v) => k -> v._3 })
  }
}
