package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("stats computes token counts, ratios and quality on a crafted doc") {
    val doc = Seq((1L, "the cat sat on the mat, happily!")).toDF("doc_id", "text")
    val r = TextAnalysis.stats(doc).collect().head
    assert(r.getAs[Int]("n_tokens") === 7)
    assert(r.getAs[Int]("token_estimate") === 9) // 7 words + ',' + '!'
    assert(r.getAs[Long]("stopword_count") === 3L) // the, on, the
    assert(math.abs(r.getAs[Double]("punct_ratio") - 2.0 / 32) < 1e-9)
  }

  test("langId picks the language with most marker hits, 'und' when none") {
    val docs = Seq(
      (1L, "der hund und die katze ist hier"),
      (2L, "the cat and the dog of the house"),
      (3L, "xyzzy plugh qwerty")).toDF("doc_id", "text")
    val m = TextAnalysis.langId(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang_guess")).toMap
    assert(m === Map(1L -> "de", 2L -> "en", 3L -> "und"))
  }

  test("fingerprint is invariant to case and surrounding whitespace") {
    val docs = Seq((1L, "Hello World"), (2L, "  hello world "), (3L, "other"))
      .toDF("doc_id", "text")
    val fps = docs.select(TextAnalysis.fingerprint(col("text")).as("fp"))
      .collect().map(_.getString(0))
    assert(fps(0) === fps(1))
    assert(fps(0) !== fps(2))
  }

  test("tfIdf ranks rare terms above ubiquitous ones") {
    val docs = Seq(
      (1L, "spark spark rare"),
      (2L, "spark common words"),
      (3L, "spark more words")).toDF("doc_id", "text")
    val out = TextAnalysis.tfIdf(docs, "doc_id", "text", 3).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("token")) -> r.getAs[Double]("tf_idf")).toMap
    assert(out((1L, "spark")) === 0.0) // df=3 of 3 -> idf 0
    assert(out((1L, "rare")) > 0.0)
  }

  test("tokenChunks windows with stride and keeps the shorter tail") {
    val docs = Seq((1L, (1 to 20).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val chunks = TextAnalysis.tokenChunks(docs, "doc_id", chunkSize = 16, stride = 8)
      .orderBy("chunk_idx").collect()
    assert(chunks.length === 3) // starts 1, 9, 17
    assert(chunks.map(_.getAs[Int]("chunk_idx")).toSeq === Seq(0, 1, 2))
    assert(chunks.map(_.getAs[Int]("chunk_tokens")).toSeq === Seq(16, 12, 4))
    assert(chunks(0).getAs[String]("chunk").startsWith("t1 t2 "))
    assert(chunks(2).getAs[String]("chunk") === "t17 t18 t19 t20")
    // overlap: token t9 appears in chunks 0 and 1
    assert(chunks(0).getAs[String]("chunk").split(" ").contains("t9"))
    assert(chunks(1).getAs[String]("chunk").split(" ").head === "t9")
  }

  test("repetitionStats computes type-token ratio and top-token share") {
    val docs = Seq(
      (1L, "a a a a b"),          // 5 tokens, 2 types, top 'a' x4
      (2L, "u v w x y")).toDF("doc_id", "text")
    val m = TextAnalysis.repetitionStats(docs, "doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_types"),
         r.getAs[Double]("type_token_ratio"), r.getAs[Double]("top_token_share"))).toMap
    assert(m(1L) === ((5L, 2L, 0.4, 0.8)))
    assert(m(2L) === ((5L, 5L, 1.0, 0.2)))
  }

  test("tokenEntropy: 0 for one repeated type, ln(n) for all-distinct, " +
      "ln(2) for a balanced pair") {
    val docs = Seq(
      (1L, "a a a a"),            // one type -> H = 0
      (2L, "u v w x"),            // all distinct -> H = ln 4
      (3L, "a a b b")).toDF("doc_id", "text") // balanced pair -> H = ln 2
    val m = TextAnalysis.tokenEntropy(docs, "doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_types"),
          r.getAs[Long]("entropy_micros")))).toMap
    assert(m(1L) === ((4L, 1L, 0L)))
    assert(m(2L) === ((4L, 4L, 1386294L)))  // floor(ln4*1e6+0.5)
    assert(m(3L) === ((4L, 2L, 693147L)))   // floor(ln2*1e6+0.5)
  }

  test("bm25 ranks term-dense short docs above diluted long ones and " +
      "rewards rare terms over common ones") {
    val docs = Seq(
      (1L, "join join join"),                       // dense in a rare term
      (2L, "join a b c d e f g h i j k l m n o p"), // same term, diluted
      (3L, "table table table"),                    // dense in a COMMON term
      (4L, "table x y"), (5L, "table z w"),         // spread 'table' wide
      (6L, "nothing relevant here")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25(docs, Seq("join", "table"), "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_terms_hit"), r.getAs[Long]("bm25_micros")))).toMap
    // doc 6 has no query term: absent from the output entirely
    assert(!out.contains(6L) && out.size === 5)
    // length normalization: dense doc 1 beats diluted doc 2 on 'join'
    assert(out(1L)._2 > out(2L)._2)
    // idf: 'join' (df=2) outscores 'table' (df=3) at equal density/length
    assert(out(1L)._2 > out(3L)._2)
    assert(out.values.forall(_._2 > 0L))
  }

  test("winnowing: docs sharing a run of >= w+k-1 tokens share a fingerprint") {
    // k=3, w=4 -> guarantee kicks in at 6 shared consecutive tokens
    val shared = "p q r s t u" // 6 tokens
    val docs = Seq(
      (1L, s"a b c $shared d e f"),
      (2L, s"x y $shared z w v"),
      (3L, "totally different words entirely here now")).toDF("doc_id", "text")
    val fp = TextAnalysis.winnowFingerprints(docs, "doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("fingerprint"))
    val byDoc = fp.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((byDoc(1L) & byDoc(2L)).nonEmpty)  // winnowing guarantee
    assert((byDoc(1L) & byDoc(3L)).isEmpty)   // unrelated docs don't collide
  }

  test("winnowing: selection positions match an independent reference for both hash choices") {
    // The window/selection logic is recomputed here in plain Scala (sliding
    // min over the k-gram hash sequence, full windows only, pos-0 fallback
    // for short docs); only the scalar hash primitives are shared with the
    // engine. Asserted for BOTH hash choices: md5 (portable/oracle form)
    // and xxhash64 (production form).
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog the quick brown fox"),
      (2L, "a b c d e f g h i j k"),
      (3L, "a b c d"),      // 2 k-grams < w -> single clipped window at pos 0
      (4L, "one two three") // exactly 1 k-gram
    ).toDF("doc_id", "text")
    val (k, w) = (3, 4)
    val toks: Map[Long, Seq[String]] = TextAnalysis.withTokens(docs, "text")
      .select("doc_id", "tokens").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[String](1)).toMap
    def expectedFor[T: Ordering](hash: String => T): Set[(Long, Int, T)] =
      toks.flatMap { case (id, ts) =>
        val hs = ts.sliding(k).filter(_.size == k).map(g => hash(g.mkString(" "))).toIndexedSeq
        if (hs.isEmpty) Seq.empty
        else (0 to math.max(hs.size - w, 0)).map(p =>
          (id, p, hs.slice(p, math.min(p + w, hs.size)).min))
      }.toSet
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def xx64(s: String): Long = org.apache.spark.sql.catalyst.expressions.XxHash64Function
      .hash(org.apache.spark.unsafe.types.UTF8String.fromString(s),
        org.apache.spark.sql.types.StringType, 42L)

    val gotMd5 = TextAnalysis.winnowSelections(docs, "doc_id", k = k, w = w).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("pos"), r.getAs[String]("fingerprint"))).toSet
    assert(gotMd5 === expectedFor(md5hex))

    val gotXx = TextAnalysis.winnowSelections(docs, "doc_id", k = k, w = w,
        portableHashes = false).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("pos"), r.getAs[Long]("fingerprint"))).toSet
    assert(gotXx === expectedFor(xx64))
  }

  test("winnowing: the shared-run guarantee holds under the xxhash64 production variant") {
    val shared = "p q r s t u" // 6 tokens = w + k - 1 for k=3, w=4
    val docs = Seq(
      (1L, s"a b c $shared d e f"),
      (2L, s"x y $shared z w v"),
      (3L, "totally different words entirely here now")).toDF("doc_id", "text")
    val fp = TextAnalysis.winnowFingerprints(docs, "doc_id", portableHashes = false).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("fingerprint"))
    val byDoc = fp.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((byDoc(1L) & byDoc(2L)).nonEmpty)
    assert((byDoc(1L) & byDoc(3L)).isEmpty)
  }

  test("winnowing: short docs fall back to a single minimum fingerprint") {
    val docs = Seq(
      (1L, "a b c d"),   // 2 k-grams < w -> one min fingerprint
      (2L, "a b"),       // no k-gram -> no fingerprints
      (3L, "a b c d")).toDF("doc_id", "text")
    val fp = TextAnalysis.winnowFingerprints(docs, "doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("fingerprint"))
    assert(fp.count(_._1 == 1L) === 1)
    assert(!fp.exists(_._1 == 2L))
    // identical docs -> identical fingerprint (the dedup key property)
    assert(fp.filter(_._1 == 1L).map(_._2).toSet === fp.filter(_._1 == 3L).map(_._2).toSet)
  }

  test("collocations: a planted fixed phrase scores higher PMI than a chance pair") {
    // "new york" always co-occurs; "the cat"/"the dog"/... are chance pairs
    val docs = (1 to 10).map(i =>
      (i.toLong, s"new york w$i the cat the dog the fox a${i % 2} b${i % 3}"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.collocations(docs, minCount = 5).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("pmi")).toMap
    assert(out.contains(("new", "york")))
    assert(out(("new", "york")) > out(("the", "cat"))) // fixed phrase beats chance
  }

  test("piiScrub counts and redacts emails, phones and IPs; clean text keeps the rest") {
    val docs = Seq(
      (1L, "mail me at jo.smith+x@corp.example.org or call 555-123-4567 now"),
      (2L, "server 192.168.0.1 and 10.0.0.7 rebooted"),
      (3L, "no pii here at all")).toDF("doc_id", "text")
    val out = TextAnalysis.piiScrub(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_email") === 1L)
    assert(out(1L).getAs[Long]("n_phone") === 1L)
    assert(out(1L).getAs[Long]("pii_total") === 2L)
    assert(out(1L).getAs[String]("text_clean")
      === "mail me at [EMAIL] or call [PHONE] now")
    assert(out(2L).getAs[Long]("n_ip") === 2L)
    assert(out(2L).getAs[String]("text_clean") === "server [IP] and [IP] rebooted")
    assert(out(3L).getAs[Long]("pii_total") === 0L)
    assert(out(3L).getAs[String]("text_clean") === "no pii here at all")
  }

  test("hashedQualityScore: mean bucket weight + bias, sparse weights score zero") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "alpha alpha")).toDF("doc_id", "text")
    // nBuckets = 1: every token lands in bucket 0
    val wPlus = Seq((0L, 250000L)).toDF("bucket", "w_micros")
    val out = TextAnalysis.hashedQualityScore(docs, "doc_id", wPlus,
      nBuckets = 1, biasMicros = 100000L, thresholdMicros = 300000L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("score_micros"), r.getAs[Boolean]("keep")))).toMap
    // mean weight is 250000 regardless of length; score = bias + mean
    assert(out(1L) === ((4L, 350000L, true)))
    assert(out(2L) === ((2L, 350000L, true)))
    // an empty (sparse) model scores every doc at the bias alone
    val empty = Seq.empty[(Long, Long)].toDF("bucket", "w_micros")
    val bare = TextAnalysis.hashedQualityScore(docs, "doc_id", empty,
      nBuckets = 1, biasMicros = 100000L, thresholdMicros = 300000L).collect()
    assert(bare.forall(_.getAs[Long]("score_micros") === 100000L))
    assert(bare.forall(!_.getAs[Boolean]("keep")))
    // generated weight table is bounded and deterministic
    val wt = TextAnalysis.hashWeightTable(spark, 64).collect()
    assert(wt.length === 64)
    assert(wt.forall(r => math.abs(r.getAs[Long]("w_micros")) <= 1000000L))
    assert(wt.map(_.getAs[Long]("w_micros")).toSeq ===
      TextAnalysis.hashWeightTable(spark, 64).collect().map(_.getAs[Long]("w_micros")).toSeq)
  }

  test("vocabCoverage: top-V vocab with deterministic tie-break, per-doc UNK rate") {
    import spark.implicits._
    val docs = Seq(
      (1L, "cat cat cat dog dog bird"),
      (2L, "cat dog zebra quokka")).toDF("doc_id", "text")
    // counts: cat 4, dog 3, bird 1, zebra 1, quokka 1 -> V=3 is cat dog bird
    // (tie at 1 broken alphabetically: bird < quokka < zebra)
    val vocab = TextAnalysis.topVocabulary(docs, 3).collect().map(_.getString(0)).toSeq
    assert(vocab === Seq("cat", "dog", "bird"))
    val cov = TextAnalysis.vocabCoverage(docs, "doc_id", 3).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_oov"), r.getAs[Long]("oov_micros")))).toMap
    assert(cov(1L) === ((6L, 0L, 0L)))
    assert(cov(2L) === ((4L, 2L, 500000L))) // zebra + quokka are UNK
  }

  test("invertedIndex: sorted doc-distinct postings, stopword-grade terms dropped") {
    import spark.implicits._
    val docs = Seq(
      (3L, "the cat sat"), (1L, "the cat ran"), (2L, "the dog ran"),
      (4L, "the fox hid")).toDF("doc_id", "text")
    val idx = TextAnalysis.invertedIndex(docs, "doc_id", maxDfRatio = 0.5)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("df"), r.getSeq[Long](r.fieldIndex("postings")).toSeq))).toMap
    assert(!idx.contains("the"))               // df 4 > 0.5 * 4: stop-listed
    assert(idx("cat") === ((2L, Seq(1L, 3L)))) // sorted despite input order
    assert(idx("ran") === ((2L, Seq(1L, 2L))))
    assert(idx("fox") === ((1L, Seq(4L))))
    // a term repeated within one doc posts that doc once (ratio 1.0: a
    // single-doc corpus would otherwise stop-list its every term)
    val rep = TextAnalysis.invertedIndex(
      Seq((7L, "echo echo echo")).toDF("doc_id", "text"), "doc_id",
      maxDfRatio = 1.0)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](2).toSeq).toMap
    assert(rep("echo") === Seq(7L))
  }

  test("pseudonymization: same value -> same token across docs, distinct values differ") {
    val docs = Seq(
      (1L, "mail a@b.co and phone 555-123-4567 ok"),
      (2L, "again a@b.co plus c@d.org here"),
      (3L, "nothing sensitive")).toDF("doc_id", "text")
    val out = TextAnalysis.pseudonymizePii(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_pseudo"), r.getAs[String]("text_pseudo")))).toMap
    assert(out(1L)._1 === 2L && out(2L)._1 === 2L && out(3L)._1 === 0L)
    assert(out(3L)._2 === "nothing sensitive") // untouched
    // referential integrity: the a@b.co pseudonym is IDENTICAL in docs 1, 2
    val tok1 = out(1L)._2.split(" ").find(_.startsWith("EMAIL_")).get
    assert(out(2L)._2.split(" ").contains(tok1))
    // distinct values get distinct tokens
    val toks2 = out(2L)._2.split(" ").filter(_.startsWith("EMAIL_")).toSet
    assert(toks2.size === 2)
    // no raw PII survives
    assert(!out.values.exists(v => v._2.contains("@b.co") || v._2.contains("555-123")))
  }

  test("vocabRichness: hand-computed Chao1 and Good-Turing unseen mass") {
    import spark.implicits._
    def rich(texts: Seq[String]) =
      TextAnalysis.vocabRichness(texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"))
        .collect().head
    // counts a:2 b:2 c:1 -> N=5, S=3, f1=1, f2=2; chao1 extra = 0
    val r1 = rich(Seq("a a b", "b c"))
    assert((r1.getAs[Long]("n_tokens"), r1.getAs[Long]("vocab"),
      r1.getAs[Long]("f1"), r1.getAs[Long]("f2")) === (5L, 3L, 1L, 2L))
    assert(r1.getAs[Long]("chao1_extra_micros") === 0L)
    assert(r1.getAs[Long]("gt_unseen_micros") === 200000L)
    // all singletons: f1=3, f2=0 -> extra = 3*2e6 div 2 = 3e6, unseen 1e6
    val r2 = rich(Seq("x y z"))
    assert(r2.getAs[Long]("chao1_extra_micros") === 3000000L)
    assert(r2.getAs[Long]("gt_unseen_micros") === 1000000L)
    // saturated corpus (every token repeated): f1=0 -> both estimators 0
    val r3 = rich(Seq("p q p q", "p q"))
    assert(r3.getAs[Long]("chao1_extra_micros") === 0L)
    assert(r3.getAs[Long]("gt_unseen_micros") === 0L)
  }
}
