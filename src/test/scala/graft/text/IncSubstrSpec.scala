package graft.text

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental batch-vs-corpus ExactSubstr (the standing-ladder
  * dictionary extension): batch ranks must be equality-consistent with
  * the corpus ladder, novel content must rank above the corpus maximum,
  * and incremental coverage must EQUAL the full rebuild on the union
  * restricted to batch docs — without re-ranking a corpus position.
  */
class IncSubstrSpec extends SparkSpec {
  import spark.implicits._

  private val a13 = (1 to 13).map(i => s"a$i").mkString(" ")
  private val b13 = (1 to 13).map(i => s"b$i").mkString(" ")

  private lazy val corpus = Seq(
    (1L, s"$a13 c1 c2 c3"),                            // one copy of a-block
    (2L, (1 to 20).map(i => s"z$i").mkString(" ")),    // disjoint filler
    (3L, s"w1 w2 $b13")                                // one copy of b-block
  ).toDF("doc_id", "text")

  private def state(c: DataFrame) = {
    val rounds = ExactSubstr.orderedSuffixRounds(c, "doc_id", prefixLen = 8)
    val dict = ExactSubstr.corpusTokenDict(c, "doc_id")
    val wins = ExactSubstr.corpusWindowCounts(rounds.last._2, "doc_id", L = 13)
    (rounds, dict, wins)
  }

  private def incremental(c: DataFrame, batch: DataFrame) = {
    val (rounds, dict, wins) = state(c)
    ExactSubstr.batchSpanCoverageVsCorpus(batch, "doc_id", L = 13,
      corpusRounds = rounds, tokenDict = dict, corpusWinCounts = wins)
  }

  private def fullRestricted(c: DataFrame, batch: DataFrame) = {
    val batchIds = batch.select("doc_id")
    ExactSubstr.duplicatedSpanCoverageExact(c.unionByName(batch), "doc_id", L = 13)
      .join(batchIds, Seq("doc_id"), "left_semi")
  }

  private def rows(df: DataFrame) = df.collect()
    .map(r => r.getLong(0) -> (r.getAs[Long]("n_tokens"),
      r.getAs[Long]("n_dup_spans"), r.getAs[Long]("covered_tokens"))).toMap

  test("a batch copy of a ONCE-seen corpus block is covered; novel text is not") {
    // doc 10 carries the corpus a-block (corpus count 1 -> union count 2),
    // doc 11 is entirely novel tokens (must flow through with 0 coverage)
    val batch = Seq(
      (10L, s"$a13 n1 n2 n3"),
      (11L, (1 to 15).map(i => s"nv$i").mkString(" "))
    ).toDF("doc_id", "text")
    val got = rows(incremental(corpus, batch))
    assert(got(10L) === (16L, 1L, 13L))
    assert(got(11L) === (15L, 0L, 0L))
    assert(got === rows(fullRestricted(corpus, batch)))
  }

  test("batch-internal duplicates are caught without any corpus occurrence") {
    val n13 = (1 to 13).map(i => s"q$i").mkString(" ") // absent from corpus
    val batch = Seq(
      (10L, s"$n13 t1 t2"),
      (20L, s"u1 $n13")
    ).toDF("doc_id", "text")
    val got = rows(incremental(corpus, batch))
    assert(got(10L) === (15L, 1L, 13L))
    assert(got(20L) === (14L, 1L, 13L))
    assert(got === rows(fullRestricted(corpus, batch)))
  }

  test("novel batch tokens rank strictly above the corpus maximum") {
    val (rounds, dict, _) = state(corpus)
    val batch = Seq((10L, "brand new words only here")).toDF("doc_id", "text")
    val br = ExactSubstr.batchRanksVsCorpus(batch, "doc_id", "text",
      rounds, dict, prefixLen = 8)
    val maxCorpus = dict.agg(max("rank")).head.getLong(0)
    val minBatchL1 = br.head._2.agg(min("rank")).head.getLong(0)
    assert(minBatchL1 > maxCorpus,
      "novel tokens must never collide with a corpus rank")
    // and a KNOWN token adopts the exact corpus rank (equality contract)
    val known = Seq((30L, "a1 a2 a3")).toDF("doc_id", "text")
    val kr = ExactSubstr.batchRanksVsCorpus(known, "doc_id", "text",
      rounds, dict, prefixLen = 1).head._2
    val corpusA1 = dict.filter(col("tok") === "a1").head.getLong(1)
    assert(kr.filter(col("pos") === 1).head.getAs[Long]("rank") === corpusA1)
  }

  test("a ladder missing an intermediate level fails with the contract-" +
      "stating require, not a bare NoSuchElementException") {
    val (rounds, dict, _) = state(corpus)
    val batch = Seq((10L, "a1 a2 a3 a4 a5")).toDF("doc_id", "text")
    // the doubling loop needs levels 1,2,4,8 when no pairDicts are
    // given — drop level 2 and every probe depth that dereferences it
    // must name it up front
    val holey = rounds.filterNot(_._1 == 2)
    val e = intercept[IllegalArgumentException] {
      ExactSubstr.batchRanksVsCorpus(batch, "doc_id", "text",
        holey, dict, prefixLen = 8)
    }
    assert(e.getMessage.contains("standing ladder lacks level 2"))
    // supplying the level-2 dictionary explicitly heals the hole for
    // the step that needed it
    val d2 = ExactSubstr.pairDictFromLadder(
      rounds.toMap.apply(1), rounds.toMap.apply(2), 1, "doc_id")
    val ok = ExactSubstr.batchRanksVsCorpus(batch, "doc_id", "text",
      rounds, dict, prefixLen = 2, pairDicts = Map(2 -> d2))
    assert(ok.last._1 === 2)
  }

  test("incremental max-pow2 bracket == full maxPow2DupLen over the " +
      "union restricted to batch (corpus-adoption + batch-internal paths)") {
    def bracket(c: DataFrame, batch: DataFrame) = {
      val rounds = ExactSubstr.orderedSuffixRounds(c, "doc_id", prefixLen = 16)
      val dict = ExactSubstr.corpusTokenDict(c, "doc_id")
      ExactSubstr.batchMaxPow2VsCorpus(batch, "doc_id",
        corpusRounds = rounds, tokenDict = dict, maxLen = 16)
        .collect().map(r => r.getLong(0) ->
          (r.getAs[Long]("n_tokens"), r.getAs[Long]("max_dup_pow2"))).toMap
    }
    def full(c: DataFrame, batch: DataFrame) =
      ExactSubstr.maxPow2DupLen(c.unionByName(batch), "doc_id", maxLen = 16)
        .join(batch.select("doc_id"), Seq("doc_id"), "left_semi")
        .collect().map(r => r.getLong(0) ->
          (r.getAs[Long]("n_tokens"), r.getAs[Long]("max_dup_pow2"))).toMap
    val batch = Seq(
      (10L, s"$a13 n1 n2 n3"),                          // a-block from corpus: h*=8
      (11L, (1 to 15).map(i => s"nv$i").mkString(" ")), // novel: 0
      (12L, "w1 w2 $ w1 w2"),                           // "w1 w2" in corpus AND self-repeat
      (13L, s"q1 q2 q3 q4 q5 xx q1 q2 q3 q4 q5")        // batch-internal 5-run: bracket 4
    ).toDF("doc_id", "text")
    val got = bracket(corpus, batch)
    assert(got === full(corpus, batch))
    assert(got(10L)._2 === 8L, "13-token corpus match brackets at 8")
    assert(got(11L)._2 === 0L, "novel content has no duplicated window")
    assert(got(13L)._2 === 4L, "batch-internal 5-token repeat brackets at 4")
    // a batch doc pairing with ANOTHER batch doc (cross-doc, no corpus)
    val batch2 = Seq(
      (20L, "z1 z2 z3 z4 z5 z6 pad1"),
      (21L, "lead z1 z2 z3 z4 z5 z6")
    ).toDF("doc_id", "text")
    val got2 = bracket(corpus, batch2)
    assert(got2 === full(corpus, batch2))
    assert(got2(20L)._2 === 4L && got2(21L)._2 === 4L,
      "cross-batch-doc 6-token repeat brackets at 4")
  }

  test("incremental removal == full removeDuplicatedSpans over the " +
      "union restricted to batch (cut text verbatim)") {
    def incRemoval(c: DataFrame, batch: DataFrame) = {
      val (rounds, dict, wins) = state(c)
      ExactSubstr.batchSpanRemovalVsCorpus(batch, "doc_id", L = 13,
        corpusRounds = rounds, tokenDict = dict, corpusWinCounts = wins)
    }
    def fullRemoval(c: DataFrame, batch: DataFrame) =
      ExactSubstr.removeDuplicatedSpans(c.unionByName(batch), "doc_id", L = 13)
        .join(batch.select("doc_id"), Seq("doc_id"), "left_semi")
    val n13 = (1 to 13).map(i => s"q$i").mkString(" ")
    val batch = Seq(
      (10L, s"$a13 keepme1 keepme2"),   // corpus-matched block cut, tail kept
      (11L, (1 to 15).map(i => s"nv$i").mkString(" ")), // novel: untouched
      (12L, s"$n13 t1 t2"),             // batch-internal pair with 20
      (20L, s"u1 $n13")
    ).toDF("doc_id", "text")
    def m(df: DataFrame) = df.collect().map(r => r.getLong(0) ->
      (r.getAs[Long]("n_tokens"), r.getAs[Long]("kept_tokens"),
        r.getAs[Long]("removed_tokens"), r.getAs[String]("clean_text"))).toMap
    val got = m(incRemoval(corpus, batch))
    assert(got === m(fullRemoval(corpus, batch)))
    assert(got(10L) === (15L, 2L, 13L, "keepme1 keepme2"))
    assert(got(11L)._3 === 0L, "novel content loses nothing")
    assert(got(20L) === (14L, 1L, 13L, "u1"))
  }

  test("ladder maintenance: extending the extension answers exactly " +
      "like a one-shot index — night-2 probes see night-1 content") {
    val n13 = (1 to 13).map(i => s"m$i").mkString(" ")
    val night1 = Seq(
      (40L, s"$n13 x1 x2"),            // new content entering the index
      (41L, (1 to 14).map(i => s"y$i").mkString(" "))
    ).toDF("doc_id", "text")
    val night2 = Seq(
      (50L, s"pre $n13"),              // matches NIGHT-1 content (the key case)
      (51L, s"$a13 tail1 tail2 tail3"),// matches the base corpus
      (52L, (1 to 15).map(i => s"fresh$i").mkString(" ")) // novel
    ).toDF("doc_id", "text")
    // grow the standing index by night 1 (levels, dicts, window counts)
    val rounds0 = ExactSubstr.orderedSuffixRounds(corpus, "doc_id", prefixLen = 8)
    val dict0 = ExactSubstr.corpusTokenDict(corpus, "doc_id")
    val ext = ExactSubstr.extendLadder(night1, "doc_id", "text",
      rounds0, dict0, prefixLen = 8)
    val win0 = ExactSubstr.corpusWindowCounts(rounds0.last._2, "doc_id", L = 13)
    val win1 = ExactSubstr.appendWindowCounts(win0, ext.batchRounds.last._2,
      "doc_id", L = 13)
    // the appended counts equal a one-shot count over the grown level
    val oneShot = ExactSubstr.corpusWindowCounts(ext.rounds.last._2,
      "doc_id", L = 13)
    def wm(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(wm(win1) === wm(oneShot))
    // night-2 coverage through the GROWN index == full rebuild over
    // corpus ∪ night1 ∪ night2 restricted to night 2
    val got = rows(ExactSubstr.batchSpanCoverageVsCorpus(night2, "doc_id",
      L = 13, corpusRounds = ext.rounds, tokenDict = ext.tokenDict,
      corpusWinCounts = win1, pairDicts = ext.pairDicts))
    assert(got === rows(fullRestricted(corpus.unionByName(night1), night2)))
    assert(got(50L) === (14L, 1L, 13L),
      "night-2 content matching night-1 content must be covered")
    assert(got(51L) === (16L, 1L, 13L))
    assert(got(52L) === (15L, 0L, 0L))
  }

  test("randomized union-equivalence: incremental == rebuild restricted to batch") {
    // overlapping half-blocks, self-repeats, short docs, shared prefixes
    val c = Seq(
      (1L, s"$a13 $b13"),
      (2L, s"$a13 mid $a13"),
      (3L, "tiny doc"),
      (4L, (1 to 30).map(i => s"f$i").mkString(" "))
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, s"pfx $a13 sfx"),                          // corpus-matched
      (11L, (5 to 25).map(i => s"f$i").mkString(" ")), // corpus 21-gram slice
      (12L, s"$b13"),                                  // exactly one window
      (13L, "short"),                                  // < L tokens: excluded
      (14L, (1 to 14).map(i => s"g$i").mkString(" "))  // novel, no dups
    ).toDF("doc_id", "text")
    assert(rows(incremental(c, batch)) === rows(fullRestricted(c, batch)))
  }
}
