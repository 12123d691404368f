package graft.text

import graft.SparkSpec

class BpeLearningSpec extends SparkSpec {
  import spark.implicits._

  private def merges(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[Int]("merge_round"), r.getAs[String]("lhs"),
      r.getAs[String]("rhs"), r.getAs[Long]("pair_count"))).sortBy(_._1).toSeq

  test("learned merges are hand-checkable on a planted corpus, with the " +
      "(count DESC, lhs, rhs) tie-break") {
    // words: abc x3, ab x1 -> round 1 pairs (a,b):4 (b,c):3 -> (a,b) wins;
    // round 2: only (ab,c):3 remains; round 3: all words are single
    // symbols -> learning stops early even though 5 rounds were allowed
    val docs = Seq((1L, "abc abc abc"), (2L, "ab")).toDF("doc_id", "text")
    val out = merges(BpeLearning.learnBpeMerges(docs, rounds = 5))
    assert(out === Seq((1, "a", "b", 4L), (2, "ab", "c", 3L)))
  }

  test("within-round merging is canonical greedy left-to-right " +
      "non-overlapping (disjoint occurrences merge, overlaps skip)") {
    // round 1 merges (a,a) count 5 (3 in aaaa + 2 in aaa); greedy makes
    // aaaa -> [aa, aa] (both disjoint pairs) and aaa -> [aa, a] (overlap
    // skipped). Round 2: pairs (aa,aa):1 and (aa,a):1 tie on count ->
    // rhs tie-break picks (aa,a). Round 3: only (aa,aa) remains.
    val docs = Seq((1L, "aaaa aaa")).toDF("doc_id", "text")
    val out = merges(BpeLearning.learnBpeMerges(docs, rounds = 3))
    assert(out === Seq((1, "a", "a", 5L), (2, "aa", "a", 1L),
      (3, "aa", "aa", 1L)))
  }

  test("applyBpeMerges segments a held-out doc with the learned merges, " +
      "in merge order, with exact per-doc accounting") {
    val train = Seq((1L, "abc abc abc"), (2L, "ab")).toDF("doc_id", "text")
    val mergeTable = BpeLearning.learnBpeMerges(train, rounds = 5)
    // held-out: "abcab" -> chars a b c a b -> (a,b): [ab, c, ab]
    // -> (ab,c): [abc, ab]; plus a two-word doc exercising word order
    val apply = Seq((10L, "abcab"), (11L, "ab abc")).toDF("doc_id", "text")
    val out = BpeLearning.applyBpeMerges(apply, "doc_id", mergeTable)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_words"), r.getAs[Long]("n_chars"),
          r.getAs[Long]("n_bpe_tokens"), r.getAs[String]("seg_hash")))).toMap
    assert(out(10L)._1 === 1L && out(10L)._2 === 5L && out(10L)._3 === 2L)
    assert(out(11L)._1 === 2L && out(11L)._2 === 5L && out(11L)._3 === 2L)
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(10L)._4 === md5("abc  ab"))
    assert(out(11L)._4 === md5("ab | abc"))
  }

  test("applyBpeMerges with an empty merge table is pure character " +
      "segmentation") {
    val docs = Seq((1L, "hi yo")).toDF("doc_id", "text")
    val empty = BpeLearning.learnBpeMerges(docs, rounds = 1).limit(0)
    val r = BpeLearning.applyBpeMerges(docs, "doc_id", empty).collect().head
    assert(r.getAs[Long]("n_words") === 2L)
    assert(r.getAs[Long]("n_chars") === 4L)
    assert(r.getAs[Long]("n_bpe_tokens") === 4L) // every char its own token
  }

  test("tokenizerFertility: the language whose words the merges cover " +
      "fragments less") {
    // merges learned on lang-A words: "abc" fully merges to one token;
    // lang-B "xyz" stays three characters -> fertility (tokens/word)
    // is 1.0 for A and 3.0 for B, chars/token 3.0 vs 1.0
    val train = Seq((1L, "abc abc abc"), (2L, "ab")).toDF("doc_id", "text")
    val mergeTable = BpeLearning.learnBpeMerges(train, rounds = 5)
    val docs = Seq((10L, "abc abc", "A"), (11L, "xyz xyz", "B"))
      .toDF("doc_id", "text", "lang")
    val out = BpeLearning.tokenizerFertility(docs, "doc_id", mergeTable, "lang")
      .collect().map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_words"),
          r.getAs[Long]("n_bpe_tokens"),
          r.getAs[Long]("chars_per_token_micros"),
          r.getAs[Long]("tokens_per_word_micros")))).toMap
    assert(out("A") === ((1L, 2L, 2L, 3000000L, 1000000L)))
    assert(out("B") === ((1L, 2L, 6L, 1000000L, 3000000L)))
  }

  test("multi-char symbols never false-match inside a neighbor") {
    // after (a,b) merges, word xab holds symbol sequence [x, ab]; the
    // round-2 winner (x,ab) must come from THAT adjacency, never from a
    // phantom 'ab' inside another symbol
    val docs = Seq((1L, "xab xab ab")).toDF("doc_id", "text")
    val out = merges(BpeLearning.learnBpeMerges(docs, rounds = 2))
    assert(out === Seq((1, "a", "b", 3L), (2, "x", "ab", 2L)))
  }
}
