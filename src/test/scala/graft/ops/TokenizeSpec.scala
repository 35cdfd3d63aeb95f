package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Greedy longest-match tokenizer encode: exact piece semantics on a
  * crafted vocab, the q69 salt's non-vacuity on real testdata, and
  * the encode→packSequences feed (real token counts). */
class TokenizeSpec extends SparkSpec {
  import spark.implicits._

  // buildVocab-shaped frame: (vocab_id, token, n)
  private def vocab = Seq((1, "ab", 9L), (2, "a", 8L), (3, "abc", 7L))
    .toDF("vocab_id", "token", "n")

  test("greedy encode: longest match wins, OOV tails and whole-OOV words") {
    val docs = Seq((0L, "abcab abx zz a")).toDF("doc_id", "text")
    val out = TextOps.encodeGreedy(docs, vocab)
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getString(3),
        r.getInt(4)))
    assert(out.toSeq == Seq(
      (0, 0, "abc", 3), (0, 1, "ab", 1),  // abcab: abc (longest), then ab
      (1, 0, "ab", 1), (1, 1, "x", 0),    // abx: ab, then OOV tail
      (2, 0, "zz", 0),                    // zz: whole word OOV
      (3, 0, "a", 2)))                    // a: exact hit
  }

  test("q69 salt is non-vacuous at sf0.001: multi-piece and OOV both occur") {
    val docs = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
    val v = TextOps.buildVocab(docs, minCount = 5L)
    val t1 = element_at(TextOps.tokens(col("text")), 1)
    val salted = docs.withColumn("text", concat(col("text"),
      when(col("doc_id") % 3 === 0, concat(lit(" "), t1, t1))
        .otherwise(lit("")),
      when(col("doc_id") % 7 === 0, concat(lit(" "), t1, lit("9q")))
        .otherwise(lit(""))))
    val enc = TextOps.encodeGreedy(salted, v)
    val multiPiece = enc.groupBy("doc_id", "word_pos")
      .count().filter(col("count") > 1).count()
    assert(multiPiece > 0, "salt must produce multi-piece words")
    assert(enc.filter(col("vocab_id") === 0).count() > 0,
      "salt must produce OOV pieces")
    assert(enc.filter(col("vocab_id") > 0).count() > 0)
  }

  test("encoded piece counts feed packSequences as real token counts") {
    val docs = Seq(
      (0L, "en", "abcab abx"),   // 4 pieces (abc, ab, ab, x)
      (1L, "en", "a a a"),       // 3 pieces
      (2L, "en", "zz")           // 1 piece
    ).toDF("doc_id", "lang", "text")
    val counts = TextOps.encodeGreedy(docs, vocab)
      .groupBy("doc_id").agg(count(lit(1)).as("n_pieces"))
      .join(docs.select("doc_id", "lang"), "doc_id")
    // budget 4, shards 1: exclusive cumsums 0,4,7 -> bins 0,1,1
    val out = TextOps.packSequences(counts, budget = 4L, shards = 1,
      countCol = Some("n_pieces"))
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))
    assert(out.toSeq == Seq(
      (0L, 1L, 4L, 0L, 0L),   // bin 0: doc 0, 4 pieces
      (1L, 2L, 4L, 1L, 2L)))  // bin 1: docs 1+2, 3+1 pieces
  }

  test("bpeLearn: hand-computed merges, leftmost-non-overlap, exhaustion") {
    // words: aaab (n=2), ab (n=1)
    // r1: (a,a) cnt 4 beats (a,b) cnt 3 -> aa; aaab folds to [aa,a,b]
    //     ("aaa" under (a,a) merges leftmost-first: [aa, a])
    // r2: (a,b) cnt 3 beats (aa,a) cnt 2 -> ab; states [aa,ab], [ab]
    // r3: (aa,ab) cnt 2 -> aaab; then no pairs remain -> stop early
    val docs = Seq((1L, "aaab aaab ab")).toDF("doc_id", "text")
    val got = TextOps.bpeLearn(docs, numMerges = 5)
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "a", "a", "aa", 4L),
      (2L, "a", "b", "ab", 3L),
      (3L, "aa", "ab", "aaab", 2L)))
    // the induced segmentation: both words fully merged by round 3
    val seg = TextOps.bpeSegment(docs, numMerges = 5)
      .as[(String, Long, Long, String)].collect().toSeq
    assert(seg == Seq(
      ("aaab", 2L, 1L, "aaab"),
      ("ab", 1L, 1L, "ab")))
  }

  test("vocabCoverageCurve: exact ranks, monotone coverage, " +
       "saturation at full vocab") {
    // counts: a×5, b×3, c×3, d×1 → rank order a, b, c, d (count
    // desc, type asc); total 12 tokens, 4 types
    val docs = Seq(
      (1L, "a a a b b c"),
      (2L, "a a b c c d")
    ).toDF("doc_id", "text")
    val got = TextOps.vocabCoverageCurve(docs, maxLog2 = 3)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 5L, 5.0 / 12),    // top-1: a
      (2L, 2L, 8L, 8.0 / 12),    // +b (b before c at equal count)
      (4L, 4L, 12L, 1.0),        // full vocab
      (8L, 4L, 12L, 1.0)))       // saturated
  }

  test("tokenizerReport: OOV char-fallback and exact fertility " +
       "arithmetic") {
    // train vocab: {aaab, ab} — 2 merges fuse "aa" then "aaa"… the
    // table maps aaab→pieces; "zzz" is unseen → OOV, 3 char pieces
    val train = Seq((0L, "aaab ab aaab")).toDF("doc_id", "text")
    val docs = Seq(
      (0L, "aaab ab aaab", "s1"),   // all in-vocab
      (1L, "aaab zzz", "s2")        // one OOV word of length 3
    ).toDF("doc_id", "text", "source")
    val table = TextOps.bpeSegment(train, numMerges = 5)
      .as[(String, Long, Long, String)].collect()
      .map(r => r._1 -> r._3).toMap
    val got = TextOps.tokenizerReport(docs, train, numMerges = 5)
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    val s1Pieces = 2 * table("aaab") + table("ab")
    assert(got == Seq(
      ("s1", 3L, 0L, 0.0, s1Pieces.toDouble / 3),
      ("s2", 2L, 1L, 0.5, (table("aaab") + 3L).toDouble / 2)))
  }
}
