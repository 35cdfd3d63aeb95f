package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** VERDICT r6 item 3: boundary-robust duplicated-span detection.
  * Proves (1) the tumbling [[TextOps.spanScrub]] blind spot — a span
  * duplicated at a +1 token offset crosses every block boundary and
  * survives the scrub; (2) [[TextOps.slidingScrub]] removes it; and
  * (3) the [[TextOps.dupSpans]] AUDIT (q78) was never blind — its
  * stride-1 windows flag the offset copy (correcting the r6 verdict's
  * reading of q78 as tumbling). */
class SlidingScrubSpec extends SparkSpec {
  import spark.implicits._

  // docB repeats docA's 8 tokens behind a one-token prefix: no
  // tumbling 4-block of docB equals any 4-block of docA, but every
  // sliding 4-window of the copied span matches.
  private def corpus = Seq(
    (1L, "a b c d e f g h"),
    (2L, "z a b c d e f g h")
  ).toDF("doc_id", "text")

  test("spanScrub misses a +1-offset duplicated span (the blind spot)") {
    val out = TextOps.spanScrub(corpus, k = 4).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(3))).toMap
    assert(out(2L)._1 == "z a b c d e f g h",
      "tumbling blocks must NOT catch the misaligned copy")
    assert(out(2L)._2 == 0L)
  }

  test("slidingScrub removes the +1-offset duplicated span") {
    val out = TextOps.slidingScrub(corpus, k = 4).collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    // first occurrence (docA) keeps everything
    assert(out(1L) == (("a b c d e f g h", 8L, 0L)))
    // every token of docB covered by a duplicated window is removed;
    // only the unshared prefix survives
    assert(out(2L) == (("z", 9L, 8L)))
  }

  test("dupSpans (q78) already flags the offset copy — stride-1 audit") {
    val out = TextOps.dupSpans(corpus, k = 4, minDf = 2, flagRatio = 0.5)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // docA: 5 windows, all duplicated in docB; docB: 6 windows, 5 dup
    assert(out(1L) == ((5L, 5L)))
    assert(out(2L) == ((6L, 5L)))
  }

  test("slidingScrub: no-dup corpus unchanged; short docs verbatim") {
    val clean = Seq(
      (1L, "p q r s t u"),
      (2L, "v w x"),          // shorter than k: no windows, kept
      (3L, "")
    ).toDF("doc_id", "text")
    val out = TextOps.slidingScrub(clean, k = 4).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, "p q r s t u", 6L, 0L),
      (2L, "v w x", 3L, 0L),
      (3L, "", 1L, 0L)))
  }

  test("slidingScrub: within-doc repetition — later copy removed") {
    val rep = Seq((1L, "a b c d x y a b c d")).toDF("doc_id", "text")
    val out = TextOps.slidingScrub(rep, k = 4).collect()
      .map(r => (r.getString(1), r.getLong(3))).head
    assert(out == (("a b c d x y", 4L)))
  }

  test("maxDupSpans: exact extent of a +1-offset duplicated span") {
    val out = TextOps.maxDupSpans(corpus, k = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
    // the shared 8-token run surfaces at its exact extent and offset
    // in BOTH docs (the audit reports every copy, not just later ones)
    assert(out.toSeq == Seq(
      (1L, 0L, 8L, 5L, "a b c d e f g h"),
      (2L, 1L, 8L, 5L, "a b c d e f g h")))
  }

  test("maxDupSpans: distant repeats split into separate regions, " +
       "near repeats merge") {
    val docs = Seq(
      // two copies of "a b c d" separated by 6 unique tokens: gap
      // between dup positions (0 and 10) > k=4 → two regions
      (1L, "a b c d u1 u2 u3 u4 u5 u6 a b c d"),
      (2L, "a b c d z9"),
      // overlapping dup coverage: windows "p q r s" (pos 0) and
      // "q r s t" (pos 1) both duplicated → gap 1 ≤ k merges them
      // into ONE 5-token region
      (3L, "p q r s t"),
      (4L, "p q r s t y")
    ).toDF("doc_id", "text")
    val out = TextOps.maxDupSpans(docs, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(4)))
    val byDoc = out.groupBy(_._1)
    // doc1: regions at 0 and 10, each exactly 4 tokens — NOT one
    // 14-token region (the gap exceeds k)
    assert(byDoc(1L).map(t => (t._2, t._3)).toSet ==
      Set((0L, 4L), (10L, 4L)))
    // docs 3/4: one merged maximal region covering the shared run
    assert(byDoc(3L).map(t => (t._2, t._3, t._4)).toSeq ==
      Seq((0L, 5L, "p q r s t")))
    assert(byDoc(4L).map(t => (t._2, t._3, t._4)).toSeq ==
      Seq((0L, 5L, "p q r s t")))
  }

  test("maxDupSpans: island merge covers a long span shared across " +
       "three docs at three alignments") {
    val docs = Seq(
      (1L, "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10"),
      (2L, "x s1 s2 s3 s4 s5 s6 s7 s8 s9 s10"),
      (3L, "y z s1 s2 s3 s4 s5 s6 s7 s8 s9 s10")
    ).toDF("doc_id", "text")
    val out = TextOps.maxDupSpans(docs, k = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(4)))
    val full = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10"
    assert(out.toSeq == Seq(
      (1L, 0L, 10L, full), (2L, 1L, 10L, full), (3L, 2L, 10L, full)))
  }

  test("maxDupSpans: clean corpus and short docs produce no spans") {
    val clean = Seq((1L, "p q r s t u"), (2L, "v w x")).toDF("doc_id", "text")
    assert(TextOps.maxDupSpans(clean, k = 4).count() == 0L)
  }

  test("cdcChunkAudit: insertion-robust dedup — chunks re-sync after " +
       "the edit") {
    // find a boundary token with the op's own predicate (first 4 md5
    // hex digits mod 16 == 0) so the test controls chunking exactly
    val cands = (1 to 300).map(i => s"w$i").toDF("t")
    val bt = cands.filter(
      conv(substring(md5($"t"), 1, 4), 16, 10).cast("long") % 16 === 0)
      .head().getString(0)
    val suffix = "s1 s2 s3 s4 s5 s6 s7 s8"
    val docs = Seq(
      (1L, s"pre1 pre2 pre3 $bt $suffix"),
      // one token inserted BEFORE the boundary: the suffix chunk
      // after the boundary re-synchronizes and dedupes
      (2L, s"pre1 INS pre2 pre3 $bt $suffix")
    ).toDF("doc_id", "text")
    val out = TextOps.cdcChunkAudit(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    // doc 1 owns every first occurrence
    assert(out(1L)._3 == 0L)
    // doc 2: the post-boundary suffix chunk is caught as duplicated
    // despite the upstream insertion (fixed blocks would misalign)
    assert(out(2L)._3 >= 1L, s"expected a re-synced dup chunk: $out")
    // token counts reconcile
    assert(out(1L)._1 == 12L && out(2L)._1 == 13L)
  }

  test("cdcChunkAudit: no boundary token means one chunk per doc, " +
       "exact-dup docs fully flagged") {
    // tokens chosen from the complement of the boundary predicate
    val cands = (1 to 50).map(i => s"w$i").toDF("t")
    val nb = cands.filter(
      conv(substring(md5($"t"), 1, 4), 16, 10).cast("long") % 16 =!= 0)
      .collect().map(_.getString(0)).take(6)
    val text = nb.mkString(" ")
    val docs = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
    val out = TextOps.cdcChunkAudit(docs).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getDouble(5)))
    assert(out.toSeq == Seq((1L, 1L, 0L, 0.0), (2L, 1L, 1L, 1.0)))
  }
}
