package graft.ops

import graft.SparkSpec

/** Line-level boilerplate removal and winnowing fingerprints —
  * semantics the q124/q125 oracles replay at corpus scale, pinned
  * here on hand-computed corpora. */
class LineWinnowSpec extends SparkSpec {
  import spark.implicits._

  // --- lineDedup ----------------------------------------------------

  test("lineDedup removes a ubiquitous line everywhere, keeps order") {
    val docs = Seq(
      (1L, "SUBSCRIBE NOW\nalpha beta\ngamma delta"),
      (2L, "epsilon zeta\nSUBSCRIBE NOW"),
      (3L, "SUBSCRIBE NOW\neta theta")
    ).toDF("doc_id", "text")
    val got = TextOps.lineDedup(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got === Array(
      (1L, "alpha beta\ngamma delta", 3L, 1L),
      (2L, "epsilon zeta", 2L, 1L),
      (3L, "eta theta", 2L, 1L)))
  }

  test("lineDedup: within-doc repeat (df = 1) survives; minDf knob") {
    val docs = Seq(
      (1L, "solo line\nsolo line\nbody one"),
      (2L, "body two\nshared pair"),
      (3L, "shared pair\nbody three")
    ).toDF("doc_id", "text")
    // df("solo line") = 1 distinct doc -> kept twice
    val d2 = TextOps.lineDedup(docs, minDf = 2).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(d2(1L) == "solo line\nsolo line\nbody one")
    assert(d2(2L) == "body two")
    assert(d2(3L) == "body three")
    // minDf = 3: the 2-doc "shared pair" line is under threshold
    val d3 = TextOps.lineDedup(docs, minDf = 3).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(d3(2L) == "body two\nshared pair")
    assert(d3(3L) == "shared pair\nbody three")
  }

  test("lineDedup: all-boilerplate doc reduces to empty text") {
    val docs = Seq(
      (1L, "footer"), (2L, "footer"), (3L, "footer\nreal content")
    ).toDF("doc_id", "text")
    val got = TextOps.lineDedup(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSeq
    assert(got == Seq((1L, "", 1L), (2L, "", 1L),
      (3L, "real content", 1L)))
  }

  // --- winnowing ----------------------------------------------------

  test("winnowing guarantee: shared run >= w + k - 1 at ANY offset " +
       "shares a fingerprint") {
    // doc 2 copies doc 1's 12-token run behind a one-token prefix —
    // the alignment that defeats stride-k blocks; winnowing selects
    // by hash minima, which the prefix cannot move off the shared run
    val docs = Seq(
      (1L, "q w e r t y u i o p a s"),
      (2L, "zz q w e r t y u i o p a s")
    ).toDF("doc_id", "text")
    val shared = TextOps.winnowFingerprints(docs, k = 5, w = 4)
      .groupBy("fp").count().filter($"count" === 2).count()
    assert(shared >= 1)
    val pairs = TextOps.winnowCandidates(docs, k = 5, w = 4,
      minShared = 1).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 2L)))
  }

  test("winnowing density: fingerprints are a strict subset of kgrams " +
       "and unrelated docs share none") {
    val docs = Seq(
      (1L, "one two three four five six seven eight nine ten"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa")
    ).toDF("doc_id", "text")
    val fps = TextOps.winnowFingerprints(docs, k = 3, w = 4)
    val perDoc = fps.groupBy("doc_id").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // 8 kgrams per doc, 5 windows -> at most 5 distinct fingerprints
    assert(perDoc(1L) <= 5 && perDoc(2L) <= 5)
    assert(TextOps.winnowCandidates(docs, k = 3, w = 4,
      minShared = 1).count() == 0)
  }

  test("winnowCandidates dfCap drops boilerplate fingerprints") {
    // the same text in 5 docs: every fingerprint has df = 5; with
    // dfCap = 4 no pair survives, with dfCap = 5 all 10 pairs do
    val docs = (1L to 5L).map(i => (i, "a b c d e f g h i j"))
      .toDF("doc_id", "text")
    assert(TextOps.winnowCandidates(docs, minShared = 1,
      dfCap = 4).count() == 0)
    assert(TextOps.winnowCandidates(docs, minShared = 1,
      dfCap = 5).count() == 10)
  }

  test("winnowFingerprints: short docs emit nothing, selection is " +
       "deterministic") {
    val docs = Seq((1L, "a b c"), (2L, "a b c d e f g h")).toDF(
      "doc_id", "text")
    val fps = TextOps.winnowFingerprints(docs, k = 5, w = 4)
    assert(fps.filter($"doc_id" === 1L).count() == 0)
    val twice = TextOps.winnowFingerprints(docs, k = 5, w = 4)
    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    assert(sorted(fps) == sorted(twice))
  }

  test("winnowCandidates survives docs shorter than k under the " +
       "inferred-generate predicate (sf0.1 regression)") {
    // InferFiltersFromGenerate pushes size(fps) > 0 — with the
    // fingerprint transforms inlined — below the length filter, so
    // the transforms are evaluated on short docs too; unclamped
    // sequence bounds then feed slice a 0 start and the whole stage
    // throws. Mixed lengths + the candidate self-join reproduce it.
    val docs = Seq(
      (1L, "a b c d e f g"),                        // 7 toks  < k
      (2L, "a b c d e f g h i j"),                  // 10 toks < k+w-1
      (3L, (1 to 40).map("t" + _).mkString(" ")),
      (4L, "pad " + (1 to 40).map("t" + _).mkString(" "))
    ).toDF("doc_id", "text")
    val got = TextOps.winnowCandidates(docs, k = 8, w = 4,
      minShared = 1, dfCap = 20).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((3L, 4L)))
  }
}
