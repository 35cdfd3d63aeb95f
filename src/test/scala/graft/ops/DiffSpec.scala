package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DiffSpec extends SparkSpec {
  import spark.implicits._

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    val old = Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)
    ).toDF("k", "status", "price")
    val latest = Seq(
      (1L, "a", 10.0),          // unchanged
      (2L, "b", 25.0),          // changed (price)
      (3L, "x", 30.0),          // changed (status)
      (5L, "e", 50.0)           // added; 4 removed
    ).toDF("k", "status", "price")
    val got = Diff.snapshotDiff(old, latest, Seq("k"))
      .select($"k", $"change_type").as[(Long, String)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "unchanged"), (2L, "changed"),
      (3L, "changed"), (4L, "removed"), (5L, "added")))
  }

  test("null payloads compare null-safely") {
    val old = Seq((1L, Option("a")), (2L, Option.empty[String]))
      .toDF("k", "v")
    val latest = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("k", "v")
    val got = Diff.snapshotDiff(old, latest, Seq("k"))
      .select($"k", $"change_type").as[(Long, String)]
      .collect().sortBy(_._1).toSeq
    // null -> null is unchanged; "a" -> null is changed
    assert(got == Seq((1L, "changed"), (2L, "unchanged")))
  }

  test("changes keeps old and new payload structs for the delta") {
    val old = Seq((1L, 10.0)).toDF("k", "p")
    val latest = Seq((1L, 11.0), (2L, 2.0)).toDF("k", "p")
    val rows = Diff.changes(old, latest, Seq("k"))
      .select($"k", $"change_type", $"old.p".as("old_p"), $"new.p".as("new_p"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.get(2)), Option(r.get(3)))).sortBy(_._1).toSeq
    assert(rows == Seq(
      (1L, "changed", Some(10.0), Some(11.0)),
      (2L, "added", None, Some(2.0))))
  }

  test("termDrift: exact TV contributions, direction, vanished term") {
    // old: 10 tokens (a×5 b×4 c×1); new: 5 tokens (a×1 b×4) — c
    // vanished, b's share doubled, a's collapsed
    val old = Seq((1L, "a a a a a b b b b c")).toDF("doc_id", "text")
    val neu = Seq((2L, "a b b b b")).toDF("doc_id", "text")
    val got = Diff.termDrift(old, neu, topK = 10)
      .as[(String, Long, Long, String, Long, Double, Double)]
      .collect().toSeq
    // l1 numerators (N_old=10, N_new=5): a |5·5−1·10|=15,
    // b |4·5−4·10|=20, c |1·5−0|=5 → rank b, a, c; total TV
    // = (20+15+5)/(2·10·5) = 0.4
    assert(got.map(r => (r._1, r._4, r._5)) ==
      Seq(("b", "up", 1L), ("a", "down", 2L), ("c", "down", 3L)))
    assert(got.map(_._6) == Seq(0.2, 0.15, 0.05))
    assert(got.forall(_._7 == 0.4))
    assert(got.map(r => (r._2, r._3)) ==
      Seq((4L, 4L), (5L, 1L), (1L, 0L)))
  }

  test("termDrift: contributions reconcile with the carried total " +
       "when topK covers the vocabulary") {
    val docs = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")
    val got = Diff.termDrift(docs, docs.filter($"doc_id" % 2 === 0),
        topK = 100000)
      .as[(String, Long, Long, String, Long, Double, Double)]
      .collect().toSeq
    assert(got.nonEmpty)
    val total = got.head._7
    assert(got.forall(_._7 == total)) // every row carries the same total
    // Σ per-term contributions = total (double-sum tolerance only —
    // the engines' own reconciliation is exact-integer)
    assert(math.abs(got.map(_._6).sum - total) < 1e-12)
    // directions partition the vocabulary consistently: a term with
    // zero new-count can only be 'down' (or flat if also zero-old)
    assert(got.filter(_._3 == 0L).forall(r =>
      r._4 == "down" || (r._2 == 0L && r._4 == "flat")))
  }

  test("termDrift: identical corpora drift nowhere") {
    val d = Seq((1L, "x y z"), (2L, "x x")).toDF("doc_id", "text")
    val got = Diff.termDrift(d, d, topK = 10)
      .as[(String, Long, Long, String, Long, Double, Double)]
      .collect().toSeq
    assert(got.size == 3 && got.forall(_._4 == "flat"))
    assert(got.forall(_._6 == 0.0) && got.forall(_._7 == 0.0))
  }
}
