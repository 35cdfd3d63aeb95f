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
}
