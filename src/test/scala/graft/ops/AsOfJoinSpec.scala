package graft.ops

import java.sql.Timestamp

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof attaches the latest right row at or before left time") {
    val trades = Seq(
      (1L, "A", ts("2024-01-01 10:00:05")),
      (2L, "A", ts("2024-01-01 10:00:30")),
      (3L, "B", ts("2024-01-01 10:00:10")),
      (4L, "C", ts("2024-01-01 10:00:10")))   // no quotes for C
      .toDF("trade_id", "sym", "t")
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 100.0),
      ("A", ts("2024-01-01 10:00:05"), 101.0),  // equal ts: inclusive
      ("A", ts("2024-01-01 10:00:20"), 102.0),
      ("B", ts("2024-01-01 10:00:50"), 200.0))  // after the trade
      .toDF("sym", "qt", "px")

    val out = AsOfJoin.asof(trades, quotes, Seq("sym"),
        leftTime = "t", rightTime = "qt", rightCols = Seq("px"))
      .orderBy("trade_id").collect()

    assert(out.length == 4)                       // left rows preserved
    assert(out(0).getAs[Double]("px") == 101.0)   // inclusive <=
    assert(out(1).getAs[Double]("px") == 102.0)   // latest before
    assert(out(2).isNullAt(out(2).fieldIndex("px")))  // only later quotes
    assert(out(3).isNullAt(out(3).fieldIndex("px")))  // no right rows
    // the carried timestamp comes from the SAME right row as px
    assert(out(1).getAs[Timestamp]("qt") == ts("2024-01-01 10:00:20"))
  }

  test("asof rejects reserved and colliding column names") {
    val l = Seq((1L, "K", ts("2024-01-01 00:00:10"), 0.0))
      .toDF("id", "k", "t", "px")
    val r = Seq(("K", ts("2024-01-01 00:00:01"), 1.0))
      .toDF("k", "rt", "px")
    // right payload "px" collides with a left column
    assertThrows[IllegalArgumentException] {
      AsOfJoin.asof(l, r, Seq("k"), "t", "rt", Seq("px"))
    }
    // reserved internal name on the left
    val lReserved = l.withColumnRenamed("px", "__side")
    assertThrows[IllegalArgumentException] {
      AsOfJoin.asof(lReserved, r, Seq("k"), "t", "rt", Seq("px"))
    }
  }

  test("payload columns stay consistent (one struct, one right row)") {
    val l = Seq((1L, "K", ts("2024-01-01 00:00:10")))
      .toDF("id", "k", "t")
    val r = Seq(
      ("K", ts("2024-01-01 00:00:01"), 1.0, "first"),
      ("K", ts("2024-01-01 00:00:09"), 9.0, "ninth"))
      .toDF("k", "rt", "v", "tag")
    val row = AsOfJoin.asof(l, r, Seq("k"), "t", "rt",
      Seq("v", "tag")).head()
    assert(row.getAs[Double]("v") == 9.0)
    assert(row.getAs[String]("tag") == "ninth")
  }

  test("asofForward attaches the earliest right row strictly after") {
    val probes = Seq(
      (1L, "A", ts("2024-01-01 10:00:05")),
      (2L, "A", ts("2024-01-01 10:00:30")),
      (3L, "B", ts("2024-01-01 10:00:10")),   // only an earlier quote
      (4L, "C", ts("2024-01-01 10:00:10")))   // no quotes at all
      .toDF("probe_id", "sym", "t")
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:05"), 101.0), // equal ts: NOT after
      ("A", ts("2024-01-01 10:00:20"), 102.0),
      ("A", ts("2024-01-01 10:00:20"), 101.5), // duplicate time:
      ("A", ts("2024-01-01 10:00:40"), 103.0), //   smallest px wins
      ("B", ts("2024-01-01 10:00:00"), 200.0))
      .toDF("sym", "qt", "px")

    val out = AsOfJoin.asofForward(probes, quotes, Seq("sym"),
        leftTime = "t", rightTime = "qt", rightCols = Seq("px"))
      .orderBy("probe_id").collect()

    assert(out.length == 4)
    // probe 1: equal-ts quote skipped (strict), next is 10:00:20 and
    // among the duplicate-time pair the SMALLEST payload wins
    assert(out(0).getAs[Double]("px") == 101.5)
    assert(out(0).getAs[Timestamp]("qt") == ts("2024-01-01 10:00:20"))
    assert(out(1).getAs[Double]("px") == 103.0)
    // B's only quote is earlier; C has none — both null
    assert(out(2).isNullAt(out(2).fieldIndex("px")))
    assert(out(3).isNullAt(out(3).fieldIndex("px")))
  }

  test("null timestamps never match, in either direction") {
    val lefts = Seq(
      (1L, "A", Some(ts("2024-01-01 10:00:00"))),
      (2L, "A", None))                       // null left time
      .toDF("id", "sym", "t")
    val rights = Seq(
      ("A", Some(ts("2024-01-01 09:00:00")), 1.0),
      ("A", Some(ts("2024-01-01 11:00:00")), 2.0),
      ("A", None, 99.0))                     // null right time
      .toDF("sym", "qt", "px")
    val back = AsOfJoin.asof(lefts, rights, Seq("sym"), "t", "qt",
      Seq("px")).orderBy("id").collect()
    // null right row must not be carried anywhere; null left gets null
    assert(back(0).getAs[Double]("px") == 1.0)
    assert(back(1).isNullAt(back(1).fieldIndex("px")))
    val fwd = AsOfJoin.asofForward(lefts, rights, Seq("sym"), "t", "qt",
      Seq("px")).orderBy("id").collect()
    assert(fwd(0).getAs[Double]("px") == 2.0)
    assert(fwd(1).isNullAt(fwd(1).fieldIndex("px")))
  }
}
