package graft.ops

import java.sql.Timestamp

import graft.SparkSpec

class TimeseriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("gapFillLocf: per-key span, last-event-per-day, LOCF on gaps") {
    val events = Seq(
      // user 1: two events on day 1 (later ts wins), nothing on day
      // 2, one event on day 3 — expect a filled day-2 row
      (1L, ts("2024-01-01 08:00:00"), 10L, 1.0),
      (1L, ts("2024-01-01 17:00:00"), 11L, 2.0),
      (1L, ts("2024-01-03 12:00:00"), 12L, 9.0),
      // user 2: a single day — spine is that one day, no gaps
      (2L, ts("2024-02-10 00:30:00"), 13L, 7.0)
    ).toDF("user_id", "ts", "event_id", "value")

    val out = Timeseries.gapFillLocf(events)
      .as[(Long, java.sql.Date, Double, Boolean)].collect().toSeq
    assert(out == Seq(
      (1L, java.sql.Date.valueOf("2024-01-01"), 2.0, false),
      (1L, java.sql.Date.valueOf("2024-01-02"), 2.0, true),
      (1L, java.sql.Date.valueOf("2024-01-03"), 9.0, false),
      (2L, java.sql.Date.valueOf("2024-02-10"), 7.0, false)))
  }

  test("trailingFeatures: 7-day range frame, order-independent aggs") {
    val events = Seq(
      // user 1: days 1, 3, 9 — day 3 sits exactly at day 9's -6 edge
      (1L, ts("2024-01-01 08:00:00"), 1L, 5.0),
      (1L, ts("2024-01-01 09:00:00"), 2L, 3.0),
      (1L, ts("2024-01-03 10:00:00"), 3L, 4.0),
      (1L, ts("2024-01-09 11:00:00"), 4L, 1.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val got = Timeseries.trailingFeatures(events)
      .as[(Long, java.sql.Date, Long, Double, Option[Long])]
      .collect().toSeq
    assert(got == Seq(
      (1L, java.sql.Date.valueOf("2024-01-01"), 2L, 5.0, None),
      // day 3 sees days 1+3: 3 events, max 5.0, 2 days since prev
      (1L, java.sql.Date.valueOf("2024-01-03"), 3L, 5.0, Some(2L)),
      // day 9's frame is [day 3, day 9]: day 3 is exactly -6
      (1L, java.sql.Date.valueOf("2024-01-09"), 2L, 4.0, Some(6L))))
  }

  test("gapFillLocf: ts tie on the last day breaks by event_id") {
    val events = Seq(
      (5L, ts("2024-03-01 12:00:00"), 20L, 1.0),
      (5L, ts("2024-03-01 12:00:00"), 21L, 2.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val out = Timeseries.gapFillLocf(events).collect()
    assert(out.length == 1 && out.head.getDouble(2) == 2.0)
  }

  test("volumeAnomalies: exact median/MAD, burst flagged, 0-MAD branch") {
    // key "a": 5 days with counts 1,2,3,4,100 (odd n → integer
    // median 3; devs 2,1,0,1,97 → MAD 1) — the burst day is 97 MADs
    // out; day 4 (dev 1 = 1·MAD) must NOT flag at k=5
    // key "b": 4 days with counts 1,2,3,4 (even n → median 2.5,
    // devs 1.5,0.5,0.5,1.5 → MAD 1.0; max score 1.5) — nothing flags
    // key "c": constant 2,2,2 → MAD 0, no deviation → no flag, null
    // score (strictest reading: ANY deviation would flag)
    def burst(key: String, day: Int, n: Int, base: Long) =
      (0 until n).map(i =>
        (base + day * 1000 + i, ts(f"2024-03-$day%02d 12:00:00"), key))
    val events = (
      burst("a", 1, 1, 0L) ++ burst("a", 2, 2, 0L) ++
        burst("a", 3, 3, 0L) ++ burst("a", 4, 4, 0L) ++
        burst("a", 5, 100, 0L) ++
        burst("b", 1, 1, 100000L) ++ burst("b", 2, 2, 100000L) ++
        burst("b", 3, 3, 100000L) ++ burst("b", 4, 4, 100000L) ++
        burst("c", 1, 2, 200000L) ++ burst("c", 2, 2, 200000L) ++
        burst("c", 3, 2, 200000L))
      .toDF("event_id", "ts", "event_type")
    val out = Timeseries.volumeAnomalies(events)
      .as[(String, java.sql.Date, Long, Double, Double,
        Option[Double], Boolean)].collect().toSeq
    val byKey = out.groupBy(_._1)
    val a = byKey("a").sortBy(_._2.toString)
    assert(a.map(_._3) == Seq(1L, 2L, 3L, 4L, 100L))
    assert(a.forall(r => r._4 == 3.0 && r._5 == 1.0))
    assert(a.map(_._7) == Seq(false, false, false, false, true))
    assert(a.last._6.contains(97.0))
    val b = byKey("b").sortBy(_._2.toString)
    assert(b.forall(r => r._4 == 2.5 && r._5 == 1.0 && !r._7))
    assert(b.map(_._6.get) == Seq(1.5, 0.5, 0.5, 1.5))
    val c = byKey("c").sortBy(_._2.toString)
    assert(c.forall(r => r._4 == 2.0 && r._5 == 0.0 &&
      r._6.isEmpty && !r._7))
  }
}
