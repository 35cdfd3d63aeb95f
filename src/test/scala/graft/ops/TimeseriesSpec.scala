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
}
