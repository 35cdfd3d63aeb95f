package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import EventStream.Event

class EventStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowedEngagement aggregates tumbling windows on a stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStream.windowedEngagement(
        input.toDF(), windowLen = "1 hour", watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("eng")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(
        Event(1, ts("2024-01-01 10:05:00"), 1, "view", 1.0),
        Event(2, ts("2024-01-01 10:20:00"), 2, "view", 3.0),
        Event(3, ts("2024-01-01 11:10:00"), 1, "click", 2.0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT window_start, event_type, n_events, max_value " +
          "FROM eng ORDER BY window_start, event_type").collect()
      assert(rows.length == 2)
      assert(rows(0).getTimestamp(0) == ts("2024-01-01 10:00:00"))
      assert(rows(0).getString(1) == "view")
      assert(rows(0).getLong(2) == 2)
      assert(rows(0).getDouble(3) == 3.0)
      assert(rows(1).getString(1) == "click")
    } finally q.stop()
  }

  test("dedupWithinWatermark drops repeated keys on a stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStream.dedupWithinWatermark(
        input.toDF(), Seq("user_id", "event_type"))
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        Event(1, ts("2024-01-01 10:00:00"), 1, "view", 1.0),
        Event(2, ts("2024-01-01 10:05:00"), 1, "view", 2.0),   // dup key
        Event(3, ts("2024-01-01 10:06:00"), 1, "click", 3.0),
        Event(4, ts("2024-01-01 10:07:00"), 2, "view", 4.0))
      q.processAllAvailable()
      val n = spark.sql("SELECT count(*) FROM dedup_stream").head().getLong(0)
      assert(n == 3)   // (1,view) kept once, (1,click), (2,view)
    } finally q.stop()
  }

  test("latestByKeyStream tracks the batch upsert winner across " +
      "out-of-order batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStream.latestByKeyStream(input.toDS())
      .writeStream.format("memory").queryName("latest_stream")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(
        Event(1, ts("2024-01-01 10:00:00"), 1, "view", 1.0),
        Event(2, ts("2024-01-01 11:00:00"), 1, "view", 2.0))
      q.processAllAvailable()
      // out-of-order older event must NOT displace the winner
      input.addData(Event(3, ts("2024-01-01 10:30:00"), 1, "view", 9.9))
      q.processAllAvailable()
      // same ts as winner, higher event_id -> displaces (tiebreak)
      input.addData(Event(4, ts("2024-01-01 11:00:00"), 1, "view", 7.0))
      q.processAllAvailable()
      // sub-millisecond micros must survive the state roundtrip
      input.addData(Event(5, ts("2024-01-01 11:00:00.000123"), 1, "view", 5.0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT event_id, value, ts FROM latest_stream " +
          "WHERE user_id = 1 AND event_type = 'view'").collect()
      // Update mode memory sink appends each update; the LAST row is
      // the current state
      assert(rows.last.getLong(0) == 5L && rows.last.getDouble(1) == 5.0)
      assert(rows.last.getTimestamp(2) == ts("2024-01-01 11:00:00.000123"))
      // the displaced-by-tiebreak update was emitted too
      assert(rows.map(_.getLong(0)).contains(4L))
      // and it must equal the batch operator on the same data
      val batch = graft.ops.Upsert.latestByKey(
        Seq(
          (1L, ts("2024-01-01 10:00:00"), 1L, "view", 1.0),
          (2L, ts("2024-01-01 11:00:00"), 1L, "view", 2.0),
          (3L, ts("2024-01-01 10:30:00"), 1L, "view", 9.9),
          (4L, ts("2024-01-01 11:00:00"), 1L, "view", 7.0))
          .toDF("event_id", "ts", "user_id", "event_type", "value"),
        keys = Seq("user_id", "event_type"),
        versionCols = Seq("ts", "event_id"),
        payloadCols = Seq("value"))
      val b = batch.select("event_id", "value").head()
      assert(b.getLong(0) == 4L && b.getDouble(1) == 7.0)
    } finally q.stop()
  }

  test("streaming sessionize closes sessions on gap and emits them") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStream.sessionize(input.toDS(), gapMicros = 30L * 60 * 1000000)
      .writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Append).start()
    try {
      // user 10: two events 10min apart (one session), then 50min gap
      // -> second session; a later event far in the future advances
      // the watermark so timeouts fire.
      input.addData(
        Event(1, ts("2024-01-01 10:00:00"), 10, "view", 0),
        Event(2, ts("2024-01-01 10:10:00"), 10, "view", 0),
        Event(3, ts("2024-01-01 11:00:00"), 10, "view", 0))
      q.processAllAvailable()
      input.addData(Event(4, ts("2024-01-02 09:00:00"), 99, "view", 0))
      q.processAllAvailable()
      input.addData(Event(5, ts("2024-01-03 09:00:00"), 99, "view", 0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT user_id, session_id, n_events FROM sess " +
          "WHERE user_id = 10 ORDER BY session_id").collect()
      assert(rows.map(r => (r.getLong(1), r.getLong(2))).toSeq ==
        Seq((1L, 2L), (2L, 1L)))
      // a session after the timeout-closed one must continue the
      // monotonic id sequence (3), not restart at 1
      input.addData(
        Event(6, ts("2024-01-04 09:00:00"), 10, "view", 0),
        Event(7, ts("2024-01-05 09:00:00"), 99, "view", 0))
      q.processAllAvailable()
      input.addData(Event(8, ts("2024-01-06 09:00:00"), 99, "view", 0))
      q.processAllAvailable()
      val later = spark.sql(
        "SELECT session_id, n_events FROM sess " +
          "WHERE user_id = 10 ORDER BY session_id").collect()
      assert(later.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }
}
