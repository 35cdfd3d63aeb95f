package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming mirror of the events pipeline (SURVEY §2.8
  * notes the reference is batch-only; this is the §7 extension).
  *
  * The transforms are source-agnostic: feed them any streaming
  * DataFrame with the events schema (event_id, ts, user_id,
  * event_type, value) — Kafka, file source, or MemoryStream in tests.
  * Batch DataFrames run through them unchanged (same Catalyst plans),
  * which is how the oracle checks the semantics.
  *
  * Scale notes: watermark + windowed aggregation keeps state bounded
  * (late events beyond the watermark are dropped, window state is
  * evicted on watermark advance); `approx_count_distinct` instead of
  * exact distinct — exact per-key distinct state is unbounded on an
  * infinite stream. Sessionization uses per-key GroupState with an
  * event-time timeout so idle users' state is reclaimed.
  */
object EventStream {

  /** Tumbling-window engagement per event type (streaming twin of
    * Present.weeklyEngagement). `startTime` defaults to "4 days" so
    * the default 7-day windows align to ISO Monday like the batch
    * twin's `date_trunc('week')` — `window()` alone is epoch-aligned,
    * and 1970-01-01 was a Thursday. */
  def windowedEngagement(events: DataFrame,
                         windowLen: String = "7 days",
                         watermarkDelay: String = "1 day",
                         startTime: Option[String] = None): DataFrame = {
    val offset = startTime.getOrElse(
      if (windowLen == "7 days") "4 days" else "0 seconds")
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLen, windowLen, offset),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        approx_count_distinct("user_id").as("approx_users"),
        max(col("value")).as("max_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n_events"),
        col("approx_users"), col("max_value"))
  }

  /** Streaming exact dedup: drop repeats of the same key seen within
    * the watermark horizon (`dropDuplicatesWithinWatermark` keeps
    * state only until the watermark passes — bounded, unlike plain
    * streaming dropDuplicates whose state grows forever). The
    * streaming twin of ops.Dedup.exactByHash for event streams. */
  def dedupWithinWatermark(events: DataFrame,
                           keys: Seq[String],
                           watermarkDelay: String = "1 hour",
                           eventTimeCol: String = "ts"): DataFrame =
    events
      .withWatermark(eventTimeCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  case class Event(event_id: Long, ts: java.sql.Timestamp,
                   user_id: Long, event_type: String, value: Double)
  case class LatestState(tsMicros: Long, eventId: Long, value: Double)
  case class LatestOut(user_id: Long, event_type: String,
                       ts: java.sql.Timestamp, event_id: Long,
                       value: Double)

  /** Streaming SCD-1 — the stream twin of ops.Upsert.latestByKey:
    * maintain the latest (max (ts, event_id)) row per
    * (user_id, event_type) and re-emit it whenever it changes
    * (Update mode). State is O(1) per key — a version tuple and the
    * payload — and out-of-order arrivals of ANY lateness (no
    * watermark; NoTimeout state) cannot regress the winner because
    * the comparison is on the SAME (version, tiebreak) order the
    * batch operator uses. Keys live forever by design: the latest
    * value per key IS the product. */
  def latestByKeyStream(events: Dataset[Event]): Dataset[LatestOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(e => (e.user_id, e.event_type))
      .mapGroupsWithState[LatestState, LatestOut](
        GroupStateTimeout.NoTimeout) {
        case ((userId, eventType), batch, state) =>
          val candidates = batch.map(e =>
            LatestState(StreamTime.micros(e.ts), e.event_id, e.value)) ++
            state.getOption.iterator
          val best = candidates.maxBy(s => (s.tsMicros, s.eventId))
          state.update(best)
          LatestOut(userId, eventType,
            StreamTime.toTimestamp(best.tsMicros),
            best.eventId, best.value)
      }
  }
  case class SessionState(sessionId: Long, nEvents: Long,
                          startMicros: Long, lastMicros: Long)
  case class SessionOut(user_id: Long, session_id: Long, n_events: Long,
                        session_start: java.sql.Timestamp,
                        session_end: java.sql.Timestamp)

  /** Stateful gap-based sessionization (streaming twin of
    * ops.Sessions.sessionize): a session closes after `gapMicros` of
    * inactivity and is emitted once closed. State per active user is
    * O(1); the timeout reclaims it. */
  def sessionize(events: Dataset[Event],
                 gapMicros: Long = 30L * 60 * 1000000): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    import StreamTime.micros

    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event],
         state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // idle user: close and emit the open session. Keep a
            // counter-only sentinel (nEvents = 0) instead of removing
            // state, so the next session continues the monotonic id
            // sequence — matching the batch twin; a removed state
            // would restart at 1 and collide (user_id, session_id)
            // keys downstream. Sentinel cost: a few longs per user.
            val s = state.get
            state.update(s.copy(nEvents = 0))
            Iterator(SessionOut(userId, s.sessionId, s.nEvents,
              new java.sql.Timestamp(s.startMicros / 1000),
              new java.sql.Timestamp(s.lastMicros / 1000)))
          } else {
            val sorted = batch.toSeq.sortBy(e => (micros(e.ts), e.event_id))
            var closed = List.empty[SessionOut]
            // nEvents == 0 sentinel = no open session, counter only
            var cur = state.getOption.filter(_.nEvents > 0)
            var lastClosedId = state.getOption.map(_.sessionId).getOrElse(0L)
            sorted.foreach { e =>
              val t = micros(e.ts)
              cur match {
                case Some(s) if t - s.lastMicros <= gapMicros =>
                  cur = Some(s.copy(nEvents = s.nEvents + 1, lastMicros = t))
                case Some(s) =>
                  closed ::= SessionOut(userId, s.sessionId, s.nEvents,
                    new java.sql.Timestamp(s.startMicros / 1000),
                    new java.sql.Timestamp(s.lastMicros / 1000))
                  cur = Some(SessionState(s.sessionId + 1, 1, t, t))
                case None =>
                  cur = Some(SessionState(lastClosedId + 1, 1, t, t))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(
                s.lastMicros / 1000 + gapMicros / 1000, "1 minute")
            }
            closed.reverseIterator
          }
      }
  }
}
