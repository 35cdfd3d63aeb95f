package graft.streaming

import java.time.LocalDate

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import EventStream.Event

/** Continuous feature computation — the streaming twin of
  * [[graft.ops.Timeseries.trailingFeatures]]: per-user 7-day
  * trailing event count / max value / days-since-previous-active-day
  * maintained as keyed state and re-emitted (Update mode) whenever a
  * day bucket changes. This is the serving half of the feature-store
  * pair: the batch operator backfills the training table, the stream
  * keeps the online store current, and FeatureStreamSpec proves the
  * final emission per (user, day) equals the batch row — the same
  * stream ≡ batch argument every other twin makes.
  *
  * State per user is O(1): at most 7 day buckets (dayNum, count,
  * max) — the RANGE frame's horizon — after end-of-batch eviction,
  * plus each bucket's recency gap frozen at creation. Within a
  * micro-batch events fold in (ts, id) order and eviction is
  * deferred to the batch end, so any day touched in the batch emits
  * from a complete ring. Ordering contract: a user's DAYS must not
  * regress across micro-batches beyond the 7-day ring (the
  * watermark-style bound: a late event for an evicted day would
  * recreate the bucket with a wrong recency gap); within the ring,
  * late arrivals fold correctly because count/max are
  * order-independent. */
object FeatureStream {

  case class Bucket(dayNum: Long, n: Long, mx: Double,
                    prevGap: Option[Long])
  case class FeatState(buckets: List[Bucket])
  case class FeatOut(user_id: Long, day: java.sql.Date,
                     n_events_7d: Long, max_value_7d: Double,
                     days_since_prev: Option[Long])

  private def dayNum(t: java.sql.Timestamp): Long =
    Math.floorDiv(StreamTime.micros(t), 86_400_000_000L)

  private def toDate(d: Long): java.sql.Date =
    java.sql.Date.valueOf(LocalDate.ofEpochDay(d))

  def trailingFeaturesStream(events: Dataset[Event]): Dataset[FeatOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FeatState, FeatOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event],
         state: org.apache.spark.sql.streaming.GroupState[FeatState]) =>
          val sorted = batch.toSeq
            .sortBy(e => (StreamTime.micros(e.ts), e.event_id))
          var buckets = state.getOption.map(_.buckets).getOrElse(Nil)
          var touched = Set.empty[Long]
          sorted.foreach { e =>
            val d = dayNum(e.ts)
            touched += d
            buckets.find(_.dayNum == d) match {
              case Some(_) =>
                buckets = buckets.map(b =>
                  if (b.dayNum == d)
                    b.copy(n = b.n + 1, mx = math.max(b.mx, e.value))
                  else b)
              case None =>
                // recency gap frozen at creation — correct under the
                // non-regressing-days contract (prev = newest older
                // day still in, or just evicted from, the ring)
                val older = buckets.map(_.dayNum).filter(_ < d)
                val prev =
                  if (older.isEmpty) None else Some(d - older.max)
                buckets = (Bucket(d, 1L, e.value, prev) :: buckets)
                  .sortBy(_.dayNum)
            }
          }
          // emit BEFORE eviction so every touched day sees its full
          // trailing ring, even when a later day in the same batch
          // will push it out
          val out = touched.toList.sorted.map { d =>
            val win = buckets
              .filter(b => b.dayNum <= d && b.dayNum > d - 7)
            val self = buckets.find(_.dayNum == d).get
            FeatOut(userId, toDate(d), win.map(_.n).sum,
              win.map(_.mx).max, self.prevGap)
          }
          val maxD = buckets.map(_.dayNum).max
          state.update(FeatState(buckets.filter(_.dayNum > maxD - 7)))
          out.iterator
      }
  }
}
