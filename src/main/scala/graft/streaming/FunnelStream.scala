package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import EventStream.Event

/** Streaming twin of [[graft.ops.Analytics.funnelPaths]] — the
  * complex-event-processing shape: a per-user state machine tracking
  * every open funnel chain, advancing chains as later-stage events
  * arrive in order, and finalizing each stage-0 event EXACTLY once —
  * either the moment its chain completes / provably dies (a later
  * event shows the cap window closed) or when the event-time
  * watermark passes its last open deadline (event-time timeout).
  *
  * Chains share events exactly like the batch operator: one click is
  * the "first click" of every open view that precedes it in its cap
  * window (state keeps each chain independently), and a chain
  * advances only on the FIRST qualifying later-stage event — arrival
  * order per user IS (ts, id) order under the ordering contract, so
  * "first seen" ≡ the batch argmin.
  *
  * State per user is the OPEN chains only: completed and dead chains
  * emit and leave immediately; a view older than `maxGap` with no
  * click (or a clicked chain past its purchase window) dies on the
  * next event arrival or watermark advance. State is therefore
  * bounded by the user's event arrivals inside one cap window — the
  * same O(horizon) argument as the attribution join, enforced here
  * with explicit timeouts.
  *
  * Ordering contract (the FeatureStream discipline): a user's events
  * must not regress in (ts, id) across micro-batches; within a batch
  * they are sorted. The watermark drives ONLY finalization of still-
  * open chains, never matching. */
object FunnelStream {

  /** One open chain: the stage-0 anchor plus however far it got.
    * `ids`/`tsUs` are per-stage (index 0 = stage 0). */
  case class Chain(ids: List[Long], tsUs: List[Long])
  case class FunnelState(chains: List[Chain])
  case class FunnelOut(user_id: Long, s0_id: Long,
                       s0_ts: java.sql.Timestamp,
                       s1_id: Option[Long], s2_id: Option[Long],
                       completed_stages: Long)

  def funnelStream(events: Dataset[Event], stages: Seq[String],
                   maxGap: String,
                   watermarkDelay: String = "1 day"): Dataset[FunnelOut] = {
    require(stages.size == 3, "streaming twin covers 3-stage funnels")
    require(stages.distinct.size == stages.size,
      "stages must be distinct event types (indexOf drives matching)")
    val gapUs: Long = {
      // parse "N days"/"N hours" the same way the batch INTERVAL does
      val parts = maxGap.trim.split("\\s+")
      require(parts.length == 2, s"maxGap must be '<n> <unit>': $maxGap")
      val n = parts(0).toLong
      parts(1).toLowerCase match {
        case "day" | "days"       => n * 86400000000L
        case "hour" | "hours"     => n * 3600000000L
        case "minute" | "minutes" => n * 60000000L
        case "second" | "seconds" => n * 1000000L
        case u => throw new IllegalArgumentException(s"unit: $u")
      }
    }
    val spark = events.sparkSession
    import spark.implicits._

    def out(userId: Long, c: Chain): FunnelOut = FunnelOut(
      userId, c.ids.head, StreamTime.toTimestamp(c.tsUs.head),
      c.ids.lift(1), c.ids.lift(2), c.ids.size.toLong)
    def deadline(c: Chain): Long = c.tsUs.last + gapUs
    // a chain is DEAD once time passes its open deadline: no future
    // event (all ≥ now) can extend it
    def reap(chains: List[Chain], nowUs: Long): (List[Chain], List[Chain]) =
      chains.partition(c => deadline(c) >= nowUs)

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event],
         state: GroupState[FunnelState]) =>
          val emitted = scala.collection.mutable.ListBuffer.empty[FunnelOut]
          var chains = state.getOption.map(_.chains).getOrElse(Nil)
          if (state.hasTimedOut) {
            val wm = state.getCurrentWatermarkMs() * 1000L
            val (alive, dead) = reap(chains, wm + 1)
            dead.foreach(c => emitted += out(userId, c))
            chains = alive
          } else {
            val sorted = batch.toSeq
              .sortBy(e => (StreamTime.micros(e.ts), e.event_id))
            sorted.foreach { e =>
              val t = StreamTime.micros(e.ts)
              // events strictly past a chain's window close it first
              val (alive, dead) = reap(chains, t)
              dead.foreach(c => emitted += out(userId, c))
              chains = alive
              if (e.event_type == stages(0)) {
                chains = chains :+ Chain(List(e.event_id), List(t))
              } else {
                val stageIdx = stages.indexOf(e.event_type)
                if (stageIdx > 0) {
                  chains = chains.map { c =>
                    // first qualifying arrival advances the chain:
                    // strictly after the anchor, inside its window
                    if (c.ids.size == stageIdx && t > c.tsUs.last &&
                      t <= c.tsUs.last + gapUs)
                      Chain(c.ids :+ e.event_id, c.tsUs :+ t)
                    else c
                  }
                  val (done, open) =
                    chains.partition(_.ids.size == stages.size)
                  done.foreach(c => emitted += out(userId, c))
                  chains = open
                }
              }
            }
          }
          if (chains.isEmpty) state.remove()
          else {
            state.update(FunnelState(chains))
            // fire when the watermark passes the EARLIEST open
            // deadline; remaining chains re-arm on that firing
            state.setTimeoutTimestamp(
              chains.map(deadline).min / 1000L + 1L)
          }
          emitted.iterator
      }
  }
}
