package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.ops.TextOps.packSequences]]: assign each
  * arriving document to a contiguous token-budget bin, keyed by
  * (stratum, shard). State per key is ONE long (the running token
  * total) — O(strata × shards) total, never per-document, so the
  * stream runs forever without state growth; no timeout is needed
  * because the state is a counter, not a buffer.
  *
  * Semantics: bins fill in event-time arrival order (ties broken by
  * doc_id), the same streaming-fill rule as the batch op — a document
  * whose exclusive running total has consumed the budget opens the
  * next bin. Replaying a corpus in id order therefore reproduces the
  * batch bins exactly (PackStreamSpec asserts this). */
object PackStream {

  case class Doc(doc_id: Long, ts: java.sql.Timestamp, lang: String,
                 n_tok: Long)
  case class PackState(cumTokens: Long)
  case class PackOut(lang: String, shard: Long, doc_id: Long, bin: Long,
                     n_tok: Long)

  def assignBins(docs: Dataset[Doc], budget: Long,
                 shards: Int = 4): Dataset[PackOut] = {
    require(budget > 0 && shards > 0, "budget and shards must be positive")
    val spark = docs.sparkSession
    import spark.implicits._

    docs
      .groupByKey(d => (d.lang, Math.floorMod(d.doc_id, shards.toLong)))
      .flatMapGroupsWithState[PackState, PackOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((lang, shard), batch: Iterator[Doc],
              state: GroupState[PackState]) =>
          // deterministic within-batch order: event time, then id —
          // the same tie-break discipline as the other stateful ops
          val sorted = batch.toSeq.sortBy(d => (StreamTime.micros(d.ts),
            d.doc_id))
          var cum = state.getOption.map(_.cumTokens).getOrElse(0L)
          val out = sorted.map { d =>
            val bin = cum / budget // longs, cum >= 0: floor division
            cum += d.n_tok
            PackOut(lang, shard, d.doc_id, bin, d.n_tok)
          }
          state.update(PackState(cum))
          out.iterator
      }
  }
}
