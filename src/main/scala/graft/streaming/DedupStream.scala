package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact dedup — the streaming twin of
  * `ops.Dedup.exactByHash` and the stateful core of
  * `ops.Bloom.dedupAgainstCorpus`'s within-shard rule: admit a
  * document iff its content hash has not been seen inside the state
  * horizon; within one micro-batch the smallest doc_id is canonical
  * (the batch drop rule, so an id-ordered replay reproduces batch
  * output exactly — DedupStreamSpec).
  *
  * State per distinct content hash is ONE long (the canonical id),
  * reclaimed by event-time timeout when the hash goes idle — memory
  * tracks the distinct-content rate of the horizon, not the stream
  * length. A duplicate flood of one text costs one state entry
  * (arbitrarily many arrivals die against it), the streaming analog
  * of the batch min-per-md5 window.
  *
  * Spark's built-in `dropDuplicates` on streams keeps ALL keys until
  * watermark expiry with last-writer semantics per batch; this
  * operator exists to pin the batch-identical MIN-id rule and the
  * explicit idle-eviction policy.
  */
object DedupStream {

  case class Doc(doc_id: Long, ts: java.sql.Timestamp, text: String)
  case class Keyed(text_hash: String, doc_id: Long,
                   ts: java.sql.Timestamp)
  case class SeenState(canonId: Long, lastMicros: Long)
  case class Admitted(doc_id: Long, text_hash: String)

  /** Admit first-seen documents; drop duplicates of anything inside
    * the state horizon. */
  def admitted(docs: Dataset[Doc],
               watermarkDelay: String = "10 minutes",
               idleTimeout: String = "1 hour"): Dataset[Admitted] = {
    val spark = docs.sparkSession
    import spark.implicits._
    import StreamTime.micros

    docs.toDF()
      .select(md5(col("text")).as("text_hash"), col("doc_id"), col("ts"))
      .as[Keyed]
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.text_hash)
      .flatMapGroupsWithState[SeenState, Admitted](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, batch: Iterator[Keyed],
         state: GroupState[SeenState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val arrivals = batch.toSeq.sortBy(_.doc_id)
            // out-of-order batches inside the watermark must never
            // move the timeout backwards (same rule as NearDupStream)
            val last = (arrivals.map(k => micros(k.ts)) ++
              state.getOption.map(_.lastMicros)).max
            val prior = state.getOption.map(_.canonId)
            val canon = prior.getOrElse(arrivals.head.doc_id)
            state.update(SeenState(canon, last))
            state.setTimeoutTimestamp(last / 1000, idleTimeout)
            // a hash already seen admits nothing; a new hash admits
            // exactly its batch-minimum id
            if (prior.isDefined) Iterator.empty
            else Iterator.single(Admitted(canon, key))
          }
      }
  }
}
