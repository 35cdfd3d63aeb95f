package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.TextOps

/** Streaming MinHash-LSH near-dup candidate detection — the streaming
  * twin of ops.Dedup.minHashCandidates for a document firehose
  * (training-data ingestion: flag near-dups of anything seen in the
  * recent horizon without a batch recompute).
  *
  * Shape: per incoming doc, ONE codegen'd expression computes the
  * banded MinHash signature (same functions.MinHashBands pipeline as
  * batch — identical band hashes, so batch and stream agree on
  * candidates); docs explode to (band_id, band_hash) keyed state; each
  * bucket's state is ONLY the canonical (first-seen) doc id — O(1) per
  * bucket, reclaimed by event-time timeout when the bucket goes idle.
  * A later doc hashing into a held bucket emits a (doc_id, canon_id)
  * candidate pair.
  *
  * Emitted pairs are CANDIDATES (one per matching band — downstream
  * dedups pairs and runs exact verification, exactly like the batch
  * `jaccardVerify`; Jaccard needs both token sets, which is a join,
  * not stream state). The stream stage's job is recall with bounded
  * state, not precision.
  */
object NearDupStream {

  case class Doc(doc_id: Long, ts: java.sql.Timestamp, text: String)
  case class BandKey(band_id: Int, band_hash: Long)
  case class Banded(band_id: Int, band_hash: Long, doc_id: Long,
                    ts: java.sql.Timestamp)
  case class BucketState(canonId: Long, lastMicros: Long)
  case class CandidatePair(doc_id: Long, canon_id: Long, band_id: Int)

  /** Explode a doc stream to its LSH band keys (columnar — the
    * signature is computed once per doc by the codegen'd expression,
    * before the explode). */
  def banded(docs: Dataset[Doc], numHashes: Int = 64,
             bands: Int = 16): Dataset[Banded] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.toDF()
      .select(col("doc_id"), col("ts"),
        posexplode(graft.functions.TextExpressions.minhash_bands(
          TextOps.tokens(col("text")), numHashes, bands, 3)))
      .select(col("pos").cast("int").as("band_id"),
        col("col").as("band_hash"), col("doc_id"), col("ts"))
      .as[Banded]
  }

  /** Stateful candidate emission. State per (band_id, band_hash)
    * bucket = the canonical doc id (first seen, min doc_id within a
    * batch for determinism); evicted after `idleTimeout` of event-time
    * inactivity — the streaming analog of the batch maxBucket cap:
    * memory stays proportional to the ACTIVE bucket set, and a
    * boilerplate band that floods one bucket costs one long, not a
    * quadratic pair set (every flood doc pairs against the one
    * canonical id — the same star-pair shape as batch). */
  def candidatePairs(docs: Dataset[Doc], numHashes: Int = 64,
                     bands: Int = 16, watermarkDelay: String = "10 minutes",
                     idleTimeout: String = "1 hour"): Dataset[CandidatePair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    import StreamTime.micros

    banded(docs, numHashes, bands)
      .withWatermark("ts", watermarkDelay)
      .groupByKey(b => BandKey(b.band_id, b.band_hash))
      .flatMapGroupsWithState[BucketState, CandidatePair](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: BandKey, batch: Iterator[Banded],
         state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val docsSorted = batch.toSeq.sortBy(_.doc_id)
            // max over batch AND prior state: an in-watermark
            // out-of-order batch must never move the timeout backwards
            // (earlier eviction would silently drop the canonical doc)
            val last = (docsSorted.map(b => micros(b.ts)) ++
              state.getOption.map(_.lastMicros)).max
            val canon = state.getOption.map(_.canonId)
              .getOrElse(docsSorted.head.doc_id)
            state.update(BucketState(canon, last))
            // evict once the watermark passes last activity + idle
            state.setTimeoutTimestamp(last / 1000, idleTimeout)
            docsSorted.iterator
              .filter(_.doc_id != canon)
              .map(b => CandidatePair(b.doc_id, canon, key.band_id))
          }
      }
  }
}
