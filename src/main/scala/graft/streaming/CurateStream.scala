package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.{Split, TextOps}

/** The COMPOSED streaming curation pipeline — gate → near-dup →
  * split wired end-to-end as ONE streaming query, the streaming twin
  * of the batch `curateCorpusV2`-lite chain (rules → LSH dedup →
  * split assignment). The stages the individual twins prove in
  * isolation (GateStreamSpec, NearDupStreamSpec) compose here:
  *
  *  1. stateless gate: Gopher rule verdicts + the hash-split
  *     assignment, pure per-row expressions fused into the ingest
  *     projection (no state, no shuffle);
  *  2. stateful near-dup: passing docs explode to MinHash-LSH band
  *     buckets; each bucket's state is one canonical (first-seen)
  *     doc id with event-time idle eviction — a later doc landing in
  *     a held bucket is flagged a near-dup of that canon. An EXACT
  *     duplicate shares every band, so exact dedup is subsumed;
  *  3. the per-doc verdict: one row per (doc, band) plus a band −1
  *     row for gate-rejected docs (which BYPASS the stateful stage —
  *     rejected docs must not claim canonical slots, matching the
  *     batch order rules-then-dedup). [[decisions]] is the stateless
  *     rollup to one decision row per doc; a doc's band rows never
  *     split across micro-batches (they come from one input row), so
  *     the rollup is exact per batch in `foreachBatch` — no third
  *     stateful stage, which Structured Streaming would in any case
  *     not finalize without a window watermark.
  *
  * State at 100 TB/day: #active band buckets × one long — identical
  * to [[NearDupStream]]; the gate adds zero state and the rollup is
  * batch-local. CurateStreamSpec proves the composition ≡ the batch
  * chain on the same micro-batched input. */
object CurateStream {

  case class Doc(doc_id: Long, ts: java.sql.Timestamp, text: String)
  // public: Catalyst's generated encoders cannot access private
  // members (SpecificSafeProjection compile failure)
  case class BandKey(band_id: Int, band_hash: Long)
  case class BandedDoc(band_id: Int, band_hash: Long,
                       doc_id: Long, ts: java.sql.Timestamp,
                       split: String)
  case class BucketState(canonId: Long, lastMicros: Long)
  /** One row per (doc, band): `dup_of` holds the bucket's canonical
    * id when the band flagged a near-dup. Gate-rejected docs emit a
    * single band −1 row with `passes = false`. */
  case class BandVerdict(doc_id: Long, passes: Boolean, band_id: Int,
                         dup_of: Option[Long], split: String)

  /** The composed stream. Output: [[BandVerdict]] rows (append mode);
    * roll up with [[decisions]] per micro-batch or over a sink. */
  def curated(docs: Dataset[Doc],
              weights: Seq[(String, Double)] =
                Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
              numHashes: Int = 64, bands: Int = 16,
              watermarkDelay: String = "10 minutes",
              idleTimeout: String = "1 hour"): Dataset[BandVerdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    import StreamTime.micros

    val gated = TextOps.gopherRulesUnsorted(docs.toDF(),
        carryCols = Seq("text", "ts"))
      .withColumn("split",
        Split.splitColumn(weights, idCol = "doc_id"))

    val rejected = gated.filter(!col("passes"))
      .select(col("doc_id"), lit(false).as("passes"),
        lit(-1).as("band_id"),
        lit(null).cast("long").as("dup_of"), col("split"))
      .as[BandVerdict]

    val banded = gated.filter(col("passes"))
      .select(col("doc_id"), col("ts"), col("split"),
        posexplode(graft.functions.TextExpressions.minhash_bands(
          TextOps.tokens(col("text")), numHashes, bands, 3)))
      .select(col("pos").cast("int").as("band_id"),
        col("col").as("band_hash"), col("doc_id"), col("ts"),
        col("split"))
      .as[BandedDoc]

    val verdicts = banded
      .withWatermark("ts", watermarkDelay)
      .groupByKey(b => BandKey(b.band_id, b.band_hash))
      .flatMapGroupsWithState[BucketState, BandVerdict](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: BandKey, batch: Iterator[BandedDoc],
         state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // min doc_id within a batch is canonical — the batch drop
            // rule, so an id-ordered replay reproduces batch output
            val arrivals = batch.toSeq.sortBy(_.doc_id)
            val last = (arrivals.map(b => micros(b.ts)) ++
              state.getOption.map(_.lastMicros)).max
            val canon = state.getOption.map(_.canonId)
              .getOrElse(arrivals.head.doc_id)
            state.update(BucketState(canon, last))
            state.setTimeoutTimestamp(last / 1000, idleTimeout)
            arrivals.iterator.map(b => BandVerdict(b.doc_id,
              passes = true, band_id = key.band_id,
              dup_of = if (b.doc_id == canon) None else Some(canon),
              split = b.split))
          }
      }

    verdicts.union(rejected)
  }

  /** Stateless per-doc rollup of [[BandVerdict]] rows: `rejected_rule`
    * when the gate failed, `near_dup` when ANY band flagged an
    * earlier canon (with the smallest such canon as `dup_of`), else
    * `kept` with the split assignment. Exact over any frame that
    * holds complete docs — every micro-batch qualifies (a doc's band
    * rows are emitted together), as does a full memory-sink table. */
  def decisions(verdicts: DataFrame): DataFrame =
    verdicts.groupBy(col("doc_id"))
      .agg(min(col("passes").cast("int")).as("p"),
        min(col("dup_of")).as("dup_of"),
        first(col("split")).as("split"))
      .select(col("doc_id"),
        when(col("p") === 0, lit("rejected_rule"))
          .when(col("dup_of").isNotNull, lit("near_dup"))
          .otherwise(lit("kept")).as("decision"),
        col("dup_of"),
        when(col("p") === 1 && col("dup_of").isNull, col("split"))
          .as("split"))
      .orderBy("doc_id")
}
