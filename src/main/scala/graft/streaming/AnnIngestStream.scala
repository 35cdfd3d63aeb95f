package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.Similarity

/** Continuous ANN index maintenance — the streaming twin of
  * [[Similarity.appendToIvfIndex]]: every micro-batch of new vectors
  * is quantized by the STORED centroids and appended to its cell
  * partitions, so the serving index ([[Similarity.ivfFromIndex]])
  * stays current without ever refitting or rescanning the corpus.
  * The batch operator IS the sink (`foreachBatch`), which keeps the
  * stream ≡ batch equivalence structural: AnnIngestStreamSpec proves
  * a half-built index plus a streamed second half answers
  * brute-force-exactly at nProbe = all cells, the same argument the
  * batch append spec uses.
  *
  * Delivery contract: `foreachBatch` + parquet append is
  * exactly-once per COMMITTED batch and at-least-once across batch
  * RETRIES (a crash between the parquet write and the checkpoint
  * commit re-appends that batch). Duplicate (id, cell) rows would
  * surface as duplicate candidate ids; [[Similarity.ivfFromIndex]]'s
  * candidate `.distinct()` makes QUERY results immune, and the
  * production hardening is the standard one — write each batch under
  * a batchId-keyed path (or a transactional table format) so the
  * retry overwrites instead of appending. The quantizer itself never
  * changes mid-stream: refit is the explicit rebuild decision, as in
  * the batch contract. */
object AnnIngestStream {

  case class Vec(vec_id: Long, embedding: Seq[Float])

  def start(vectors: Dataset[Vec], indexDir: String,
            checkpointDir: String): StreamingQuery =
    vectors.writeStream
      .foreachBatch { (batch: Dataset[Vec], _: Long) =>
        if (!batch.isEmpty) {
          Similarity.appendToIvfIndex(batch.toDF(), indexDir)
        }
      }
      .option("checkpointLocation", checkpointDir)
      .start()
}
