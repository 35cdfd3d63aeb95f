package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{Split, TextOps}

/** Stateless streaming ingest gate — the per-record enrichment a
  * continuously-fed corpus applies BEFORE anything stateful sees the
  * data: Gopher rule verdicts + first-failing reject reason, the
  * normalized exact-dedup key, and the train/val/test assignment.
  * Every column is a pure expression (no window, no sort, no state),
  * so the identical stage definition runs on a batch frame or an
  * unbounded stream — parity is proved in `GateStreamSpec`, the same
  * twin discipline as `PackStream`/`NearDupStream`.
  *
  * At 100 TB/day this is the map-only first hop: it fans out
  * per-partition with zero shuffles, and its outputs are exactly what
  * the downstream stateful stages key on — `DedupStream` consumes the
  * norm key, the lake partitions on the split.
  */
object GateStream {

  /** Enrich a (doc_id, text) stream: rule verdicts, reject reason,
    * `norm_key` (md5 of the normalized text — the exact-dedup key),
    * and `split`. */
  def gated(docs: DataFrame,
            weights: Seq[(String, Double)] =
              Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
            textCol: String = "text",
            idCol: String = "doc_id"): DataFrame =
    TextOps.gopherRulesUnsorted(docs, textCol = textCol, idCol = idCol,
        carryCols = Seq(textCol))
      .select(col(idCol), col("passes"), col("reject_reason"),
        md5(TextOps.normalizeText(col(textCol))).as("norm_key"),
        Split.splitColumn(weights, idCol = idCol).as("split"))
}
