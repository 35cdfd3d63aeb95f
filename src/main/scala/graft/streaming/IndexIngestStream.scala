package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.TextOps

/** Continuous BM25 index maintenance — the streaming twin of the
  * shard-wise index build + [[TextOps.mergeInvertedIndexes]]
  * compaction (the q99 pipeline): every micro-batch of new documents
  * is indexed into its OWN shard (`shards/batch_<id>`), and a
  * periodic [[compact]] merges the base index plus accumulated
  * shards into the serving index [[TextOps.bm25FromIndex]] reads.
  * The batch operator IS the sink (`foreachBatch`), so the
  * stream ≡ batch equivalence is structural — the same argument
  * [[AnnIngestStream]] makes for the IVF index.
  *
  * Delivery contract: STRONGER than the ANN append path. The shard
  * path is keyed by `batchId` and [[TextOps.buildInvertedIndex]]
  * writes `mode(overwrite)`, so a batch retried after a crash
  * overwrites its own shard instead of appending a duplicate —
  * exactly-once at the index level with no transactional table
  * format needed. Because [[TextOps.bm25FromIndex]] derives df from
  * postings at query time and [[TextOps.mergeInvertedIndexes]]
  * checks the disjoint-doc-span invariant, querying the compacted
  * index is BIT-IDENTICAL to querying one index built over the whole
  * corpus (IndexIngestStreamSpec proves it against the
  * [[TextOps.bm25Search]] scan).
  *
  * At warehouse scale this is the standard ingest shape: ingest
  * shards index themselves as they land (each shard build tokenizes
  * only its own docs), queries before compaction can merge-on-read,
  * and the nightly compaction is the metadata-only union q99
  * measures — no corpus rescan, ever. */
object IndexIngestStream {

  case class Doc(doc_id: Long, text: String)

  /** Index each micro-batch into `shardsRoot/batch_<batchId>`. */
  def start(docs: Dataset[Doc], shardsRoot: String,
            checkpointDir: String): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: Dataset[Doc], batchId: Long) =>
        if (!batch.isEmpty) {
          TextOps.buildInvertedIndex(
            batch.toDF(), f"$shardsRoot/batch_$batchId%05d")
        }
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** Merge the base index (if any) and every streamed shard under
    * `shardsRoot` into `outDir` — the serving index. Shard discovery
    * goes through the Hadoop FileSystem API so it works on any
    * warehouse store, and the merge itself enforces the
    * disjoint-doc-span invariant. */
  def compact(spark: SparkSession, baseIndex: Option[String],
              shardsRoot: String, outDir: String): Unit = {
    val root = new Path(shardsRoot)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // globStatus returns null (not empty) when the root is absent
    val shards = Option(fs.globStatus(new Path(root, "batch_*")))
      .map(_.toSeq).getOrElse(Seq.empty)
      .map(_.getPath.toString).sorted
    require(shards.nonEmpty, s"no shards under $shardsRoot")
    TextOps.mergeInvertedIndexes(spark, baseIndex.toSeq ++ shards, outDir)
  }
}
