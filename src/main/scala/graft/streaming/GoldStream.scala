package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.Incremental

/** Continuous Gold-table maintenance — the streaming twin of
  * [[Incremental]] (the q188 pipeline), by the same structural
  * argument as [[IndexIngestStream]]: every micro-batch reduces to
  * its OWN partial-aggregate shard (`shards/batch_<id>`), and a
  * periodic [[compact]] merges the stored base plus accumulated
  * shards into the serving Gold. The batch operator IS the sink
  * (`foreachBatch` → [[Incremental.partialAggregate]]), so
  * stream ≡ batch needs no separate streaming aggregation semantics
  * — and because merge is associative/commutative, HOW the input was
  * micro-batched cannot change the compacted result.
  *
  * Delivery contract (the IndexIngestStream one): shard paths are
  * keyed by `batchId` and written `mode(overwrite)`, so a batch
  * retried after a crash replaces its own shard instead of
  * double-counting — exactly-once at the Gold level without a
  * transactional table format. Contrast with the built-in streaming
  * aggregation (`groupBy.agg` in Update mode, the
  * [[SketchStream]]/[[EventStream]] family): that needs key state in
  * the store and a sink that can upsert; this shape keeps state in
  * cheap immutable files and defers combination to a metadata-only
  * merge — the right trade when keys are many (a Gold table) and
  * reads tolerate compaction lag, with merge-on-read available in
  * between (pass the base and shards straight to
  * [[Incremental.merge]]).
  *
  * At warehouse scale: each shard write shuffles only its
  * micro-batch (partial aggregation collapses it map-side first);
  * compaction moves |keys|-sized aggregate rows, never raw history
  * — the q188 refresh argument, continuously. */
object GoldStream {

  /** Reduce each micro-batch to a partial-aggregate shard under
    * `shardsRoot/batch_<batchId>`. */
  def start(rows: DataFrame, shardsRoot: String, checkpointDir: String,
            keys: Seq[String], sumCols: Seq[String],
            minCols: Seq[String] = Nil, maxCols: Seq[String] = Nil,
            countCol: String = "n_rows"): StreamingQuery =
    rows.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        if (!batch.isEmpty) {
          Incremental.partialAggregate(batch.toDF(), keys,
            sumCols, minCols, maxCols, countCol)
            .write.mode("overwrite")
            .parquet(f"$shardsRoot/batch_$batchId%05d")
        }
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** Merge the stored base Gold (if any) and every streamed shard
    * into `outDir` — the serving Gold. Same FileSystem-API shard
    * discovery and loud empty-shards contract as
    * [[IndexIngestStream.compact]]. */
  def compact(spark: SparkSession, baseGold: Option[String],
              shardsRoot: String, outDir: String,
              keys: Seq[String], sumCols: Seq[String],
              minCols: Seq[String] = Nil, maxCols: Seq[String] = Nil,
              countCol: String = "n_rows"): Unit = {
    val root = new Path(shardsRoot)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val shards = Option(fs.globStatus(new Path(root, "batch_*")))
      .map(_.toSeq).getOrElse(Seq.empty)
      .map(_.getPath.toString).sorted
    require(shards.nonEmpty, s"no shards under $shardsRoot")
    val parts = (baseGold.toSeq ++ shards).map(spark.read.parquet(_))
    Incremental.merge(parts, keys, sumCols, minCols, maxCols, countCol)
      .write.mode("overwrite").parquet(outDir)
  }
}
