package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.Components

/** Continuous near-dup-graph maintenance — the streaming twin of
  * [[Components.incrementalComponents]] (q190), closing the
  * maintenance trio next to [[GoldStream]] (aggregates) and
  * [[IndexIngestStream]] (indexes): candidate edges stream in (e.g.
  * from [[NearDupStream]]'s verified pairs), each micro-batch lands
  * as its OWN immutable edge shard, and a periodic [[compact]] folds
  * base labels ⊕ all shards into the serving labeling with ONE
  * incremental contraction.
  *
  * Same delivery contract as the siblings: batchId-keyed
  * `mode(overwrite)` shards make a retried batch replace itself —
  * and the fold is additionally IDEMPOTENT at the semantic level
  * (re-folding an already-folded edge is a no-op: the labeling
  * already connects its endpoints), so even a lost-then-replayed
  * shard cannot corrupt the labels, only waste a read. Because the
  * stored labeling is a lossless contraction (the q190 argument),
  * compaction cost is O(nodes + new edges), never O(edges ever) —
  * and the accumulated shard files can be DELETED after compaction,
  * which a full-recompute design can never do. */
object ComponentStream {

  /** Land each micro-batch of (src, dst) edges as an immutable shard
    * under `shardsRoot/batch_<batchId>`. */
  def start(edges: DataFrame, shardsRoot: String,
            checkpointDir: String): StreamingQuery =
    edges.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        if (!batch.isEmpty) {
          batch.toDF().write.mode("overwrite")
            .parquet(f"$shardsRoot/batch_$batchId%05d")
        }
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** Fold the stored labeling (if any) and every streamed edge shard
    * into `outDir` — the serving labels. One incremental contraction
    * over label-edges ∪ shard edges; with no base, a plain
    * connectedComponents over the shards. Same FileSystem shard
    * discovery and loud empty-shards contract as the siblings. */
  def compact(spark: SparkSession, baseLabels: Option[String],
              shardsRoot: String, outDir: String): Unit = {
    val root = new Path(shardsRoot)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val shards = Option(fs.globStatus(new Path(root, "batch_*")))
      .map(_.toSeq).getOrElse(Seq.empty)
      .map(_.getPath.toString).sorted
    require(shards.nonEmpty, s"no shards under $shardsRoot")
    val edges = shards.map(spark.read.parquet(_)).reduce(_ unionByName _)
    val labels = baseLabels match {
      case Some(base) =>
        Components.incrementalComponents(spark.read.parquet(base), edges)
      case None => Components.connectedComponents(edges)
    }
    labels.write.mode("overwrite").parquet(outDir)
  }
}
