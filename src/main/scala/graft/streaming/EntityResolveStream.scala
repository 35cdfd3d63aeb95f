package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.Entity

/** Continuous entity resolution — the streaming twin of
  * [[Entity.entityResolve]] (q146), completing the survivorship
  * family next to [[GoldenRecordStream]]: arriving registry records
  * reduce per micro-batch to a NAME-PARTIAL shard
  * ([[Entity.namePartial]] — per distinct name, min rid + record
  * count; min and sum are associative/commutative, so partials from
  * any batching merge into the same state), and a periodic
  * [[compact]] re-runs the NAME-GRAPH resolution (deletion-key
  * blocking → levenshtein verify → connected components) over the
  * merged distinct names and publishes the serving name→entity map.
  *
  * Why re-resolve instead of folding the graph: new names can BRIDGE
  * existing entities (a dirty variant 1 edit from each of two
  * previously-separate names merges them), so the name map is not
  * per-key mergeable the way Gold partials are — but the re-run is
  * over u = |distinct names| nodes, never records, and distinct
  * names are the heavy-tail-collapsed small side (the
  * duplication-collapse argument in [[Entity]]: ~600 names for 40k
  * records at sf0.1). Record attachment stays read-time
  * ([[resolve]]) — one hash join against the names-sized map. For
  * graphs where even names are huge, the edge stream composes with
  * [[ComponentStream]]'s incremental contraction instead.
  *
  * Delivery contract (the family's): batchId-keyed `mode(overwrite)`
  * shards — a retried batch replaces its own partial, so `cnt` never
  * double-counts; exactly-once without a transactional format. */
object EntityResolveStream {

  /** Reduce each micro-batch of (rid, name, src) records to a
    * name-partial shard under `shardsRoot/batch_<batchId>`. */
  def start(records: DataFrame, shardsRoot: String,
            checkpointDir: String): StreamingQuery =
    records.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        if (!batch.isEmpty) {
          Entity.namePartial(batch.toDF())
            .write.mode("overwrite")
            .parquet(f"$shardsRoot/batch_$batchId%05d")
        }
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** Merge the stored name partials (if any) with every shard into
    * `outDir/names` (re-mergeable state — the next compaction's
    * base), then re-run the name-graph resolution and publish
    * `outDir/name_map` (the serving name→entity map).
    * `baseNames == s"$outDir/names"` is explicitly supported: the
    * merge lands in a staging dir first and is then copied over
    * (Spark refuses a direct overwrite of a path it is reading). */
  def compact(spark: SparkSession, baseNames: Option[String],
              shardsRoot: String, outDir: String, maxEdit: Int = 1,
              blockDfCap: Int = Int.MaxValue): Unit = {
    val root = new Path(shardsRoot)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val shards = Option(fs.globStatus(new Path(root, "batch_*")))
      .map(_.toSeq).getOrElse(Seq.empty)
      .map(_.getPath.toString).sorted
    require(shards.nonEmpty, s"no shards under $shardsRoot")
    val parts = (baseNames.toSeq ++ shards).map(spark.read.parquet(_))
    val staging = s"$outDir/names.__staging"
    Entity.mergeNamePartials(parts)
      .write.mode("overwrite").parquet(staging)
    spark.read.parquet(staging).write.mode("overwrite")
      .parquet(s"$outDir/names")
    fs.delete(new Path(staging), true): Unit
    Entity.nameEntityMap(spark.read.parquet(s"$outDir/names"),
        maxEdit, blockDfCap)
      .write.mode("overwrite").parquet(s"$outDir/name_map")
  }

  /** Resolve records against the compacted serving map — bit-equal
    * to [[Entity.entityResolve]] over everything ever streamed
    * (EntityResolveStreamSpec proves it on split real testdata). */
  def resolve(spark: SparkSession, outDir: String,
              records: DataFrame): DataFrame =
    Entity.attachByName(records,
      spark.read.parquet(s"$outDir/name_map"))
}
