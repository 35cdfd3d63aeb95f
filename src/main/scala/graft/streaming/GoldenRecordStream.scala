package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.Entity

/** Continuous golden-record maintenance — the streaming twin of
  * [[Entity.goldenRecord]] (q192), closing the last mutating family
  * without one (next to [[GoldStream]] for aggregates,
  * [[ComponentStream]] for the dedup graph and
  * [[IndexIngestStream]]/[[AnnIngestStream]] for serving indexes).
  * Arriving records reduce per micro-batch to a survivorship PARTIAL
  * shard ([[Entity.goldenPartial]] — per entity, per field, the full
  * `max(struct(ts, tie, value))` argmax state over non-null values),
  * and a periodic [[compact]] merges the stored base with all shards
  * into fresh re-mergeable state; [[golden]] projects the serving
  * table from it.
  *
  * Why partials and not finished golden rows: "latest non-null per
  * field" is NOT re-mergeable from the surviving values alone (a
  * fresher record with a null phone must lose to a staler record
  * that carried one, and the bare value no longer knows its
  * timestamp) — the struct state is, by per-field struct max, which
  * is associative and commutative. So HOW the input was
  * micro-batched cannot change the compacted result, the same
  * structural argument as [[GoldStream]].
  *
  * Delivery contract (the family's): shard paths are keyed by
  * `batchId` and written `mode(overwrite)`, so a batch retried after
  * a crash replaces its own shard instead of double-counting
  * `n_records` — exactly-once at the golden-record level without a
  * transactional table format.
  *
  * At warehouse scale: each shard write shuffles only its
  * micro-batch (the partial aggregate collapses it map-side to
  * ≤|entities| rows first); compaction moves |entities|-sized state
  * rows, never record history — and shard files are deletable after
  * compaction. */
object GoldenRecordStream {

  /** Reduce each micro-batch of records to a survivorship-partial
    * shard under `shardsRoot/batch_<batchId>`. `tieCol` must be
    * unique per record across the WHOLE stream ([[Entity
    * .goldenRecord]]'s determinism contract — the struct order must
    * be total so the value never decides). */
  def start(records: DataFrame, shardsRoot: String, checkpointDir: String,
            keyCol: String, tsCol: String, tieCol: String,
            fields: Seq[String]): StreamingQuery =
    records.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        if (!batch.isEmpty) {
          Entity.goldenPartial(batch.toDF(), keyCol, tsCol, tieCol, fields)
            .write.mode("overwrite")
            .parquet(f"$shardsRoot/batch_$batchId%05d")
        }
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** Merge the stored base partials (if any) and every streamed
    * shard into `outDir` — fresh RE-MERGEABLE state (feed it back as
    * the next compaction's base; serve reads via [[golden]]). Same
    * FileSystem shard discovery and loud empty-shards contract as
    * the siblings. `basePartials == outDir` is explicitly supported:
    * the merge lands in a staging dir first and is then copied over
    * `outDir` (Spark refuses a direct overwrite of a path it is
    * reading — the Pipeline late-rewrite roundtrip). */
  def compact(spark: SparkSession, basePartials: Option[String],
              shardsRoot: String, outDir: String,
              keyCol: String, fields: Seq[String]): Unit = {
    val root = new Path(shardsRoot)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val shards = Option(fs.globStatus(new Path(root, "batch_*")))
      .map(_.toSeq).getOrElse(Seq.empty)
      .map(_.getPath.toString).sorted
    require(shards.nonEmpty, s"no shards under $shardsRoot")
    val parts = (basePartials.toSeq ++ shards).map(spark.read.parquet(_))
    val staging = s"$outDir.__staging"
    Entity.mergeGoldenPartials(parts, keyCol, fields)
      .write.mode("overwrite").parquet(staging)
    spark.read.parquet(staging).write.mode("overwrite").parquet(outDir)
    fs.delete(new Path(staging), true): Unit
  }

  /** The serving golden table from compacted state — bit-identical to
    * [[Entity.goldenRecord]] over everything ever streamed
    * (GoldenRecordStreamSpec proves it on split real testdata). */
  def golden(spark: SparkSession, partialsDir: String,
             keyCol: String, fields: Seq[String]): DataFrame =
    Entity.finishGolden(spark.read.parquet(partialsDir), keyCol, fields)
}
