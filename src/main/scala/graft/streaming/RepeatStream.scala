package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.etl.GoldState

/** Streaming maintenance of the ORDER-DEPENDENT flagship metric —
  * the monthly repeat-customer rate (LAG + 30-day rule), the one
  * Gold table [[GoldStream]]'s order-free shard discipline cannot
  * serve. The r9 design insight carries over unchanged: LAG's
  * cross-history dependence collapses to ONE carry row per user
  * (their last confirmed booking so far — `user_last`), so a
  * micro-batch can flag its rows exactly as the full-history window
  * would, given the carry built from every earlier batch.
  *
  * Per micro-batch (inside `foreachBatch`, batches arrive in
  * batchId order):
  *  1. read the latest `user_last` state older than this batch
  *     (strictly `< batchId` — a RETRIED batch must not see its own
  *     half-written state) and turn it into LAG carry rows;
  *  2. write this batch's repeat-flags partial as an own shard
  *     (`repeat_shards/batch_<id>`, overwrite-keyed: exactly-once);
  *  3. write the merged `user_last/batch_<id>` — the next batch's
  *     carry.
  * Serving merges the flag shards (max per (month, user) — the same
  * mergeable max the batch fold uses) and derives the Gold table.
  *
  * ORDER CONTRACT (the price of streaming an order-dependent fold —
  * same as `runIncrementalWindow`'s monotonic-append gate): each
  * batch's rows must sort strictly after every earlier batch's rows
  * per user, i.e. feed the stream in (booking_date, booking_id)
  * period order. A same-month split across two batches is fine —
  * the carry hands the LAG across the boundary and the flag shards
  * max-merge.
  *
  * Scale: a shard write shuffles only its micro-batch (collapsed
  * map-side to (month, user) grain); `user_last` state is one row
  * per user ever seen; serving moves aggregate rows, never raw
  * history. */
object RepeatStream {

  private def shardsDir(stateRoot: String) = s"$stateRoot/repeat_shards"
  private def userLastDir(stateRoot: String) = s"$stateRoot/user_last"

  private def listBatches(spark: SparkSession, dir: String): Seq[String] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Option(fs.globStatus(new Path(root, "batch_*")))
      .map(_.toSeq).getOrElse(Seq.empty).map(_.getPath.toString).sorted
  }

  /** The newest `user_last` state written by a batch with id strictly
    * below `batchId` (None before the first batch). */
  private def prevUserLast(spark: SparkSession, stateRoot: String,
                           batchId: Long): Option[DataFrame] =
    listBatches(spark, userLastDir(stateRoot))
      .filter(_.split("batch_").last.toLong < batchId)
      .lastOption.map(spark.read.parquet(_))

  /** Start the stream over curated booking rows (needs user_id,
    * booking_id, booking_date, booking_status). */
  def start(curatedRows: DataFrame, stateRoot: String,
            checkpointDir: String): StreamingQuery =
    curatedRows.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val prev = prevUserLast(spark, stateRoot, batchId)
          val carry = prev.map(GoldState.carryFromState)
          GoldState.repeatFlagsPartial(batch.toDF(), carry)
            .write.mode("overwrite")
            .parquet(f"${shardsDir(stateRoot)}/batch_$batchId%05d")
          GoldState.userLast
            .merge(prev.toSeq :+ GoldState.userLastPartial(batch.toDF()))
            .write.mode("overwrite")
            .parquet(f"${userLastDir(stateRoot)}/batch_$batchId%05d")
        }
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** The serving Gold table from everything streamed so far —
    * bit-identical to `Present.monthlyRepeatRate` over the union of
    * all batches (RepeatStreamSpec proves it on split real
    * testdata). */
  def repeatGold(spark: SparkSession, stateRoot: String): DataFrame = {
    val shards = listBatches(spark, shardsDir(stateRoot))
    require(shards.nonEmpty, s"no shards under ${shardsDir(stateRoot)}")
    GoldState.repeatGold(
      GoldState.repeatFlags.merge(shards.map(spark.read.parquet(_))))
  }
}
