package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.Tables
import graft.ops.Entity

/** q192's input shape (orders with key-derived field nulls) —
  * timestamps stay TIMESTAMP_NTZ end to end (LocalDateTime encoder ≡
  * the parquet read), so stream and batch frames compare exactly. */
case class GoldenRec(o_custkey: Long, ts: java.time.LocalDateTime,
                     rid: Long, priority: Option[String],
                     status: Option[String], amount: Option[Double])

class GoldenRecordStreamSpec extends SparkSpec {
  import spark.implicits._

  private val fields = Seq("priority", "status", "amount")

  /** The q192 registry over REAL testdata (SparkEntry.scala q192):
    * every 3rd priority / 4th status / 5th amount is null, so
    * survivorship genuinely has to reach past fresher-but-null
    * records into staler ones. */
  private def records = Tables.orders(spark, "/root/testdata/sf0.001")
    .select(
      col("o_custkey"), col("o_orderdate").as("ts"),
      col("o_orderkey").as("rid"),
      when(col("o_orderkey") % 3 === 0, lit(null))
        .otherwise(col("o_orderpriority")).as("priority"),
      when(col("o_orderkey") % 4 === 0, lit(null))
        .otherwise(col("o_orderstatus")).as("status"),
      when(col("o_orderkey") % 5 === 0, lit(null))
        .otherwise(col("o_totalprice")).as("amount"))

  test("stream-fed compaction ≡ batch goldenRecord on split real testdata") {
    implicit val sqlCtx = spark.sqlContext
    val all = records.as[GoldenRec].collect().toSeq
    assert(all.size == 1500)

    val base = Files.createTempDirectory("graft_golden_stream").toString
    // stored base state over the first third (the pre-stream history)
    val (hist, live) = all.splitAt(500)
    Entity.goldenPartial(spark.createDataset(hist).toDF(),
        "o_custkey", "ts", "rid", fields)
      .write.parquet(s"$base/state_base")

    val input = MemoryStream[GoldenRec]
    val q = GoldenRecordStream.start(input.toDF(), s"$base/shards",
      Files.createTempDirectory("graft_golden_ckpt").toString,
      "o_custkey", "ts", "rid", fields)
    try {
      val (b1, b2) = live.splitAt(650)
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    // one partial shard per non-empty micro-batch
    val shardDirs = new java.io.File(s"$base/shards").listFiles()
      .filter(_.getName.startsWith("batch_")).map(_.getName).sorted
    assert(shardDirs.length == 2, shardDirs.mkString(","))

    GoldenRecordStream.compact(spark, Some(s"$base/state_base"),
      s"$base/shards", s"$base/state_v2", "o_custkey", fields)
    val served = GoldenRecordStream.golden(spark, s"$base/state_v2",
      "o_custkey", fields)
    val oneShot = Entity.goldenRecord(
      spark.createDataset(all).toDF(), "o_custkey", "ts", "rid", fields)

    // schema AND rows bit-identical (survivorship is pure selection —
    // the double `amount` field must compare exactly, no tolerance)
    // parquet roundtrips drop non-null flags — names and types are
    // the contract
    assert(served.schema.map(f => (f.name, f.dataType)) ==
      oneShot.schema.map(f => (f.name, f.dataType)),
      s"${served.schema} vs ${oneShot.schema}")
    val s = served.collect().map(_.toSeq.map(String.valueOf)).toSeq
    val o = oneShot.collect().map(_.toSeq.map(String.valueOf)).toSeq
    assert(s == o)

    // compacted state is RE-MERGEABLE: merging it with itself keeps
    // every survivor (idempotent per field; n_records doubles — the
    // count is the one additive column, which is why a retried batch
    // must overwrite its shard rather than append)
    val st = spark.read.parquet(s"$base/state_v2")
    val twice = Entity.finishGolden(
      Entity.mergeGoldenPartials(Seq(st, st), "o_custkey", fields),
      "o_custkey", fields)
    val t = twice.drop("n_records").collect()
      .map(_.toSeq.map(String.valueOf)).toSeq
    assert(t == served.drop("n_records").collect()
      .map(_.toSeq.map(String.valueOf)).toSeq)

    val ex = intercept[IllegalArgumentException] {
      GoldenRecordStream.compact(spark, None, s"$base/none",
        s"$base/s2", "o_custkey", fields)
    }
    assert(ex.getMessage.contains("no shards"))
  }
}
