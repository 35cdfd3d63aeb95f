package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.SparkSpec
import graft.etl.{Analog, GoldState, Present}

/** The flagship pipeline's Gold, fed by a STREAM: curated booking
  * rows arrive in micro-batches, [[GoldStream]] lands each batch as
  * a GoldState-grain partial shard, compaction merges, and
  * [[GoldState.durationGold]] derives the presentation table —
  * proven bit-identical to `Present.monthlyAvgDuration` over the
  * batch data. One metric carries the proof; the other four
  * order-free GoldState metrics are the same wiring with their own
  * (keys, sumCols). The repeat-rate family is deliberately NOT
  * streamed this way — its LAG carry needs ordered folds
  * (runIncrementalWindow) or the late-repair path. */
case class CuratedLite(booking_date: java.sql.Date,
                       checkin_date: java.sql.Date,
                       checkout_date: java.sql.Date,
                       booking_status: String)

class GoldStateStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streamed GoldState shards + compaction ≡ Present.monthlyAvgDuration") {
    implicit val sqlCtx = spark.sqlContext
    val curated = Analog.curated(spark, "/root/testdata/sf0.001")
    val all = curated.select("booking_date", "checkin_date",
        "checkout_date", "booking_status")
      .as[CuratedLite].collect().toSeq
    assert(all.size == 1500)

    val base = Files.createTempDirectory("graft_goldstate_stream").toString
    val input = MemoryStream[CuratedLite]
    // the SAME projection durationPartial applies, on the stream
    // (stateless — the aggregation itself happens per-batch in the
    // foreachBatch sink, GoldStream's shard discipline)
    val proj = input.toDF()
      .filter(col("booking_status") === "confirmed")
      .select(Present.monthOf(col("checkin_date")).as("month_start"),
        datediff(col("checkout_date"), col("checkin_date"))
          .cast(LongType).as("nights"))
    val q = GoldStream.start(proj, s"$base/shards",
      Files.createTempDirectory("graft_goldstate_ckpt").toString,
      keys = Seq("month_start"), sumCols = Seq("nights"))
    try {
      val parts = Seq(all.slice(0, 400), all.slice(400, 1100),
        all.slice(1100, 1500))
      parts.foreach { p => input.addData(p: _*); q.processAllAvailable() }
    } finally q.stop()

    GoldStream.compact(spark, None, s"$base/shards", s"$base/state",
      keys = Seq("month_start"), sumCols = Seq("nights"))
    val served = GoldState.durationGold(
      spark.read.parquet(s"$base/state"))
    val batch = Present.monthlyAvgDuration(curated)
    assert(served.schema.map(f => (f.name, f.dataType)) ==
      batch.schema.map(f => (f.name, f.dataType)))
    val s = served.collect().map(_.toSeq.map(String.valueOf)).toSeq
    val b = batch.collect().map(_.toSeq.map(String.valueOf)).toSeq
    assert(s == b)
  }
}
