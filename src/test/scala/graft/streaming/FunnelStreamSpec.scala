package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.ops.Analytics
import EventStream.Event

/** Per-user CEP funnel state machine ≡ batch funnelPaths: every
  * stage-0 event finalizes exactly once — on chain completion, on
  * provable death (a later event closes its cap window), or on the
  * event-time timeout once the watermark passes its last open
  * deadline. */
class FunnelStreamSpec extends SparkSpec {
  import spark.implicits._

  test("final emissions ≡ batch funnelPaths over micro-batched events") {
    implicit val sqlCtx = spark.sqlContext
    val events = graft.io.Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    val rows = events.as[Event].collect().toSeq
    val sorted = rows.map(e => StreamTime.micros(e.ts)).sorted
    val (c1, c2) = (sorted(rows.size / 3), sorted(2 * rows.size / 3))
    val b1 = rows.filter(e => StreamTime.micros(e.ts) < c1)
    val b2 = rows.filter(e => StreamTime.micros(e.ts) >= c1 &&
      StreamTime.micros(e.ts) < c2)
    val b3 = rows.filter(e => StreamTime.micros(e.ts) >= c2)

    val collected = mutable.ListBuffer.empty[FunnelStream.FunnelOut]
    val input = MemoryStream[Event]
    val q = FunnelStream.funnelStream(input.toDS(),
        Seq("view", "click", "purchase"), maxGap = "3 days",
        watermarkDelay = "1 hour")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[
          FunnelStream.FunnelOut], _: Long) =>
        val rs = batch.collect()
        collected.synchronized { collected ++= rs }
        ()
      }
      .outputMode("append")
      .start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      input.addData(b3: _*); q.processAllAvailable()
      // a single far-future event advances the watermark; event-time
      // timeouts then flush every user's remaining open chains
      input.addData(Event(-1L,
        java.sql.Timestamp.valueOf("2030-01-01 00:00:00"),
        -1L, "noop", 0.0))
      q.processAllAvailable()
    } finally q.stop()

    val streamRows = collected.toList
      .map(o => (o.s0_id, o.s1_id, o.s2_id, o.completed_stages))
    assert(streamRows.size == streamRows.toSet.size,
      "a stage-0 event finalized twice")
    val batchRows = Analytics.funnelPaths(events,
        Seq("view", "click", "purchase"), maxGap = "3 days")
      .select("s0_id", "s1_id", "s2_id", "completed_stages")
      .as[(Long, Option[Long], Option[Long], Long)].collect().toSet
    assert(batchRows.nonEmpty)
    assert(streamRows.toSet == batchRows)
    // the fixture must exercise every depth, or the ≡ proves little
    assert(Set(1L, 2L, 3L).subsetOf(
      batchRows.map(_._4)), s"depths: ${batchRows.map(_._4)}")
  }
}
