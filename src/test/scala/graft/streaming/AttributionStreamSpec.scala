package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.ops.Attribution
import EventStream.Event

/** Stream-stream interval join twin ≡ batch Attribution.touchPairs.
  * Self-join shape: views and purchases are filters of the SAME
  * event stream (the production Kafka-topic shape); inner-join pairs
  * emit as matches arrive, across micro-batch boundaries in either
  * direction (a view buffered in state pairs with a purchase that
  * arrives two batches later, and vice versa within the horizon). */
class AttributionStreamSpec extends SparkSpec {
  import spark.implicits._

  test("stream pair set ≡ batch touchPairs across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val events = graft.io.Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    val rows = events.as[Event].collect().toSeq

    // three batches split by ts terciles: pairs must form across
    // batch boundaries (purchase after its views, and views arriving
    // in the same batch as their purchase)
    val sorted = rows.map(e => StreamTime.micros(e.ts)).sorted
    val (c1, c2) = (sorted(rows.size / 3), sorted(2 * rows.size / 3))
    val b1 = rows.filter(e => StreamTime.micros(e.ts) < c1)
    val b2 = rows.filter(e => StreamTime.micros(e.ts) >= c1 &&
      StreamTime.micros(e.ts) < c2)
    val b3 = rows.filter(e => StreamTime.micros(e.ts) >= c2)

    val collected = mutable.ListBuffer.empty[Row]
    val input = MemoryStream[Event]
    val src = input.toDS()
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = src.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"),
        col("event_id").as("view_event_id"))
    val joined = AttributionStream.touchPairs(purchases, views,
      Seq("user_id"), leftTime = "ts", rightTime = "view_ts",
      rightCols = Seq("view_event_id"), horizon = "7 days",
      leftDelay = "30 days", rightDelay = "30 days")
    val q = joined.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
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
    } finally q.stop()

    val batchPairs = Attribution.touchPairs(
      events.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts")),
      events.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("view_ts"),
          col("event_id").as("view_event_id")),
      Seq("user_id"), "ts", "view_ts", Seq("view_event_id"), "7 days")
      .select("event_id", "view_event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val streamPairs = collected.toList
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("view_event_id")))
    assert(streamPairs.size == streamPairs.toSet.size,
      "stream emitted duplicate pairs")
    assert(streamPairs.toSet == batchPairs)
    assert(batchPairs.nonEmpty)
    // the split genuinely exercised cross-batch state: at least one
    // pair spans two different input batches
    val batchOf = b1.map(_.event_id -> 1).toMap ++
      b2.map(_.event_id -> 2).toMap ++ b3.map(_.event_id -> 3).toMap
    assert(streamPairs.exists { case (p, v) => batchOf(p) != batchOf(v) })
  }

  test("streaming lastTouch rollup ≡ batch on the attributed subset") {
    implicit val sqlCtx = spark.sqlContext
    val events = graft.io.Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    val rows = events.as[Event].collect().toSeq
    val sorted = rows.map(e => StreamTime.micros(e.ts)).sorted
    val cut = sorted(rows.size / 2)
    val (b1, b2) = rows.partition(e => StreamTime.micros(e.ts) < cut)

    val collected = mutable.ListBuffer.empty[Row]
    val input = MemoryStream[Event]
    val src = input.toDS()
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = src.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"),
        col("event_id").as("view_event_id"))
    // join → windowed agg, ONE append-mode query (multiple stateful
    // operators); a short watermark so rows finalize, then a final
    // far-future batch pushes the watermark past every window
    val rolled = AttributionStream.lastTouch(purchases, views,
      Seq("user_id"), leftIdCols = Seq("event_id"),
      leftTime = "ts", rightTime = "view_ts",
      rightCols = Seq("view_event_id"), horizon = "7 days",
      leftDelay = "1 hour", rightDelay = "1 hour")
    val q = rolled.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val rs = batch.collect()
        collected.synchronized { collected ++= rs }
        ()
      }
      .outputMode("append")
      .start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      // watermark flush: sentinels far past every window, one PER
      // SIDE (each must survive its side's event_type filter to
      // reach that side's withWatermark — a filtered-out sentinel
      // advances nothing); distinct lone users so no pair forms,
      // hence neither sentinel can appear in the inner-join output
      input.addData(
        Event(-1L, java.sql.Timestamp.valueOf("2030-01-01 00:00:00"),
          -1L, "view", 0.0),
        Event(-2L, java.sql.Timestamp.valueOf("2030-01-01 00:00:00"),
          -2L, "purchase", 0.0))
      q.processAllAvailable()
    } finally q.stop()

    // the parquet-derived batch frame carries TIMESTAMP_NTZ
    // (LocalDateTime externally); the Event-encoded stream carries
    // TIMESTAMP (java.sql.Timestamp) — compare on epoch micros (UTC)
    def tsMicros(x: Any): Long = x match {
      case t: java.sql.Timestamp => StreamTime.micros(t)
      case d: java.time.LocalDateTime =>
        d.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
          d.getNano / 1000
      case other => fail(s"unexpected timestamp type: $other")
    }
    val batchTable = graft.ops.Attribution.lastTouch(
      events.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts")),
      events.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("view_ts"),
          col("event_id").as("view_event_id")),
      Seq("user_id"), "event_id", "ts", "view_ts",
      Seq("view_event_id"), "7 days")
      .filter(col("view_event_id").isNotNull)
      .select("event_id", "view_ts", "view_event_id", "n_touches")
      .collect()
      .map(r => (r.getLong(0), tsMicros(r.get(1)), r.getLong(2),
        r.getLong(3))).toSet

    val streamRows = collected.toList.map(r => (
      r.getAs[Long]("event_id"), tsMicros(r.getAs[Any]("view_ts")),
      r.getAs[Long]("view_event_id"), r.getAs[Long]("n_touches")))
    assert(streamRows.size == streamRows.toSet.size,
      "rollup emitted a conversion twice")
    assert(streamRows.toSet == batchTable)
    assert(batchTable.nonEmpty)
  }
}
