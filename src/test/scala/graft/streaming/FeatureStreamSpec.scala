package graft.streaming

import java.sql.Timestamp

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.ops.Timeseries
import EventStream.Event
import FeatureStream.FeatOut

class FeatureStreamSpec extends SparkSpec {
  import spark.implicits._

  test("final emission per (user, day) ≡ batch trailingFeatures") {
    implicit val sqlCtx = spark.sqlContext
    val events = graft.io.Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("user_id") < 20)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    val rows = events.as[Event].collect().toSeq
    // split by global ts median: per-user days never regress across
    // batches (the operator's ordering contract), but a DAY may span
    // the split — its first emission is partial, the last complete
    val cut = rows.map(e => StreamTime.micros(e.ts)).sorted
      .apply(rows.size / 2)
    val (b1, b2) = rows.partition(e => StreamTime.micros(e.ts) < cut)

    val emitted = mutable.ListBuffer.empty[FeatOut]
    val input = MemoryStream[Event]
    val q = FeatureStream.trailingFeaturesStream(input.toDS())
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[FeatOut],
                       _: Long) =>
        emitted.synchronized { emitted ++= batch.collect() }
        ()
      }
      .outputMode("update")
      .start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    val finalByDay = emitted.toList.zipWithIndex
      .groupBy { case (o, _) => (o.user_id, o.day.toString) }
      .map { case (k, vs) => k -> vs.maxBy(_._2)._1 }

    val batchRows = Timeseries.trailingFeatures(events)
      .as[(Long, java.sql.Date, Long, Double, Option[Long])]
      .collect().toSeq
    assert(batchRows.nonEmpty)
    assert(finalByDay.size == batchRows.size)
    batchRows.foreach { case (u, day, n7, mx7, gap) =>
      val o = finalByDay((u, day.toString))
      assert((o.n_events_7d, o.max_value_7d, o.days_since_prev) ==
        ((n7, mx7, gap)), s"mismatch at user=$u day=$day")
    }
  }

  test("a later day in the same batch cannot starve an earlier " +
      "day's emission (evict after emit)") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)
    val input = MemoryStream[Event]
    val emitted = mutable.ListBuffer.empty[FeatOut]
    val q = FeatureStream.trailingFeaturesStream(input.toDS())
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[FeatOut],
                       _: Long) =>
        emitted.synchronized { emitted ++= batch.collect() }
        ()
      }
      .outputMode("update")
      .start()
    try {
      // day 1 and day 30 in ONE batch: day 1 leaves the ring at
      // batch end but must still emit its own complete features
      input.addData(
        Event(1, ts("2024-01-01 10:00:00"), 7, "view", 2.0),
        Event(2, ts("2024-01-30 10:00:00"), 7, "view", 5.0))
      q.processAllAvailable()
      // the NEXT day continues from the surviving ring
      input.addData(Event(3, ts("2024-01-31 09:00:00"), 7, "view", 1.0))
      q.processAllAvailable()
    } finally q.stop()
    val out = emitted.toList.map(o =>
      (o.day.toString, o.n_events_7d, o.max_value_7d, o.days_since_prev))
    assert(out == List(
      ("2024-01-01", 1L, 2.0, None),
      ("2024-01-30", 1L, 5.0, Some(29L)),
      ("2024-01-31", 2L, 5.0, Some(1L))))
  }
}
