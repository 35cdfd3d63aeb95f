package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.io.Tables
import graft.ops.Timeseries

/** 10×-scale measurement of the Timeseries family (q178/q181): users
  * ×10 with per-user density unchanged — the warehouse growth axis a
  * feature store actually sees (more keys, not longer per-key
  * history). Both operators are key-partitioned end to end, so cost
  * should scale ≈ linearly in keys with flat per-key work; this
  * profile checks that and the spine-volume arithmetic
  * (Σ_key span_days). Results land in PLANS.md. */
object ProfileTimeseries10x {

  private def timed(label: String)(body: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = body
    println(f"[ts10x] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
  }

  private def events10x(spark: SparkSession): DataFrame = {
    val e = Tables.events(spark, "/root/testdata/sf0.1")
      .select("event_id", "ts", "user_id", "value")
    (0 until 10).map { k =>
      e.select((col("event_id") + lit(k * 1000000L)).as("event_id"),
        col("ts"), (col("user_id") + lit(k * 10000L)).as("user_id"),
        col("value"))
    }.reduce(_ unionByName _)
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val e1 = Tables.events(spark, "/root/testdata/sf0.1")
      .select("event_id", "ts", "user_id", "value")
    val e10 = events10x(spark).localCheckpoint(true)
    println(s"[ts10x] corpus: ${e10.count()} events, " +
      s"${e10.select("user_id").distinct().count()} users")
    for (round <- 1 to 2) {
      timed(s"gapFillLocf 1x (round $round)") {
        Timeseries.gapFillLocf(e1).count()
      }
      timed(s"gapFillLocf 10x (round $round)") {
        Timeseries.gapFillLocf(e10).count()
      }
      timed(s"trailingFeatures 1x (round $round)") {
        Timeseries.trailingFeatures(e1).count()
      }
      timed(s"trailingFeatures 10x (round $round)") {
        Timeseries.trailingFeatures(e10).count()
      }
      // r8-cont: the anomaly gate keyed per USER (the many-keys
      // axis — per-source monitoring generalized); both median
      // passes run over per-key day counts only
      timed(s"volumeAnomalies 1x (round $round)") {
        Timeseries.volumeAnomalies(e1, keyCol = "user_id").count()
      }
      timed(s"volumeAnomalies 10x (round $round)") {
        Timeseries.volumeAnomalies(e10, keyCol = "user_id").count()
      }
    }
    spark.stop()
  }
}
