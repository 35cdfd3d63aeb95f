package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.GraftSession
import graft.io.Tables
import graft.ops.{Incremental, RangeJoin, Sessions, Upsert}

/** 10×-scale measurement of the warehouse-maintenance family
  * (q187/q188): keys ×10 with per-key history unchanged — the growth
  * axis a dimension changelog actually sees. Checks (a) scd2History
  * scales ≈ linearly in keys (one keyed exchange, per-key sorted
  * windows), and (b) the incremental-Gold claim in numbers: a delta
  * refresh (stored partial ⊕ one-month delta) vs the full-history
  * rescan it replaces, at 10×. Results land in PLANS.md. */
object ProfileMaintenance10x {

  private def timed(label: String)(body: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = body
    println(f"[maint10x] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
  }

  private def events10x(spark: SparkSession): DataFrame = {
    val e = Tables.events(spark, "/root/testdata/sf0.1")
      .select("event_id", "ts", "user_id", "event_type")
    (0 until 10).map { k =>
      e.select((col("event_id") + lit(k * 10000000L)).as("event_id"),
        col("ts"), (col("user_id") + lit(k * 100000L)).as("user_id"),
        col("event_type"))
    }.reduce(_ unionByName _)
  }

  private def orders10x(spark: SparkSession): DataFrame = {
    val o = Tables.orders(spark, "/root/testdata/sf0.1").select(
      date_trunc("month", col("o_orderdate")).cast("date")
        .as("order_month"),
      col("o_totalprice").cast(DecimalType(18, 2)).as("price"))
    (0 until 10).map(_ => o).reduce(_ unionByName _)
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val e1 = Tables.events(spark, "/root/testdata/sf0.1")
      .select("event_id", "ts", "user_id", "event_type")
    val e10 = events10x(spark).localCheckpoint(true)
    println(s"[maint10x] changelog: ${e10.count()} rows, " +
      s"${e10.select("user_id").distinct().count()} keys")

    // the Silver the Gold reads from is month-partitioned PARQUET —
    // the delta refresh's advantage is scan volume (partition
    // pruning), which an in-memory frame would hide
    val silverPath = java.nio.file.Files
      .createTempDirectory("graft_maint10x").toString + "/orders"
    orders10x(spark).write.partitionBy("order_month").parquet(silverPath)
    val o10 = spark.read.parquet(silverPath)
    val cut = lit("2000-01-01").cast("date")
    def part(df: DataFrame) = Incremental.partialAggregate(
      df, Seq("order_month"), sumCols = Seq("price"),
      minCols = Seq("price"), maxCols = Seq("price"),
      countCol = "n_orders")
    // the stored Gold exists already in a real deployment — build it
    // once outside the timed section
    val stored = part(o10.filter(col("order_month") < cut))
      .localCheckpoint(true)

    for (round <- 1 to 2) {
      timed(s"scd2History 1x (round $round)") {
        Upsert.scd2History(e1, Seq("user_id"), "ts",
          Seq("event_id"), Seq("event_type")).count()
      }
      timed(s"scd2History 10x (round $round)") {
        Upsert.scd2History(e10, Seq("user_id"), "ts",
          Seq("event_id"), Seq("event_type")).count()
      }
      timed(s"gold full-rescan 10x (round $round)") {
        part(o10).count()
      }
      timed(s"gold delta-refresh 10x (round $round)") {
        Incremental.merge(
          Seq(stored, part(o10.filter(col("order_month") >= cut))),
          Seq("order_month"), sumCols = Seq("price"),
          minCols = Seq("price"), maxCols = Seq("price"),
          countCol = "n_orders").count()
      }
      // overlap join at 10× keys: sessions × daily windows — row
      // multiplication is bounded by interval_len/bin, pairs by the
      // true overlap count, never |sessions|×|windows|
      def overlapOf(ev: DataFrame): Long = {
        val sess = Sessions.sessionize(ev)
        val wins = ev
          .select(date_trunc("day", col("ts")).as("win_start")).distinct()
          .select(col("win_start"),
            (col("win_start") + expr("INTERVAL 6 HOURS")).as("win_end"))
        RangeJoin.overlapBinned(sess, wins,
          "session_start", "session_end", "win_start", "win_end").count()
      }
      timed(s"overlapBinned 1x (round $round)") { overlapOf(e1) }
      timed(s"overlapBinned 10x (round $round)") { overlapOf(e10) }
    }
    // prove the delta path's scan is partition-pruned, not filtered —
    // partition pruning is STATIC planning, so the pre-execution plan
    // already shows it (no need to run; collecting DATE rows under a
    // bare `java -cp` launcher trips JDK-17 module access anyway)
    val delta = part(o10.filter(col("order_month") >= cut))
    val pruned = delta.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("PartitionFilters")).getOrElse("<none>")
    println(s"[maint10x] delta scan: ${pruned.trim.take(200)}")
    spark.stop()
  }
}
