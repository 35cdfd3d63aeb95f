package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.io.Tables
import graft.ops.Attribution

/** Scale measurement of the attribution family (q182/q183): 10×
  * events (users ×10, per-user density unchanged) for linear-growth
  * behavior, plus the scenario the lastTouch formulation exists for —
  * a PLANTED BOT USER with a dense touch history (50k views inside
  * the horizon of 20 purchases ⇒ ~1M qualifying pairs from one key).
  * touchPairs pays O(matches) there BY CONTRACT (pair output is the
  * product); lastTouch must stay ~flat because its exchange carries
  * |views| + 2·|purchases| rows no matter how many pairs the horizon
  * contains. Results land in PLANS.md. */
object ProfileAttribution10x {

  private def timed(label: String)(body: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = body
    println(f"[attr10x] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
  }

  private def split(ev: DataFrame): (DataFrame, DataFrame) = (
    ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts")),
    ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"),
        col("event_id").as("view_event_id")))

  private def events10x(spark: SparkSession): DataFrame = {
    val e = Tables.events(spark, "/root/testdata/sf0.1")
      .select("event_id", "ts", "user_id", "event_type")
    (0 until 10).map { k =>
      e.select((col("event_id") + lit(k * 10000000L)).as("event_id"),
        col("ts"), (col("user_id") + lit(k * 100000L)).as("user_id"),
        col("event_type"))
    }.reduce(_ unionByName _)
  }

  /** One bot user (id 999999): 50k views over 2 days, then 20
    * purchases right after — every view inside every purchase's
    * 7-day horizon ⇒ 10⁶ qualifying pairs from a single key. */
  private def bot(spark: SparkSession): DataFrame = {
    val base = lit("2024-01-10 00:00:00").cast("timestamp")
    val views = spark.range(50000).select(
      (col("id") + 90000000L).as("event_id"),
      (base + expr("make_interval(0, 0, 0, 0, 0, 0, id * 3)")).as("ts"),
      lit(999999L).as("user_id"), lit("view").as("event_type"))
    val buys = spark.range(20).select(
      (col("id") + 99000000L).as("event_id"),
      (base + expr("INTERVAL 2 DAYS")
        + expr("make_interval(0, 0, 0, 0, 0, 0, id * 60)")).as("ts"),
      lit(999999L).as("user_id"), lit("purchase").as("event_type"))
    views.unionByName(buys)
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val e1 = Tables.events(spark, "/root/testdata/sf0.1")
      .select("event_id", "ts", "user_id", "event_type")
      .localCheckpoint(true)
    val e10 = events10x(spark).localCheckpoint(true)
    val eBot = e1.unionByName(bot(spark)).localCheckpoint(true)
    println(s"[attr10x] 1x=${e1.count()} 10x=${e10.count()} " +
      s"bot=${eBot.count()} events")
    for (round <- 1 to 2) {
      for ((name, ev) <- Seq(("1x", e1), ("10x", e10), ("1x+bot", eBot))) {
        val (p, v) = split(ev)
        timed(s"lastTouch  $name (round $round)") {
          Attribution.lastTouch(p, v, Seq("user_id"), "event_id",
            "ts", "view_ts", Seq("view_event_id"), "7 days").count()
        }
        timed(s"touchPairs $name (round $round)") {
          Attribution.touchPairs(p, v, Seq("user_id"),
            "ts", "view_ts", Seq("view_event_id"), "7 days").count()
        }
        // the funnel walks two asofForward passes over the same
        // union+window shape — the bot user's 50k views cost 50k
        // exchange rows, never 50k × purchases pairs
        timed(s"funnelPaths $name (round $round)") {
          graft.ops.Analytics.funnelPaths(ev,
            Seq("view", "click", "purchase"), maxGap = "3 days").count()
        }
      }
    }
    spark.stop()
  }
}
