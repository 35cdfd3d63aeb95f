package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event sessionization (gap-based): a new session starts after
  * `gapMicros` of inactivity. The batch twin of the Structured
  * Streaming session operator in graft.streaming — same semantics,
  * expressed with LAG + running sum (one shuffle by user_id; both
  * window functions share the same sort). */
object Sessions {

  def sessionize(events: DataFrame,
                 gapMicros: Long = 30L * 60 * 1000000): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val flagged = events.select("user_id", "event_id", "ts")
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts").cast("timestamp")) -
            unix_micros(col("prev_ts").cast("timestamp")) > gapMicros, 1)
          .otherwise(0))
    flagged
      .withColumn("session_id",
        sum(col("new_session")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
      .orderBy("user_id", "session_id")
  }
}
