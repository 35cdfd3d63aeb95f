package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of [[graft.ops.Attribution.touchPairs]] — the
  * watermarked stream-stream interval join (the one stateful join
  * shape Structured Streaming supports natively, and the production
  * shape for live conversion attribution: purchases arrive on one
  * stream, views on another, and each purchase must pair with every
  * view in its lookback window without either side being complete).
  *
  * State story (the 100 TB/day argument): both sides are watermarked
  * and the join condition bounds `rightTime` to
  * `(leftTime − horizon, leftTime]`, so Spark derives state-eviction
  * watermarks for BOTH sides — a buffered touch is dropped once the
  * left watermark passes `touch_ts + horizon`; a buffered conversion
  * once the right watermark passes its own `ts` (no touch older than
  * the conversion can still match it... the interval's upper bound).
  * State size is O(events inside horizon + delay), NOT O(stream
  * history). An unbounded-condition stream-stream join (the q16 as-of
  * shape) cannot evict and is exactly what this operator exists to
  * avoid on streams.
  *
  * Column contract: left columns keep their names; right columns are
  * prefixed where they would clash (the caller picks disjoint names,
  * same as the batch operator's `rightCols` contract). Inner join —
  * the pair SET is the contract, proven row-equal to the batch
  * operator in AttributionStreamSpec.
  */
object AttributionStream {

  /** @param leftStream  conversion stream (must contain `keys`,
    *                    `leftTime`, and any payload columns — names
    *                    disjoint from the right selection)
    * @param rightStream touch stream
    * @param keys        equi-join keys (same names both sides)
    * @param leftTime    left event-time column
    * @param rightTime   right event-time column (≠ leftTime)
    * @param rightCols   right payload columns to keep
    * @param horizon     lookback interval string, window
    *                    `(leftTime − horizon, leftTime]`
    * @param leftDelay   left watermark delay (late-arrival allowance)
    * @param rightDelay  right watermark delay */
  def touchPairs(leftStream: DataFrame, rightStream: DataFrame,
                 keys: Seq[String], leftTime: String, rightTime: String,
                 rightCols: Seq[String], horizon: String,
                 leftDelay: String = "1 day",
                 rightDelay: String = "1 day"): DataFrame = {
    require(leftTime != rightTime,
      "leftTime and rightTime must be distinct column names")
    val l = leftStream.withWatermark(leftTime, leftDelay).alias("l")
    val r = rightStream
      .select((keys :+ rightTime).map(col) ++ rightCols.map(col): _*)
      .withWatermark(rightTime, rightDelay).alias("r")
    val keyCond = keys.map(k => col(s"l.$k") === col(s"r.$k"))
      .reduce(_ && _)
    val rangeCond =
      col(s"r.$rightTime") > col(s"l.$leftTime") - expr(s"INTERVAL $horizon") &&
        col(s"r.$rightTime") <= col(s"l.$leftTime")
    l.join(r, keyCond && rangeCond, "inner")
      .select(leftStream.columns.map(c => col(s"l.$c")) ++
        ((rightTime +: rightCols).map(c => col(s"r.$c"))): _*)
  }
}
