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

  /** Streaming LAST-TOUCH rollup — [[touchPairs]] chained into a
    * windowed event-time aggregation (Spark's multiple-stateful-
    * operators support: interval join → agg in one append-mode
    * query). Per conversion: the lexicographically greatest
    * (rightTime, rightCols) pair — the SAME argmax rule as the batch
    * [[graft.ops.Attribution.lastTouch]] — plus the exact in-window
    * touch count. A conversion's row finalizes (emits once) when the
    * watermark passes its day window, i.e. when no view inside its
    * horizon can still arrive.
    *
    * Contract differences vs the batch operator, by construction:
    * inner semantics — a conversion with NO in-horizon touch never
    * emits (the batch left-outer row with nulls has no streaming
    * finalization point without the join's own state; serve those
    * from the batch table). Emitted rows match the batch operator
    * exactly on the attributed subset (AttributionStreamSpec).
    *
    * Emission latency: Spark propagates the interval join's output
    * watermark conservatively as min(input watermarks) − horizon, so
    * a window finalizes roughly `horizon + delay` after its end in
    * event time — the price of exact counts over the full lookback
    * (observed directly in the spec: a sentinel that fails to
    * advance BOTH sides' watermarks leaves every window younger than
    * wm − horizon unflushed).
    *
    * @param leftIdCols every left column to carry (grouping keys of
    *                   the rollup — must make a conversion unique) */
  def lastTouch(leftStream: DataFrame, rightStream: DataFrame,
                keys: Seq[String], leftIdCols: Seq[String],
                leftTime: String, rightTime: String,
                rightCols: Seq[String], horizon: String,
                leftDelay: String = "1 day",
                rightDelay: String = "1 day"): DataFrame = {
    val pairs = touchPairs(leftStream, rightStream, keys, leftTime,
      rightTime, rightCols, horizon, leftDelay, rightDelay)
    val best = struct((rightTime +: rightCols).map(col): _*)
    pairs
      // the watermarked event-time column may appear ONCE: inside
      // window(). leftTime itself is carried through max() — exact,
      // since (keys, leftIdCols) already determine the conversion
      .groupBy(window(col(leftTime), "1 day") +:
        (keys ++ leftIdCols).map(col): _*)
      .agg(max(col(leftTime)).as(leftTime),
        max(best).as("__best"), count(lit(1)).as("n_touches"))
      .select((keys ++ leftIdCols :+ leftTime).map(col) ++
        (rightTime +: rightCols).map(c => col(s"__best.$c").as(c)) :+
        col("n_touches"): _*)
  }
}
