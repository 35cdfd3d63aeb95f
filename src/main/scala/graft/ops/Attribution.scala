package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-bounded touch attribution — the horizon-bounded sibling of
  * [[AsOfJoin]] (reference has no counterpart; its joins are all equi,
  * SURVEY §2.3; the q16 as-of attaches the latest touch UNBOUNDED).
  * Marketing/conversion pipelines need the bounded form: "the last
  * view within 7 days before the purchase, and how many views fell in
  * that window" — a lookback horizon, not all history.
  *
  * Two formulations:
  *
  * [[lastTouch]] is the scale path: the [[AsOfJoin]] union+window
  * formulation extended with TWO probe rows per left row — one at
  * `leftTime` and one at `leftTime − horizon`. One shuffle by key,
  * one sort, a running `last(payload)` + running touch count, then a
  * 2-row regroup per left id recovers both the last in-window touch
  * (carried payload, nulled when it predates the horizon) and the
  * exact in-window touch count (count-at-hi − count-at-lo). Cost is
  * O(shuffle(|L|·2 + |R|)) regardless of how many touches fall inside
  * the horizon — a join formulation pays O(matches) rows through the
  * exchange, which on a dense history (bot traffic: 10⁵ views before
  * one purchase) is the skew that kills the stage.
  *
  * [[touchPairs]] is the pair-level formulation (every qualifying
  * (left, touch) pair): an equi-join on the keys with the horizon as
  * a residual range predicate — a plain shuffled sort-merge join AQE
  * can skew-split. Output volume IS the match count by definition, so
  * it scales exactly when the caller wants all pairs (and it is the
  * batch contract the streaming twin
  * [[graft.streaming.AttributionStream]] is proven against — Spark's
  * watermarked stream-stream interval join emits exactly these rows).
  *
  * Window semantics: half-open `(leftTime − horizon, leftTime]` —
  * a touch exactly `horizon` old no longer counts; a touch at the
  * conversion instant does. Among equal-`rightTime` touches the
  * lexicographically greatest payload wins deterministically, same
  * contract as [[AsOfJoin]].
  *
  * NULL keys: [[lastTouch]] partitions a window by the keys, and
  * window partitioning groups NULLs TOGETHER — a null-key conversion
  * would see null-key touches, where the join formulations
  * ([[touchPairs]], and any SQL replay) never match on NULL.
  * Pre-filter null keys when join parity on them matters (the same
  * caveat as [[AsOfJoin]]).
  */
object Attribution {

  /** Last in-horizon touch + exact in-horizon touch count per left
    * row.
    *
    * @param left      conversion rows (preserved exactly — left-outer)
    * @param right     touch rows to look up
    * @param keys      equi-join key columns (same names both sides)
    * @param leftId    a column of `left` that uniquely identifies each
    *                  left row (the 2-probe regroup needs an identity;
    *                  duplicate ids would collapse rows)
    * @param leftTime  left timestamp column name
    * @param rightTime right timestamp column name
    * @param rightCols right payload columns to attach (aliased as-is)
    * @param horizon   lookback as a Spark interval string, e.g.
    *                  `"7 days"` — the window is
    *                  `(leftTime − horizon, leftTime]`
    * @return left columns ++ rightTime ++ rightCols (null when no
    *         in-horizon touch) ++ `n_touches` (0L when none) ++
    *         `touch_gap_us` (microseconds from last touch to leftTime)
    */
  def lastTouch(left: DataFrame, right: DataFrame, keys: Seq[String],
                leftId: String, leftTime: String, rightTime: String,
                rightCols: Seq[String], horizon: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val reserved =
      Seq("__t", "__side", "__payload", "__hit", "__cnt", "__kind")
    require(leftCols.intersect(reserved).isEmpty &&
      (keys ++ rightCols :+ rightTime).intersect(reserved).isEmpty,
      s"columns may not use reserved names ${reserved.mkString(", ")}")
    require(keys.contains(leftId) == false && leftCols.contains(leftId),
      s"leftId must be a non-key column of left: $leftId")
    val clash = (rightCols :+ rightTime).toSet
      .intersect(leftCols.filterNot(keys.contains).toSet)
    require(clash.isEmpty,
      s"right payload columns collide with left columns: ${clash.mkString(", ")}")
    val iv = expr(s"INTERVAL $horizon")
    val payload = struct((rightTime +: rightCols).map(col): _*)
    val nullPayload = (df: DataFrame) =>
      lit(null).cast(df.schema("__payload").dataType)

    // touch rows: __side 0 sorts BEFORE probes at equal timestamps →
    // both probes see touches at their own instant (inclusive ≤).
    val touches = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).cast("timestamp").as("__t"),
        lit(0).as("__side"),
        payload.as("__payload"),
        lit(1L).as("__hit"),
        lit(null).cast("int").as("__kind")) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).as(c)): _*)
    // two probe rows per left row: kind 0 at leftTime − horizon
    // (counts touches OUTSIDE the half-open window), kind 1 at
    // leftTime (counts touches up to and including the conversion).
    val probes = left
      .select(keys.map(col) ++ Seq(
        col(leftTime).cast("timestamp").as("__pt")) ++
        leftCols.filterNot(keys.contains).map(col): _*)
      .withColumn("__kind", explode(array(lit(0), lit(1))))
      .select(
        keys.map(col) ++ Seq(
          when(col("__kind") === 0, col("__pt") - iv)
            .otherwise(col("__pt")).as("__t"),
          lit(1).as("__side"),
          nullPayload(touches).as("__payload"),
          lit(0L).as("__hit"),
          col("__kind")) ++
          leftCols.filterNot(keys.contains).map(col): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"), col("__payload"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scanned = touches.unionByName(probes)
      .withColumn("__payload", last(col("__payload"), ignoreNulls = true).over(w))
      .withColumn("__cnt", sum(col("__hit")).over(w))
      .filter(col("__side") === 1)

    // regroup the 2 probe rows per left id: hi carries the left row,
    // the candidate payload and cnt_le(t); lo carries cnt_le(t − H).
    // max(when(kind, c)) is deterministic single-non-null extraction
    // (exactly one hi and one lo row per id); left columns must be
    // orderable types (max), same as any groupBy key.
    val hi = (c: Column) => max(when(col("__kind") === 1, c))
    val aggs =
      hi(col("__cnt")).as("__cnt_hi") +:
        max(when(col("__kind") === 0, col("__cnt"))).as("__cnt_lo") +:
        hi(col("__payload")).as("__payload") +:
        hi(col("__t")).as("__t") +:
        (keys.map(k => hi(col(k)).as(k)) ++
          leftCols.filterNot(c => keys.contains(c) || c == leftId)
            .map(c => hi(col(c)).as(c)))
    val grouped = scanned
      .groupBy(col(leftId))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("__payload",
        // null out a carried touch that predates the horizon
        when(col(s"__payload.$rightTime") > col("__t") - iv,
          col("__payload")))
    grouped.select(
      leftCols.map(col) ++
        ((rightTime +: rightCols).map(c => col(s"__payload.$c").as(c))) :+
        (col("__cnt_hi") - col("__cnt_lo")).as("n_touches") :+
        (unix_micros(col("__t")) -
          // rightTime may arrive TIMESTAMP_NTZ (parquet isAdjustedToUTC
          // =false); the session is UTC so the cast is instant-exact
          unix_micros(col(s"__payload.$rightTime").cast("timestamp")))
          .as("touch_gap_us"): _*)
  }

  /** Every qualifying (left, touch) pair in the half-open window
    * `(leftTime − horizon, leftTime]` — inner join, one output row per
    * match. Equi-join on `keys` with the horizon as a residual
    * predicate: a plain shuffled join, skew-handled by AQE. This is
    * the batch contract for the streaming twin (stream-stream interval
    * join emits exactly this set). */
  def touchPairs(left: DataFrame, right: DataFrame, keys: Seq[String],
                 leftTime: String, rightTime: String,
                 rightCols: Seq[String], horizon: String): DataFrame = {
    require(leftTime != rightTime,
      "leftTime and rightTime must be distinct column names")
    val iv = expr(s"INTERVAL $horizon")
    val r = right.select((keys :+ rightTime).map(col) ++
      rightCols.map(col): _*)
    left.join(r, keys)
      .filter(col(rightTime) > col(leftTime) - iv &&
        col(rightTime) <= col(leftTime))
  }
}
