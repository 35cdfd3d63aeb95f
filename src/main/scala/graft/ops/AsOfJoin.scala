package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (time-travel) join — an operator Spark's SQL surface lacks
  * (pandas-on-Spark has merge_asof; Catalyst has no native node).
  * For every left row, attach the LATEST right row with
  * `rightTime <= leftTime` within the same key group.
  *
  * Implementation is the scalable union+window formulation, not a
  * range join: tag both inputs, union, ONE shuffle by key, ONE sort
  * by (time, side, tie), then `last(struct, ignoreNulls)` carries the
  * most recent right payload forward onto each left row. Cost is
  * O(shuffle(|L|+|R|)) regardless of time-range density — a
  * range-condition join degenerates to O(|L|·|R|) per key on dense
  * histories. The right payload travels as ONE struct so all carried
  * columns come from the SAME right row.
  *
  * Among duplicate right (key, time) rows the lexicographically
  * greatest payload wins, deterministically (engines with a native
  * ASOF, e.g. DuckDB, leave that case implementation-defined —
  * pre-dedup the right side when cross-engine parity matters).
  *
  * NULL keys: window partitioning groups NULLs TOGETHER — a null-key
  * left row sees null-key right history, where a join formulation
  * never matches on NULL. Pre-filter null keys when join parity on
  * them matters.
  */
object AsOfJoin {

  /**
   * @param left       left rows (preserved exactly — left-outer)
   * @param right      right rows to look up as-of
   * @param keys       equi-join key columns (same names both sides)
   * @param leftTime   left timestamp column name
   * @param rightTime  right timestamp column name
   * @param rightCols  right payload columns to attach (aliased as-is)
   */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: String, rightTime: String,
           rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val reserved = Seq("__t", "__side", "__payload", "__asof")
    require(leftCols.intersect(reserved).isEmpty,
      s"left columns may not use reserved names ${reserved.mkString(", ")}")
    require((keys ++ rightCols :+ rightTime).intersect(reserved).isEmpty,
      s"right/key columns may not use reserved names ${reserved.mkString(", ")}")
    val keyAsPayload = keys.toSet.intersect((rightCols :+ rightTime).toSet)
    require(keyAsPayload.isEmpty,
      s"key columns may not be requested as right payload: ${keyAsPayload.mkString(", ")}")
    val clash = (rightCols :+ rightTime).toSet
      .intersect(leftCols.filterNot(keys.contains).toSet)
    require(clash.isEmpty,
      s"right payload columns collide with left columns: ${clash.mkString(", ")}")
    val payload = struct((rightTime +: rightCols).map(col): _*)

    // a null rightTime row would sort to the scan front and its
    // payload would be carried onto left rows until a real right row
    // overwrites it — "as of null" matches nothing in any engine
    // (join semantics), so drop such rows up front
    val taggedRight = right.filter(col(rightTime).isNotNull).select(
      keys.map(col) ++ Seq(
        col(rightTime).cast("timestamp").as("__t"),
        lit(0).as("__side"),
        payload.as("__payload")) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).as(c)): _*)
    val taggedLeft = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).cast("timestamp").as("__t"),
        lit(1).as("__side"),
        lit(null).cast(taggedRight.schema("__payload").dataType)
          .as("__payload")) ++
        leftCols.filterNot(keys.contains).map(col): _*)

    // right rows sort before left rows at equal timestamps → the
    // inclusive rightTime <= leftTime semantics. The payload struct
    // is the final ordering key: among duplicate right (key, time)
    // rows the lexicographically greatest payload deterministically
    // wins (left rows carry null payloads, distinguished by __side).
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"), col("__payload"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    taggedRight.unionByName(taggedLeft)
      .withColumn("__asof", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightCols.map(c => col(s"__asof.$c").as(c)) :+
        col(s"__asof.$rightTime").as(rightTime): _*)
  }

  /** Forward as-of: for every left row, the EARLIEST right row with
    * `rightTime > leftTime` (strictly after — the "next event" lookup:
    * next click after an impression, next reading after a sensor
    * probe). Same union+window formulation mirrored: ONE shuffle by
    * key, the sort DESCENDS on time with right rows ordered after
    * left rows at equal timestamps (so an equal-time right row is NOT
    * "after"), and `last(payload, ignoreNulls)` running down the
    * descending order carries the nearest later right row backward
    * onto each left row. O(shuffle(|L|+|R|)) like [[asof]], and the
    * same NULL-key caveat applies.
    *
    * Among duplicate right (key, time) rows the lexicographically
    * SMALLEST payload wins (the payload sorts descending, so the last
    * seen above a left row is the minimum) — deterministic, and the
    * natural mirror of [[asof]]'s greatest-payload rule: both pick
    * the extremum nearest the left row in scan order. */
  def asofForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTime: String, rightTime: String,
                  rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val reserved = Seq("__t", "__side", "__payload", "__asof")
    require(leftCols.intersect(reserved).isEmpty,
      s"left columns may not use reserved names ${reserved.mkString(", ")}")
    require((keys ++ rightCols :+ rightTime).intersect(reserved).isEmpty,
      s"right/key columns may not use reserved names ${reserved.mkString(", ")}")
    val keyAsPayload = keys.toSet.intersect((rightCols :+ rightTime).toSet)
    require(keyAsPayload.isEmpty,
      s"key columns may not be requested as right payload: ${keyAsPayload.mkString(", ")}")
    val clash = (rightCols :+ rightTime).toSet
      .intersect(leftCols.filterNot(keys.contains).toSet)
    require(clash.isEmpty,
      s"right payload columns collide with left columns: ${clash.mkString(", ")}")
    val payload = struct((rightTime +: rightCols).map(col): _*)

    // a null rightTime row would sort to the scan front and its
    // payload would be carried onto left rows until a real right row
    // overwrites it — "as of null" matches nothing in any engine
    // (join semantics), so drop such rows up front
    val taggedRight = right.filter(col(rightTime).isNotNull).select(
      keys.map(col) ++ Seq(
        col(rightTime).cast("timestamp").as("__t"),
        lit(0).as("__side"),
        payload.as("__payload")) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).as(c)): _*)
    val taggedLeft = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).cast("timestamp").as("__t"),
        lit(1).as("__side"),
        lit(null).cast(taggedRight.schema("__payload").dataType)
          .as("__payload")) ++
        leftCols.filterNot(keys.contains).map(col): _*)

    // descending time; at equal timestamps left rows (side 1 desc →
    // sorts first) come BEFORE right rows, so an equal-time right row
    // is not carried — the strict `rightTime > leftTime` contract.
    // Payload descends too: the last right row seen above a left row
    // is the smallest payload at the nearest later time.
    // NULLS FIRST under desc: a null-leftTime row sits at the scan
    // top, sees no right rows above, and correctly gets null ("after
    // null" is no match) — the default NULLS LAST would hand it the
    // globally earliest right row instead
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").desc_nulls_first, col("__side").desc,
        col("__payload").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    taggedRight.unionByName(taggedLeft)
      .withColumn("__asof", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightCols.map(c => col(s"__asof.$c").as(c)) :+
        col(s"__asof.$rightTime").as(rightTime): _*)
  }
}
