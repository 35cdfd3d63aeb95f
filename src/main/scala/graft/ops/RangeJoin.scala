package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types.StructType

/** Point-in-interval (range) join — an operator family the reference
  * never needed (its joins are all equi, SURVEY §2.3) but any
  * time-series / promo-window / slowly-changing-dimension workload
  * does, and one Spark has no native physical operator for.
  *
  * The naive formulation `points.join(intervals, $"t" >= $"start" &&
  * $"t" < $"end")` has no equi key, so Catalyst can only pick
  * BroadcastNestedLoopJoin — O(|P|·|I|) comparisons. Fine when the
  * interval side is tiny (and that IS the right plan then); fatal when
  * both sides are large.
  *
  * [[binned]] is the scale path: quantize time into fixed-width bins,
  * explode each interval to the bins it covers, and equi-join on the
  * bin id before applying the exact range predicate. Cost becomes
  * O(shuffle(|P| + |I|·bins_per_interval)) — a plain shuffled
  * hash/sort-merge join that AQE can re-plan, salt, or skew-split like
  * any other. Pick `binSeconds` ≈ the median interval length so
  * bins_per_interval stays small (1–3).
  */
object RangeJoin {

  /** Bin id = the bin's start in micros (us − us mod width), in pure
    * long arithmetic — a double floor(us / width) is only exact while
    * |us| < 2^53 and can mis-bin a point sitting just below a bin
    * boundary outside that range. pmod keeps floor semantics for
    * negative (pre-1970) timestamps; any order-preserving injection
    * of the quotient is a valid join key, so the division itself is
    * never needed. ONE definition shared by [[binned]] and
    * [[overlapBinned]] so the invariant can't drift between them. */
  private def binOfMicros(us: Column, binMicros: Long): Column =
    us - pmod(us, lit(binMicros))

  /** cast("timestamp") first: parquet written without the UTC flag
    * reads as TIMESTAMP_NTZ, which unix_micros rejects; under the
    * session's UTC zone the cast is value-exact and a no-op for
    * already-zoned timestamps. */
  private def usOf(t: Column): Column = unix_micros(t.cast("timestamp"))

  private def binOf(t: Column, binMicros: Long): Column =
    binOfMicros(usOf(t), binMicros)

  /** Explode an interval frame to the bins each [start, end) covers.
    * End is exclusive: the last covered bin is bin(end − 1µs), exact
    * in microseconds. Empty/inverted intervals match nothing — drop
    * them BEFORE the explode: sequence(hi, lo) counts DOWNWARD in
    * Spark, so an inverted interval would otherwise fan out to
    * spurious bins (filtered later, but paid for in the join). */
  private def explodeToBins(df: DataFrame, startCol: String,
                            endCol: String, binMicros: Long): DataFrame =
    df.filter(col(endCol) > col(startCol))
      .withColumn("__bin", explode(sequence(
        binOf(col(startCol), binMicros),
        binOfMicros(usOf(col(endCol)) - lit(1L), binMicros),
        lit(binMicros))))

  /** Exact-predicate baseline (broadcast nested loop). Correct at any
    * interval density; only use when `intervals` is broadcast-small. */
  def naive(points: DataFrame, intervals: DataFrame,
            pointTs: String, startCol: String, endCol: String): DataFrame =
    points.join(broadcast(intervals),
      col(pointTs) >= col(startCol) && col(pointTs) < col(endCol))

  /** Binned equi-join formulation. `points(pointTs)` and
    * `intervals(startCol, endCol)` must be timestamps; intervals are
    * half-open `[start, end)`. Output columns = points ++ intervals.
    *
    * Each interval row is exploded to `sequence(bin(start),
    * bin(end − 1µs))` bin ids — the ONLY row multiplication, bounded
    * by interval_len/binSeconds — then the join is a plain equi-join
    * on `__bin` with the exact range predicate as a residual filter.
    * All bin arithmetic runs on `unix_micros` (never `unix_timestamp`,
    * whose second truncation would drop the final bin of an interval
    * whose end carries a sub-second fraction just past a bin
    * boundary). Reserved column `__bin` is dropped from the output. */
  def binned(points: DataFrame, intervals: DataFrame,
             pointTs: String, startCol: String, endCol: String,
             binSeconds: Long = 86400L): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    require(!(points.columns ++ intervals.columns).contains("__bin"),
      "__bin is reserved")
    val binMicros = binSeconds * 1000000L
    val p = points.withColumn("__bin", binOf(col(pointTs), binMicros))
    val i = explodeToBins(intervals, startCol, endCol, binMicros)
    p.join(i, Seq("__bin"))
      .filter(col(pointTs) >= col(startCol) && col(pointTs) < col(endCol))
      .drop("__bin")
  }

  /** Broadcast interval-index join: collect the (small) interval side,
    * sort by start, precompute a running max-end, broadcast, and scan
    * points partition-locally with binary search — O(log |I| + hits)
    * per point vs the nested-loop's O(|I|). The prefix-max-end array
    * bounds the leftward walk: scanning stops at the first prefix
    * whose max end ≤ t (everything earlier ends even sooner only if
    * max says so — the classic sweep shortcut for mostly-disjoint
    * interval sets; worst case (all intervals overlap t) degrades to
    * the hit count, which is output size anyway).
    *
    * Same contract as [[naive]]/[[binned]]: output = point columns ++
    * interval columns, half-open `[start, end)`. Use when intervals
    * fit comfortably on the driver (≤ ~10⁶ rows); otherwise
    * [[binned]].
    *
    * The driver-size contract is ENFORCED, not advisory: the interval
    * side is counted first (a `limit(max+1).count()` probe — early
    * stopping, never a full scan of an oversized table) and anything
    * past `maxDriverIntervals` fails loudly BEFORE the collect, the
    * same counted-gate discipline as
    * [[Components]]' `driverFinishEdges` and [[Dedup]]'s `maxBucket`
    * — an OOM'd driver reports nothing, a `require` names the fix. */
  val MaxDriverIntervals: Long = 1000000L

  def broadcastIndexed(points: DataFrame, intervals: DataFrame,
                       pointTs: String, startCol: String,
                       endCol: String,
                       maxDriverIntervals: Long = MaxDriverIntervals): DataFrame = {
    require(maxDriverIntervals > 0, "maxDriverIntervals must be positive")
    val probed = intervals.limit(
      // limit takes an Int; the gate itself may be configured larger
      if (maxDriverIntervals >= Int.MaxValue) Int.MaxValue
      else (maxDriverIntervals + 1).toInt).count()
    require(probed <= maxDriverIntervals,
      s"broadcastIndexed: interval side exceeds maxDriverIntervals=" +
        s"$maxDriverIntervals rows — a driver-side collect of this " +
        "table would OOM; use RangeJoin.binned (the distributed " +
        "formulation) or raise the gate explicitly")
    val spark = points.sparkSession
    val ivCols = intervals.columns.toSeq
    // collect as (startMicros, endMicros, full row), sorted by start
    val collected = intervals
      .select(col(startCol).cast("timestamp") +: col(endCol)
        .cast("timestamp") +: ivCols.map(col): _*)
      .collect()
      .filter(r => !r.isNullAt(0) && !r.isNullAt(1))
      .map { r =>
        (r.getTimestamp(0).getTime * 1000 + r.getTimestamp(0).getNanos / 1000 % 1000,
          r.getTimestamp(1).getTime * 1000 + r.getTimestamp(1).getNanos / 1000 % 1000,
          Row(r.toSeq.drop(2): _*))
      }
      .filter { case (s, e, _) => e > s }
      .sortBy(_._1)
    val starts = collected.map(_._1)
    val ends = collected.map(_._2)
    val ivRows = collected.map(_._3)
    val prefixMaxEnd = ends.scanLeft(Long.MinValue)(math.max).drop(1)
    val bc = spark.sparkContext.broadcast(
      (starts, ends, prefixMaxEnd, ivRows))

    val outSchema = StructType(points.schema.fields ++
      intervals.schema.fields)
    val enc = RowEncoder.encoderFor(outSchema)
    val tsIdx = points.schema.fieldIndex(pointTs)
    points.mapPartitions { it =>
      val (ss, es, maxEnds, ivs) = bc.value
      it.flatMap { row =>
        val t = row.getTimestamp(tsIdx)
        if (t == null) Iterator.empty
        else {
          val tm = t.getTime * 1000 + t.getNanos / 1000 % 1000
          // rightmost interval with start <= tm
          var lo = 0; var hi = ss.length - 1; var last = -1
          while (lo <= hi) {
            val mid = (lo + hi) >>> 1
            if (ss(mid) <= tm) { last = mid; lo = mid + 1 }
            else hi = mid - 1
          }
          // walk left while some interval in the prefix may still
          // cover tm (prefix max end > tm)
          val hits = scala.collection.mutable.ArrayBuffer.empty[Row]
          var i = last
          while (i >= 0 && maxEnds(i) > tm) {
            if (es(i) > tm)  // ss(i) <= tm holds for all i <= last
              hits += Row.merge(row, ivs(i))
            i -= 1
          }
          hits.iterator
        }
      }
    }(enc)
  }

  /** Interval-×-interval OVERLAP join (r8-cont) — the temporal-join
    * sibling of [[binned]]: pairs of half-open intervals [ls, le) ×
    * [rs, re) with ls < re ∧ rs < le, plus the exact overlap length
    * in microseconds. The sessions-×-windows / downtime-×-bookings
    * shape Spark would otherwise plan as a nested loop (two range
    * predicates, no equi key).
    *
    * Same bin discipline as [[binned]]: both sides explode to the
    * fixed-width bins they cover (the only row multiplication,
    * bounded by len/binSeconds per row), the join is a bin equi-join
    * with the exact overlap predicate residual. A pair sharing
    * SEVERAL bins must emit once: it is kept only in the FIRST
    * shared bin — `__bin == max(bin(ls), bin(rs))`, an integer
    * comparison, so no distinct pass and no pair-sized dedup shuffle.
    * Empty/inverted intervals match nothing (dropped pre-explode,
    * same rationale as [[binned]]). Column names must be disjoint. */
  def overlapBinned(left: DataFrame, right: DataFrame,
                    lStart: String, lEnd: String,
                    rStart: String, rEnd: String,
                    binSeconds: Long = 86400L): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    val clash = left.columns.toSet intersect right.columns.toSet
    require(clash.isEmpty, s"column names must be disjoint: $clash")
    require(!(left.columns ++ right.columns).contains("__bin") &&
      !(left.columns ++ right.columns).contains("overlap_micros"),
      "__bin / overlap_micros are reserved")
    val binMicros = binSeconds * 1000000L
    explodeToBins(left, lStart, lEnd, binMicros)
      .join(explodeToBins(right, rStart, rEnd, binMicros), Seq("__bin"))
      .filter(col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      .filter(col("__bin") === greatest(
        binOf(col(lStart), binMicros), binOf(col(rStart), binMicros)))
      .withColumn("overlap_micros",
        least(usOf(col(lEnd)), usOf(col(rEnd))) -
          greatest(usOf(col(lStart)), usOf(col(rStart))))
      .drop("__bin")
  }

  /** Exact-predicate overlap baseline (broadcast nested loop) —
    * the [[naive]] contract for [[overlapBinned]]. */
  def overlapNaive(left: DataFrame, right: DataFrame,
                   lStart: String, lEnd: String,
                   rStart: String, rEnd: String): DataFrame = {
    left.filter(col(lEnd) > col(lStart))
      .join(broadcast(right.filter(col(rEnd) > col(rStart))),
        col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      .withColumn("overlap_micros",
        least(usOf(col(lEnd)), usOf(col(rEnd))) -
          greatest(usOf(col(lStart)), usOf(col(rStart))))
  }
}
