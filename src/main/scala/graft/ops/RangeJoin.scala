package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
    * bin(end - 1µs))` bin ids — the ONLY row multiplication, bounded
    * by interval_len/binSeconds — then the join is a plain equi-join
    * on `__bin` with the exact range predicate as a residual filter.
    * Reserved column `__bin` is dropped from the output. */
  def binned(points: DataFrame, intervals: DataFrame,
             pointTs: String, startCol: String, endCol: String,
             binSeconds: Long = 86400L): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    require(!(points.columns ++ intervals.columns).contains("__bin"),
      "__bin is reserved")
    def binOf(t: Column): Column =
      floor(unix_timestamp(t) / lit(binSeconds.toDouble)).cast("long")

    val p = points.withColumn("__bin", binOf(col(pointTs)))
    // end is exclusive: the last covered bin is bin(end - 1 second)
    // (timestamps here have second granularity at coarsest; using
    // end-1s keeps the sequence exact for second-aligned intervals
    // and merely admits one extra candidate bin otherwise — the
    // residual predicate removes any false positives).
    // empty/inverted intervals ([start,end) with end <= start) match
    // nothing — drop them BEFORE the explode: sequence(hi, lo) counts
    // DOWNWARD in Spark, so an inverted interval would otherwise fan
    // out to spurious bins (filtered later, but paid for in the join)
    val i = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__bin",
        explode(sequence(binOf(col(startCol)),
          binOf(col(endCol) - expr("INTERVAL 1 SECOND")))))

    p.join(i, Seq("__bin"))
      .filter(col(pointTs) >= col(startCol) && col(pointTs) < col(endCol))
      .drop("__bin")
  }
}
