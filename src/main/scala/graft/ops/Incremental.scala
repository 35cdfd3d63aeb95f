package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate (Gold-table) maintenance: keep a stored
  * per-key aggregate table and fold each new data partition into it
  * by merging PARTIAL aggregates — never rescanning history. The
  * day-N cost is O(delta) + O(|stored keys touched|), not O(all
  * history); at 100 TB that is the difference between a nightly Gold
  * refresh reading one day and reading six years. The same
  * partial/combine split Spark itself uses inside a single aggregate
  * (map-side partial_sum → final merge) — lifted across JOB runs,
  * with the stored table playing the role of the accumulated state.
  *
  * Contract: only combine-order-independent aggregates are mergeable
  * this way — counts, integer/decimal sums, min, max (and anything
  * derived from them at READ time: avg = sum/count, range = max−min,
  * variance from Σx/Σx² — q198). Double sums are NOT (IEEE addition
  * is order-sensitive; cast money to decimal first — the
  * [[graft.etl.Present.decSum]] discipline). Overflow rule: a LONG
  * sum column wraps silently past 2^63 — at warehouse row counts
  * that is reachable for money-in-cents (≈1.7e11 rows of 5e7-cent
  * orders), so cast any Σ that can grow with data volume to
  * decimal(38,0) BEFORE the partial (q198 does this for both
  * moments); plain row counts are safe. Count-distinct is not
  * mergeable exactly — use the mergeable HLL sketch
  * ([[Sketch.hllSketch]]) for that, same as the streaming state
  * twins do.
  */
object Incremental {

  /** Per-key mergeable partial aggregate of a raw slice:
    * `countCol` = count(*), plus sum/min/max per listed column
    * (output columns keep the input names prefixed `sum_`/`min_`/
    * `max_`, so a stored table and a fresh delta line up by name). */
  def partialAggregate(rows: DataFrame, keys: Seq[String],
                       sumCols: Seq[String],
                       minCols: Seq[String] = Nil,
                       maxCols: Seq[String] = Nil,
                       countCol: String = "n_rows"): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    val aggs = (count(lit(1)).as(countCol) +:
      (sumCols.map(c => sum(col(c)).as(s"sum_$c")) ++
        minCols.map(c => min(col(c)).as(s"min_$c")) ++
        maxCols.map(c => max(col(c)).as(s"max_$c"))))
    rows.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge any number of [[partialAggregate]] outputs (the stored
    * Gold plus one or more deltas) into the aggregate-over-the-union:
    * counts and sums add, mins/maxes combine. Associative and
    * commutative by construction, so deltas can arrive in any order
    * and a re-merge of already-merged state is just another merge.
    * Keys absent from one side pass through with the other side's
    * state — new keys need no backfill. */
  def merge(parts: Seq[DataFrame], keys: Seq[String],
            sumCols: Seq[String],
            minCols: Seq[String] = Nil,
            maxCols: Seq[String] = Nil,
            countCol: String = "n_rows"): DataFrame = {
    require(parts.nonEmpty, "need at least one partial aggregate")
    val aggs = (sum(col(countCol)).as(countCol) +:
      (sumCols.map(c => sum(col(s"sum_$c")).as(s"sum_$c")) ++
        minCols.map(c => min(col(s"min_$c")).as(s"min_$c")) ++
        maxCols.map(c => max(col(s"max_$c")).as(s"max_$c"))))
    parts.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
