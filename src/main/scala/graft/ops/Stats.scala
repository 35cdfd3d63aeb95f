package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table profiling — the per-column completeness / cardinality /
  * range summary every ingest gate publishes before a table is
  * trusted (the Deequ / Great Expectations "analyzer" shape): for
  * each column, row count, null count, distinct count, and rendered
  * min/max.
  *
  * Shape at 100 TB: ONE full scan computes every column's aggregates
  * together; the only wide step is the multi-column exact distinct,
  * which Catalyst plans as an Expand (one duplicated row per
  * distinct-aggregate) — an n_cols× map-side blowup that partial
  * aggregation collapses before the exchange. When exact
  * cardinalities aren't required, `approxDistinct = true` swaps in
  * HyperLogLog++ sketches: no Expand, one ordinary partial aggregate,
  * the profile of choice for a first pass over an unknown 100 TB
  * table (exact stays the default because it is oracle-checkable).
  *
  * Rendering: min/max cross engines as strings, so each column
  * carries a render function chosen where the caller knows the type
  * (doubles go through the money floor, timestamps through an
  * explicit format — never engine-default double/timestamp
  * stringification, which differs between JVM and C).
  *
  * Reference scope note: the reference validates column SETS only
  * (`curated_tranformation.py` column checks); value-level profiling
  * extends the training-data surface (SURVEY.md north star).
  */
object Stats {

  /** Render a double as fixed 2-decimal (the house `money` floor —
    * floor(x·100 + 0.5)/100 — through DECIMAL so both engines print
    * identically). */
  val money2: Column => Column = c =>
    (floor(c * lit(100.0) + lit(0.5)) / lit(100.0))
      .cast("decimal(18,2)").cast("string")

  /** Render any directly string-castable type (string, integral,
    * date). */
  val asString: Column => Column = _.cast("string")

  /** Render a timestamp with explicit micros (engine-default
    * timestamp→string differs in fraction padding). */
  val tsMicros: Column => Column = c =>
    date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")

  /** One row per profiled column: (column, n_rows, n_nulls,
    * n_distinct, min_value, max_value) — render maps min/max to
    * strings. n_distinct counts non-null values. */
  def profileColumns(df: DataFrame,
                     specs: Seq[(String, Column => Column)],
                     approxDistinct: Boolean = false): DataFrame = {
    require(specs.nonEmpty, "profileColumns needs at least one column")
    val aggs = specs.flatMap { case (name, render) =>
      val c = col(name)
      Seq(
        count(lit(1)).as(s"__n_$name"),
        (count(lit(1)) - count(c)).as(s"__nulls_$name"),
        (if (approxDistinct) approx_count_distinct(c)
         else countDistinct(c)).as(s"__dist_$name"),
        render(min(c)).as(s"__min_$name"),
        render(max(c)).as(s"__max_$name"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single stats row: one struct per column, exploded —
    // n_cols output rows from a 1-row input, no shuffle
    val rows = specs.map { case (name, _) =>
      struct(lit(name).as("column"),
        col(s"__n_$name").as("n_rows"),
        col(s"__nulls_$name").as("n_nulls"),
        col(s"__dist_$name").as("n_distinct"),
        col(s"__min_$name").as("min_value"),
        col(s"__max_$name").as("max_value"))
    }
    one.select(explode(array(rows: _*)).as("r"))
      .select(col("r.column"), col("r.n_rows"), col("r.n_nulls"),
        col("r.n_distinct"), col("r.min_value"), col("r.max_value"))
      .orderBy("column")
  }
}
