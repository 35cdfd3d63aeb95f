package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series hygiene for feature pipelines: align irregular event
  * streams onto a regular per-key grid. The reference's warehouse
  * domain stops at windowed aggregates
  * (`sql/presentation_queries.sql`); feature stores additionally
  * need every (key, period) cell PRESENT — a model trained on "one
  * row per user-day" silently drops inactivity signal if quiet days
  * vanish. Gap-filling materializes those rows and carries the last
  * observation forward (LOCF), the standard imputation for
  * slowly-changing measurements.
  *
  * Scale shape: the date spine is generated PER KEY from that key's
  * own [min, max] activity span (`sequence` + `explode`) — no global
  * range, so a 10-year-old key and a 2-day-old key cost their own
  * spans only, and spine size is Σ_key span_days, not
  * n_keys × global_days. One shuffle keys the (key, day) join, one
  * keys the LOCF window; both partition by key, never globally.
  * Values ride through UNTOUCHED (no re-aggregation arithmetic), so
  * the fill is bit-exact on any engine — q178 hash-matches the
  * DuckDB replay end-to-end. */
object Timeseries {

  /** Daily LOCF gap-fill: one row per (key, day) across each key's
    * activity span; days with no event get the previous day's value
    * and `is_gap = true`. The per-day "observation" is the value of
    * the LAST event that day, tie-broken deterministically by
    * (ts, idCol) via a single struct-max aggregate (no
    * row_number-over-everything pass).
    *
    * @param events  (keyCol, tsCol, valueCol, idCol) rows */
  def gapFillLocf(events: DataFrame, keyCol: String = "user_id",
                  tsCol: String = "ts", valueCol: String = "value",
                  idCol: String = "event_id"): DataFrame = {
    val day = to_date(date_trunc("day", col(tsCol)))
    // deterministic last-per-day: lexicographic struct max on
    // (ts, id) with the value riding behind the tie-break fields
    // both the spine bounds and the join need obs; Spark does not
    // dedupe the shared subtree, so materialize the narrow
    // (key, day, value) frame ONCE (the bm25Scored discipline) —
    // one corpus scan instead of two
    val obs = events
      .groupBy(col(keyCol), day.as("day"))
      .agg(max(struct(col(tsCol), col(idCol), col(valueCol)))
        .getField(valueCol).as("obs_value"))
      .localCheckpoint(true)
    val spine = obs.groupBy(col(keyCol))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col(keyCol),
        explode(sequence(col("d0"), col("d1"),
          expr("interval 1 day"))).as("day"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(obs, Seq(keyCol, "day"), "left")
      .select(col(keyCol), col("day"),
        last(col("obs_value"), ignoreNulls = true).over(w)
          .as("value_filled"),
        col("obs_value").isNull.as("is_gap"))
      .orderBy(keyCol, "day")
  }

  /** Robust volume-anomaly detection per (key, day) — the pipeline
    * monitoring gate: flag days whose event count deviates from the
    * key's median by more than `k` median-absolute-deviations. Median
    * + MAD instead of mean + stddev because anomalies are exactly
    * what corrupt a mean-based threshold (one 100× ingest burst
    * inflates σ enough to mask the next one); the breakdown point of
    * the median is 50%.
    *
    * EXACT arithmetic throughout — the decision rule never touches a
    * float: with integer daily counts, the median is a half-integer
    * carried as `2·median` (the two-middle-rank sum), deviations as
    * `dev2 = |2n − med2|` (integer), the MAD as `mad4 = 2·median(dev2)`
    * (the same two-rank sum), and the flag is the integer comparison
    * `2·dev2 > k·mad4` ⇔ |n − med| > k·MAD. A constant series has
    * mad4 = 0 and any deviation flags — the strictest reading, stated
    * here. The only IEEE op is the output-boundary robust score
    * (2·dev2)/mad4 (null when mad4 = 0). Median ranks tie-break on
    * (value, day) so both engines pick identical middle rows.
    *
    * Scale shape: events collapse to (key, day, n) map-side first;
    * the two median passes are windows over the per-key DAY COUNT
    * (≤ days rows per key, not events), partitioned by key — nothing
    * global anywhere. */
  def volumeAnomalies(events: DataFrame, keyCol: String = "event_type",
                      tsCol: String = "ts", k: Int = 5): DataFrame = {
    val day = to_date(date_trunc("day", col(tsCol)))
    val daily = events.groupBy(col(keyCol), day.as("day"))
      .agg(count(lit(1)).as("n_events"))
    // two-middle-rank sum = 2·median of `valueCol` over the key
    // partition, deterministically (ties → day order)
    def med2Of(df: DataFrame, valueCol: String, out: String): DataFrame = {
      val w = Window.partitionBy(col(keyCol))
        .orderBy(col(valueCol), col("day"))
      val wAll = Window.partitionBy(col(keyCol))
      val ranked = df
        .withColumn("__rn", row_number().over(w))
        .withColumn("__cnt", count(lit(1)).over(wAll))
      val lo = ceil(col("__cnt") / 2).cast("int")
      val hi = (floor(col("__cnt") / 2) + 1).cast("int")
      ranked.withColumn(out,
        sum(when(col("__rn") === lo, col(valueCol))
          .otherwise(lit(0L))).over(wAll) +
          sum(when(col("__rn") === hi, col(valueCol))
            .otherwise(lit(0L))).over(wAll))
        .drop("__rn", "__cnt")
    }
    val withMed = med2Of(daily, "n_events", "med2")
      .withColumn("dev2", abs(lit(2L) * col("n_events") - col("med2")))
    val withMad = med2Of(withMed, "dev2", "mad4")
    withMad.select(col(keyCol), col("day"), col("n_events"),
        (col("med2").cast("double") / 2.0).as("median_n"),
        (col("mad4").cast("double") / 4.0).as("mad_n"),
        when(col("mad4") =!= 0,
          (lit(2.0) * col("dev2").cast("double"))
            / col("mad4").cast("double")).as("robust_score"),
        (lit(2L) * col("dev2") > lit(k.toLong) * col("mad4"))
          .as("is_anomaly"))
      .orderBy(keyCol, "day")
  }

  /** Trailing-window activity features per (key, day): 7-day event
    * count, 7-day max value, and days since the previous active day
    * — the bread-and-butter trailing features of a feature store,
    * over OBSERVED days only (compose with [[gapFillLocf]] when the
    * dense grid is wanted). Every aggregate is order-independent
    * (long sums, max, date arithmetic) — no float accumulation — so
    * the features replay bit-exact on any engine; a trailing MEAN of
    * doubles would not (sliding-window float sums are
    * association-order-sensitive and DuckDB's segment-tree frames
    * sum in a different order than Spark's running frames).
    *
    * Scale shape: events collapse to per-(key, day) aggregates
    * map-side first; both windows share the key partitioning (one
    * shuffle), and RANGE frames are bounded by 7 rows per key-day,
    * never a key's whole history. */
  def trailingFeatures(events: DataFrame, keyCol: String = "user_id",
                       tsCol: String = "ts",
                       valueCol: String = "value"): DataFrame = {
    val day = to_date(date_trunc("day", col(tsCol)))
    val daily = events.groupBy(col(keyCol), day.as("day"))
      .agg(count(lit(1)).as("n_events"), max(col(valueCol)).as("day_max"))
    val dayNum = datediff(col("day"), to_date(lit("1970-01-01")))
    val w7 = Window.partitionBy(col(keyCol)).orderBy(dayNum)
      .rangeBetween(-6, Window.currentRow)
    val wl = Window.partitionBy(col(keyCol)).orderBy(col("day"))
    daily.select(col(keyCol), col("day"),
        sum(col("n_events")).over(w7).as("n_events_7d"),
        max(col("day_max")).over(w7).as("max_value_7d"),
        datediff(col("day"), lag(col("day"), 1).over(wl))
          .cast(org.apache.spark.sql.types.LongType)
          .as("days_since_prev"))
      .orderBy(keyCol, "day")
  }
}
