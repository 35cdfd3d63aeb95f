package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import Curate.money

/** Gold-layer presentation metrics (SURVEY.md §2.4–§2.6) — the 7
  * analytical queries of `spark-job/apps/present_summary.py`,
  * re-expressed in the DataFrame API over the curated wide table.
  *
  * Determinism rules (so the DuckDB oracle hash-matches, SURVEY §7.4):
  *  - double sums go through `DECIMAL(18,2)` ([[decSum]]) — exact and
  *    order-independent, so partial-aggregation order can't perturb
  *    the result (also true on a 1000-executor cluster);
  *  - 2-decimal rounding is [[Curate.money]] (bit-exact IEEE ops);
  *  - every output carries an ORDER BY over a unique key;
  *  - window ordering gets a `booking_id` tie-break (the reference's
  *    bare `ORDER BY booking_date`, `present_summary.py:147`, is
  *    nondeterministic when a user books twice in a day).
  *
  * Scale notes: all aggregations are partial+final hash aggs; the only
  * wide operations are one shuffle per groupBy key and the repeat-rate
  * window's shuffle by user_id. Final `orderBy` is a presentation-only
  * global sort (range partitioned; drop it when feeding downstream
  * jobs).
  */
object Present {

  /** date_trunc returns timestamp; keep DATE in the gold layer
    * (SURVEY §2.10.6). Monday-start weeks in Spark and DuckDB. */
  def weekOf(c: Column): Column  = date_trunc("week", c).cast("date")
  def monthOf(c: Column): Column = date_trunc("month", c).cast("date")

  /** Order-independent exact sum of a 2-decimal monetary double. */
  def decSum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  private def confirmed(curated: DataFrame): DataFrame =
    curated.filter(col("booking_status") === "confirmed")

  /** A1 — weekly average listing price in USD
    * (ref `curated_tranformation.py:184-190`). Input: apartments with
    * price_usd (J1 output), not the curated table. */
  def weeklyAvgListingPrice(apartmentsConverted: DataFrame): DataFrame =
    apartmentsConverted
      .groupBy(weekOf(col("listing_created_on")).as("week_start"))
      .agg(money(decSum(col("price_usd")) / count(col("price_usd")))
        .as("avg_price_usd"))
      .orderBy("week_start")

  /** A2 — monthly occupancy rate (ref `present_summary.py:81-97`):
    * booked nights ÷ (distinct apartments × days in month). The month
    * length comes from the GROUP BY key, not `ANY_VALUE` — identical
    * result, deterministic plan (SURVEY §2.10.5). */
  def monthlyOccupancy(curated: DataFrame): DataFrame = {
    val nights = sum(datediff(col("checkout_date"), col("checkin_date"))
      .cast(LongType))
    confirmed(curated)
      .groupBy(monthOf(col("checkin_date")).as("month_start"))
      .agg(
        count(lit(1)).as("total_bookings"),
        nights.as("booked_nights"),
        money(nights * lit(100.0) /
          (countDistinct(col("apartment_id")) *
            dayofmonth(last_day(monthOf(col("checkin_date"))))))
          .as("occupancy_rate"))
      .orderBy("month_start")
  }

  /** A3 — weekly most popular cities (ref `present_summary.py:99-108`).
    * Unattributed bookings (null cityname) form their own group, as in
    * the reference, which has no null filter (SURVEY §2.10.12); the
    * cityname tie-break pins them first. */
  def weeklyPopularCities(curated: DataFrame): DataFrame =
    confirmed(curated)
      .groupBy(weekOf(col("booking_date")).as("week_start"), col("cityname"))
      .agg(count(lit(1)).as("total_bookings"))
      .orderBy(col("week_start"), col("total_bookings").desc,
        col("cityname").asc_nulls_first)

  /** A4 — weekly top-revenue listings (ref `present_summary.py:110-119`).
    * No null-price filter, as in the reference: a (week, apartment)
    * group whose prices are ALL null (unconvertible currency) keeps
    * its row with null revenue (SURVEY §2.10.13). */
  def weeklyTopListings(curated: DataFrame): DataFrame =
    confirmed(curated)
      .groupBy(weekOf(col("booking_date")).as("week_start"), col("apartment_id"))
      .agg(decSum(col("total_price_usd")).as("weekly_revenue"))
      .orderBy(col("week_start"), col("weekly_revenue").desc_nulls_last,
        col("apartment_id"))

  /** A5 — total bookings per user (ref `present_summary.py:121-130`). */
  def bookingsPerUser(curated: DataFrame): DataFrame =
    confirmed(curated)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("total_bookings"))
      .orderBy("user_id")

  /** A6 — monthly average booking duration (ref `present_summary.py:132-140`).
    * Groups by CHECKIN month, exactly as the reference's
    * `DATE_TRUNC('month', checkin_date)` does — NOT booking month
    * (the two genuinely diverge: checkin trails booking by up to ~9
    * days in the analog, so end-of-month bookings change rows). */
  def monthlyAvgDuration(curated: DataFrame): DataFrame =
    confirmed(curated)
      .groupBy(monthOf(col("checkin_date")).as("month_start"))
      .agg(money(
        sum(datediff(col("checkout_date"), col("checkin_date")).cast(LongType))
          .cast(DoubleType) / count(lit(1)))
        .as("avg_duration_days"))
      .orderBy("month_start")

  /** A7 + W1 + P10 — monthly repeat-customer rate
    * (ref `present_summary.py:142-181`): LAG previous booking per user,
    * flag gaps ≤ 30 days, conditional distinct count per month. The
    * 30-day rule is consecutive-gap, not rolling-window — that is what
    * the reference computes (SURVEY §2.10.7). */
  def monthlyRepeatRate(curated: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("booking_date"), col("booking_id"))
    val flagged = confirmed(curated)
      .select(col("user_id"), col("booking_id"), col("booking_date"))
      .withColumn("prev_date", lag(col("booking_date"), 1).over(w))
      .withColumn("is_repeat",
        when(col("prev_date").isNotNull &&
          datediff(col("booking_date"), col("prev_date")) <= 30, 1)
          .otherwise(0))
    val repeatUsers =
      countDistinct(when(col("is_repeat") === 1, col("user_id")))
    flagged
      .groupBy(monthOf(col("booking_date")).as("month_start"))
      .agg(
        repeatUsers.as("repeat_customers"),
        countDistinct(col("user_id")).as("total_customers"),
        money(repeatUsers * lit(100.0) / countDistinct(col("user_id")))
          .as("repeat_rate_pct"))
      .orderBy("month_start")
  }

  /** Extension of A-family over user_viewing/events (SURVEY §2.10.1 —
    * the reference ingests user_viewing but never uses it): weekly
    * engagement per event type. max(value) instead of sum keeps the
    * double output bit-exact without a decimal detour. */
  def weeklyEngagement(events: DataFrame): DataFrame =
    events
      .groupBy(weekOf(col("ts")).as("week_start"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        max(col("value")).as("max_value"))
      .orderBy(col("week_start"), col("event_type"))
}
