package graft.etl

import java.sql.Date

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Presentation metrics over a minimal hand-computed curated fixture.
  * Covers the 30-day LAG repeat rule (gaps 10d and 40d), occupancy
  * arithmetic, Monday week-trunc alignment, and ordering. */
class PresentSpec extends SparkSpec {
  import spark.implicits._

  // user 1: bookings 10 days apart (repeat), then 40 days (not);
  // user 2: single booking; user 3: canceled only.
  def curated: DataFrame = Seq(
    (1L, 1L, 100L, "2024-01-01", "2024-01-02", "2024-01-04", "confirmed", 100.0, "Berlin"),
    (2L, 1L, 100L, "2024-01-11", "2024-01-12", "2024-01-13", "confirmed", 100.0, "Berlin"),
    (3L, 1L, 101L, "2024-02-20", "2024-02-21", "2024-02-25", "confirmed", 200.0, "Pune"),
    (4L, 2L, 101L, "2024-01-08", "2024-01-09", "2024-01-09", "confirmed", 300.0, "Pune"),
    (5L, 3L, 100L, "2024-01-05", "2024-01-06", "2024-01-07", "canceled", 400.0, "Berlin")
  ).toDF("booking_id", "user_id", "apartment_id", "bd", "ci", "co",
      "booking_status", "total_price_usd", "cityname")
    .withColumn("booking_date", $"bd".cast("date"))
    .withColumn("checkin_date", $"ci".cast("date"))
    .withColumn("checkout_date", $"co".cast("date"))
    .drop("bd", "ci", "co")

  test("monthlyRepeatRate: 10d gap repeats, 40d gap does not (W1+A7)") {
    val rows = Present.monthlyRepeatRate(curated).collect()
    val jan = rows.find(_.getDate(0) == Date.valueOf("2024-01-01")).get
    assert(jan.getLong(1) == 1)   // user 1 repeated in Jan
    assert(jan.getLong(2) == 2)   // users {1, 2} confirmed in Jan
    assert(jan.getDouble(3) == 50.0)
    val feb = rows.find(_.getDate(0) == Date.valueOf("2024-02-01")).get
    assert(feb.getLong(1) == 0)   // 40-day gap: not a repeat
    assert(feb.getLong(2) == 1)
  }

  test("monthlyOccupancy: nights / (apartments x days-in-month) (A2)") {
    val jan = Present.monthlyOccupancy(curated).collect()
      .find(_.getDate(0) == Date.valueOf("2024-01-01")).get
    // confirmed Jan checkins: b1 (2 nights), b2 (1), b4 (0) over 2
    // distinct apartments; Jan has 31 days -> 3*100/(2*31) = 4.83...
    assert(jan.getLong(1) == 3)        // total_bookings
    assert(jan.getLong(2) == 3)        // booked_nights
    assert(jan.getDouble(3) == 4.84)   // floor(4.838..*100+0.5)/100
  }

  test("weeklyPopularCities: Monday week start, count desc (A3)") {
    val rows = Present.weeklyPopularCities(curated).collect()
    // 2024-01-01 is a Monday; booking 1 falls in that week.
    assert(rows.head.getDate(0) == Date.valueOf("2024-01-01"))
    assert(rows.head.getAs[String]("cityname") == "Berlin")
    // canceled booking 5 excluded everywhere.
    assert(rows.map(_.getLong(2)).sum == 4)
  }

  test("weeklyTopListings: revenue sums, desc within week (A4)") {
    val rows = Present.weeklyTopListings(curated).collect()
    val wk0108 = rows.filter(_.getDate(0) == Date.valueOf("2024-01-08"))
    // week of Jan 8: booking 2 (apt 100, 100.0) + booking 4 (apt 101, 300.0).
    assert(wk0108.map(r => (r.getLong(1), r.getDouble(2))).toSeq ==
      Seq((101L, 300.0), (100L, 100.0)))
  }

  test("bookingsPerUser counts confirmed only (A5 + P8)") {
    val m = Present.bookingsPerUser(curated).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(1L -> 3L, 2L -> 1L))
  }

  test("monthlyAvgDuration (A6)") {
    val jan = Present.monthlyAvgDuration(curated).collect()
      .find(_.getDate(0) == Date.valueOf("2024-01-01")).get
    assert(jan.getDouble(1) == 1.0)   // (2+1+0)/3
  }

  test("monthlyAvgDuration groups by CHECKIN month, not booking month (A6)") {
    // booking Jan 31, checkin Feb 1 — the reference's
    // DATE_TRUNC('month', checkin_date) puts it in FEBRUARY
    val straddle = Seq(
      (9L, 9L, 100L, "2024-01-31", "2024-02-01", "2024-02-05", "confirmed",
        100.0, "Berlin"))
      .toDF("booking_id", "user_id", "apartment_id", "bd", "ci", "co",
        "booking_status", "total_price_usd", "cityname")
      .withColumn("booking_date", $"bd".cast("date"))
      .withColumn("checkin_date", $"ci".cast("date"))
      .withColumn("checkout_date", $"co".cast("date"))
      .drop("bd", "ci", "co")
    val rows = Present.monthlyAvgDuration(straddle).collect()
    assert(rows.map(_.getDate(0)).toSeq == Seq(Date.valueOf("2024-02-01")))
    assert(rows.head.getDouble(1) == 4.0)
  }

  test("weeklyPopularCities keeps the null-city group (§2.10.12)") {
    val withNull = curated.withColumn("cityname",
      when($"booking_id" === 4L, lit(null: String)).otherwise($"cityname"))
    val rows = Present.weeklyPopularCities(withNull).collect()
    // booking 4 (week of Jan 8) now groups under NULL — the reference
    // has no cityname filter, so the group must survive and sort first
    val wk0108 = rows.filter(_.getDate(0) == Date.valueOf("2024-01-08"))
    assert(wk0108.length == 2)
    assert(wk0108.map(r => Option(r.getAs[String]("cityname"))).toSeq ==
      Seq(None, Some("Berlin")))  // counts tie at 1; nulls first
  }

  test("weeklyTopListings keeps all-null-price groups as null revenue (§2.10.13)") {
    val withNull = curated.withColumn("total_price_usd",
      when($"booking_id" === 4L, lit(null: java.lang.Double))
        .otherwise($"total_price_usd"))
    val rows = Present.weeklyTopListings(withNull).collect()
    val wk0108 = rows.filter(_.getDate(0) == Date.valueOf("2024-01-08"))
    // apt 101's only priced row nulled: group survives, revenue null,
    // sorts after the priced group (desc nulls last)
    assert(wk0108.map(r => (r.getLong(1),
      Option(r.getAs[java.lang.Double]("weekly_revenue")))).toSeq ==
      Seq((100L, Some(100.0)), (101L, None)))
  }

  test("weeklyAvgListingPrice over converted apartments (A1)") {
    val apts = Seq(
      (1L, "2024-01-01", 100.0), (2L, "2024-01-03", 200.0),
      (3L, "2024-01-10", 50.0))
      .toDF("id", "lc", "price_usd")
      .withColumn("listing_created_on", $"lc".cast("date")).drop("lc")
    val rows = Present.weeklyAvgListingPrice(apts).collect()
    assert(rows.map(r => (r.getDate(0), r.getDouble(1))).toSeq == Seq(
      (Date.valueOf("2024-01-01"), 150.0),
      (Date.valueOf("2024-01-08"), 50.0)))
  }
}
