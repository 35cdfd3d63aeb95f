package graft.etl

import java.sql.Date

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit fixtures per FIXTURES.md §2: hand-checkable rows exercising
  * dedup, dd/MM/yyyy parsing, left-join null propagation (unknown
  * currency, apartment without attributes, booking without apartment),
  * and the typed projection. */
class CurateSpec extends SparkSpec {
  import spark.implicits._

  // 5 bookings rows: one exact duplicate (b1), currencies
  // {USD, EUR, XXX-unknown}, statuses {confirmed, canceled},
  // month-boundary stay (31/01 -> 02/02).
  def bookingsRaw: DataFrame = Seq(
    (1, 10, 100, "31/01/2024", "31/01/2024", "02/02/2024", 200.0, "USD", "confirmed"),
    (1, 10, 100, "31/01/2024", "31/01/2024", "02/02/2024", 200.0, "USD", "confirmed"),
    (2, 10, 101, "10/02/2024", "11/02/2024", "11/02/2024", 300.0, "EUR", "confirmed"),
    (3, 20, 999, "15/02/2024", "16/02/2024", "20/02/2024", 500.0, "XXX", "confirmed"),
    (4, 20, 100, "20/02/2024", "21/02/2024", "23/02/2024", 100.0, "USD", "canceled")
  ).toDF("booking_id", "user_id", "apartment_id", "booking_date",
    "checkin_date", "checkout_date", "total_price", "currency",
    "booking_status")

  // 3 apartments; id=999 is referenced by no apartment row (booking 3
  // misses). id=101 has no attributes row.
  def apartmentsRaw: DataFrame = Seq(
    (100, "Loft A", "Airbnb", 120.0, "USD", "01/01/2024", true),
    (101, "Loft B", "Zillow", 80.0, "EUR", "07/01/2024", false),
    (102, "Loft C", "Airbnb", 9000.0, "INR", "08/01/2024", true)
  ).toDF("id", "title", "source", "price", "currency",
    "listing_created_on", "is_active")

  def attributesRaw: DataFrame = Seq(
    (100, "Studio", 1, 1, 400, "Berlin"),
    (102, "2BHK", 2, 2, 900, "Pune")
  ).toDF("id", "category", "bathrooms", "bedrooms", "square_feet",
    "cityname")

  def rates: DataFrame = graft.io.Tables.exchangeRates(spark)

  lazy val curated: DataFrame =
    Curate.curate(bookingsRaw, apartmentsRaw, attributesRaw, rates)
      .orderBy("booking_id").cache()

  test("dedup removes the exact duplicate row (P1)") {
    assert(curated.count() == 4)
    assert(Curate.dedup(bookingsRaw).count() == 4)
  }

  test("dd/MM/yyyy strings parse to typed dates (P4)") {
    val r = curated.filter($"booking_id" === 1)
      .select($"booking_date", $"checkin_date", $"checkout_date")
      .head()
    assert(r.getDate(0) == Date.valueOf("2024-01-31"))
    assert(r.getDate(2) == Date.valueOf("2024-02-02"))
  }

  test("currency conversion via broadcast dim (J1/J4 + P5)") {
    val byId = curated.select($"booking_id", $"total_price_usd", $"price_usd")
      .collect().map(r => r.getAs[Number](0).longValue -> r).toMap
    assert(byId(1L).getDouble(1) == 200.0)          // USD x1.0
    assert(byId(2L).getDouble(1) == 330.0)          // EUR x1.1
    assert(byId(2L).getDouble(2) == 88.0)           // apt 101: 80 EUR
    assert(byId(1L).getDouble(2) == 120.0)          // apt 100: USD
  }

  test("unknown currency propagates null USD amounts (left join)") {
    val r = curated.filter($"booking_id" === 3).head()
    assert(r.isNullAt(r.fieldIndex("total_price_usd")))
  }

  test("booking without matching apartment gets null apartment cols") {
    val r = curated.filter($"booking_id" === 3).head()
    assert(r.isNullAt(r.fieldIndex("price")))
    assert(r.isNullAt(r.fieldIndex("title")))
    assert(r.isNullAt(r.fieldIndex("cityname")))
  }

  test("apartment without attributes gets null attr cols only") {
    val r = curated.filter($"booking_id" === 2).head()
    assert(r.getAs[String]("title") == "Loft B")
    assert(r.isNullAt(r.fieldIndex("category")))
    assert(r.isNullAt(r.fieldIndex("cityname")))
  }

  test("validateColumns rejects missing columns (P9)") {
    val thrown = intercept[IllegalArgumentException] {
      Curate.validateColumns(bookingsRaw.drop("currency"),
        Seq("booking_id", "currency"))
    }
    assert(thrown.getMessage.contains("currency"))
  }

  test("money() is bit-exact floor-based 2dp rounding") {
    val df = Seq(2.675, 1.005, 0.0, 123.456).toDF("x")
      .select(Curate.money($"x").as("m"))
    // IEEE semantics on the BINARY double: 2.675*100.0 rounds up to
    // exactly 267.5 -> 2.68, while 1.005*100.0 = 100.4999.. -> 1.0.
    assert(df.collect().map(_.getDouble(0)).toSeq ==
      Seq(2.68, 1.0, 0.0, 123.46))
  }
}
