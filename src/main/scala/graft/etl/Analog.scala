package graft.etl

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

import graft.io.Tables

/** Maps the harness testdata (TPC-H-ish, TESTDATA.md) onto the
  * reference's rental raw schema (FIXTURES.md §3 role mapping) so the
  * curate/present pipeline runs unchanged over the oracle tables:
  *
  *   orders → bookings, part → apartments, part⋈nation → attributes,
  *   events → user_viewing, literal dim → exchange_rates.
  *
  * All derivations are deterministic arithmetic on keys so the DuckDB
  * oracle (graft.etl.Oracle) can reproduce them exactly:
  *  - apartment_id = o_orderkey % 2100 → ids ≥ 2000 have no matching
  *    apartment (left-join null coverage);
  *  - booking currency = GBP for o_custkey % 97 == 0 (no rate → null
  *    usd_rate propagation), else USD/EUR/INR by o_custkey % 3;
  *  - stay = checkin (orderdate + orderkey%3 days) to checkout
  *    (+ orderkey%7 + 1 nights);
  *  - attributes exist only for p_partkey % 10 != 0 (missing-attr
  *    coverage), cityname from nation via p_partkey % 25.
  *
  * Dates are serialized to the raw layer's `dd/MM/yyyy` strings so the
  * P4 parsing operator is genuinely exercised.
  */
object Analog {

  private val rawFmt = Curate.RawDateFormat

  /** bookings ← orders (booking_id=o_orderkey, user_id=o_custkey …). */
  def bookingsRaw(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val checkin = date_add(col("o_orderdate").cast("date"),
      (col("o_orderkey") % 3).cast(IntegerType))
    val checkout = date_add(col("o_orderdate").cast("date"),
      (col("o_orderkey") % 3 + col("o_orderkey") % 7 + 1).cast(IntegerType))
    o.select(
      col("o_orderkey").as("booking_id"),
      col("o_custkey").as("user_id"),
      (col("o_orderkey") % 2100).as("apartment_id"),
      date_format(col("o_orderdate"), rawFmt).as("booking_date"),
      date_format(checkin, rawFmt).as("checkin_date"),
      date_format(checkout, rawFmt).as("checkout_date"),
      col("o_totalprice").as("total_price"),
      when(col("o_custkey") % 97 === 0, "GBP")
        .when(col("o_custkey") % 3 === 0, "USD")
        .when(col("o_custkey") % 3 === 1, "EUR")
        .otherwise("INR").as("currency"),
      when(col("o_orderstatus") === "F", "confirmed")
        .when(col("o_orderstatus") === "O", "pending")
        .otherwise("canceled").as("booking_status"))
  }

  /** apartments ← part (id=p_partkey, price=p_retailprice …). */
  def apartmentsRaw(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir).select(
      col("p_partkey").as("id"),
      col("p_name").as("title"),
      col("p_brand").as("source"),
      col("p_retailprice").as("price"),
      when(col("p_partkey") % 3 === 0, "USD")
        .when(col("p_partkey") % 3 === 1, "EUR")
        .otherwise("INR").as("currency"),
      date_format(
        date_add(to_date(lit("1995-01-01")),
          (col("p_partkey") % 1000).cast(IntegerType)), rawFmt)
        .as("listing_created_on"),
      (col("p_size") % 2 === 0).as("is_active"))

  /** apartment_attributes ← part ⋈ nation (cityname = n_name);
    * only p_partkey % 10 != 0 rows exist → left-join miss coverage. */
  def attributesRaw(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir).filter(col("p_partkey") % 10 =!= 0)
    val n = Tables.nation(spark, dir)
    p.join(broadcast(n), col("p_partkey") % 25 === n("n_nationkey"))
      .select(
        col("p_partkey").as("id"),
        col("p_type").as("category"),
        (col("p_size") % 4).as("bathrooms"),
        (col("p_size") % 5).as("bedrooms"),
        (col("p_size") * 100).as("square_feet"),
        col("n_name").as("cityname"))
  }

  /** user_viewing ← events (viewed_at=ts, call_to_action=event_type). */
  def userViewingRaw(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      col("user_id"),
      (col("event_id") % 2100).as("apartment_id"),
      date_format(col("ts"), rawFmt).as("viewed_at"),
      (col("event_type") === "view").as("is_wishlisted"),
      col("event_type").as("call_to_action"))

  /** Apartments with price_usd (J1 output — input to the weekly
    * listing-price metric, ref `curated_tranformation.py:184-190`). */
  def apartmentsConverted(spark: SparkSession, dir: String): DataFrame =
    Curate.convertApartmentPrices(
      Curate.parseRawDates(Curate.dedup(apartmentsRaw(spark, dir)),
        Seq("listing_created_on")),
      Tables.exchangeRates(spark))

  /** The curated wide table over testdata — the full Bronze→Silver
    * pipeline (dedup → parse → convert → 3-way left join → project). */
  def curated(spark: SparkSession, dir: String): DataFrame =
    Curate.curate(
      bookingsRaw(spark, dir),
      apartmentsRaw(spark, dir),
      attributesRaw(spark, dir),
      Tables.exchangeRates(spark))

  /** Typed Silver-layer view: compile-time field checks via the
    * case-class Encoder (`Dataset[T]` at layer boundaries,
    * `DataFrame` inside transforms — SURVEY §7.1). */
  def curatedTyped(spark: SparkSession, dir: String)
      : Dataset[graft.model.Schemas.CuratedBooking] = {
    import spark.implicits._
    curated(spark, dir).as[graft.model.Schemas.CuratedBooking]
  }
}
