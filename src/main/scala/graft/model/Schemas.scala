package graft.model

import org.apache.spark.sql.types._

/** Declared schemas for the rental-domain raw layer (FIXTURES.md §1,
  * from the reference DDL `scripts/init_db.sql:11-80` and the declared
  * StructTypes `curated_tranformation.py:17-69`). Explicit schemas —
  * never inferred: inference costs a full extra pass at scale and
  * breaks on dirty rows.
  */
object Schemas {

  val apartmentAttributes: StructType = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("category", StringType),
    StructField("body", StringType),
    StructField("amenities", StringType),
    StructField("bathrooms", IntegerType),
    StructField("bedrooms", IntegerType),
    StructField("fee", DecimalType(5, 2)),
    StructField("has_photo", BooleanType),
    StructField("pets_allowed", BooleanType),
    StructField("price_display", StringType),
    StructField("price_type", StringType),
    StructField("square_feet", IntegerType),
    StructField("address", StringType),
    StructField("cityname", StringType),
    StructField("state", StringType),
    StructField("latitude", DecimalType(9, 6)),
    StructField("longitude", DecimalType(9, 6))))

  val userViewing: StructType = StructType(Seq(
    StructField("user_id", IntegerType, nullable = false),
    StructField("apartment_id", IntegerType, nullable = false),
    StructField("viewed_at", StringType),      // dd/MM/yyyy
    StructField("is_wishlisted", BooleanType),
    StructField("call_to_action", StringType)))

  val apartments: StructType = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("title", StringType),
    StructField("source", StringType),
    StructField("price", DecimalType(6, 2)),
    StructField("currency", StringType),
    StructField("listing_created_on", StringType),       // dd/MM/yyyy
    StructField("last_modified_timestamp", StringType),  // dd/MM/yyyy
    StructField("is_active", BooleanType)))

  val bookings: StructType = StructType(Seq(
    StructField("booking_id", IntegerType, nullable = false),
    StructField("user_id", IntegerType),
    StructField("apartment_id", IntegerType),
    StructField("booking_date", StringType),   // dd/MM/yyyy
    StructField("checkin_date", StringType),
    StructField("checkout_date", StringType),
    StructField("total_price", DecimalType(7, 2)),
    StructField("currency", StringType),
    StructField("booking_status", StringType)))

  /** Curated wide-table row (Silver layer), typed. */
  case class CuratedBooking(
      booking_id: Long, user_id: Long, apartment_id: Long,
      booking_date: java.sql.Date, checkin_date: java.sql.Date,
      checkout_date: java.sql.Date, booking_status: String,
      total_price: Double, total_price_usd: Option[Double],
      currency: String,
      price: Option[Double], price_usd: Option[Double],
      title: Option[String], source: Option[String],
      is_active: Option[Boolean],
      listing_created_on: Option[java.sql.Date],
      category: Option[String], bedrooms: Option[Int],
      bathrooms: Option[Int], square_feet: Option[Int],
      cityname: Option[String])
}
