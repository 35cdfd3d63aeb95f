package graft.etl

import graft.SparkSpec

class ValidateSpec extends SparkSpec {
  import spark.implicits._

  def dirty = Seq(
    (Some(1), "confirmed", "31/01/2024", "31/01/2024", "02/02/2024", 100.0),
    (Some(2), "WHAT",      "10/02/2024", "11/02/2024", "10/02/2024", -5.0),
    (None,    "pending",   "99/99/9999", "01/01/2024", "02/01/2024", 10.0))
    .toDF("booking_id", "booking_status", "booking_date",
      "checkin_date", "checkout_date", "total_price")

  test("single-pass quality report counts each violation kind") {
    val r = Validate.run(dirty, Validate.bookingsChecks)
    assert(r.total == 3)
    assert(!r.clean)
    assert(r.violations("not_null(booking_id)") == 1)
    assert(r.violations("in_enum(booking_status)") == 1)
    assert(r.violations("parses_date(booking_date)") == 1)   // 99/99/9999
    assert(r.violations("non_negative(total_price)") == 1)
    assert(r.violations("ordered(checkin_date<=checkout_date)") == 1)
  }

  test("clean data reports clean") {
    val r = Validate.run(dirty.limit(1), Validate.bookingsChecks)
    assert(r.clean && r.total == 1)
  }

  test("dedupByKeyDeterministic keeps the minimal row per key") {
    val df = Seq((1, "b", 20), (1, "a", 10), (2, "c", 30))
      .toDF("k", "v", "x")
    val out = Curate.dedupByKeyDeterministic(df, Seq("k"), Seq("v"))
      .orderBy("k").collect()
    assert(out.map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "a"), (2, "c")))
  }
}
