package graft.etl

import graft.SparkSpec

class AnalogSpec extends SparkSpec {

  test("curatedTyped maps the Silver schema onto the case class") {
    val ds = Analog.curatedTyped(spark, "/root/testdata/sf0.001")
    val rows = ds.filter(_.booking_status == "confirmed").take(5)
    assert(rows.nonEmpty)
    rows.foreach { b =>
      assert(b.checkout_date.toLocalDate.isAfter(
        b.checkin_date.toLocalDate.minusDays(1)))
      // GBP bookings have no rate -> None; priced ones are 2dp
      b.total_price_usd.foreach { p =>
        assert(math.abs(p * 100 - math.rint(p * 100)) < 1e-6)
      }
    }
  }

  test("analog raw layers satisfy the curate contract columns") {
    val b = Analog.bookingsRaw(spark, "/root/testdata/sf0.001")
    Curate.validateColumns(b, Seq("booking_id", "user_id", "apartment_id",
      "booking_date", "checkin_date", "checkout_date", "total_price",
      "currency", "booking_status"))
    val r = Validate.run(b, Validate.bookingsChecks)
    assert(r.clean, s"testdata analog should be clean: ${r.failed}")
  }
}
