package graft.dev

import org.apache.spark.sql.functions.{col, date_format, expr}

import graft.Pipeline
import graft.etl.{Analog, Curate}

/** Late-fold cost at sf0.1: bootstrap state over all months with
  * every 3rd booking of one mid-history month withheld, then time
  * `runIncrementalLate` delivering those rows against a full
  * `Pipeline.run` rebuild. */
object ProfileLateFold {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local()
    val root = s"${sys.props("java.io.tmpdir")}/graft_latefold"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))

    import spark.implicits._
    val bookingMonths = Analog.curated(spark, sfDir)
      .select(date_format(col("booking_date"), "yyyy-MM").as("m"))
      .distinct().as[String].collect().sorted
    val listingMonths = Analog.apartmentsConverted(spark, sfDir)
      .select(date_format(col("listing_created_on"), "yyyy-MM").as("m"))
      .distinct().as[String].collect()
    val months = (bookingMonths ++ listingMonths).toSet.toSeq.sorted
    val lateMonth = bookingMonths(bookingMonths.length / 2)

    val raw = Analog.bookingsRaw(spark, sfDir)
    val monthOfRaw = date_format(
      expr(s"try_to_date(booking_date, '${Curate.RawDateFormat}')"),
      "yyyy-MM")
    val isLate = monthOfRaw === lateMonth && col("booking_id") % 3 === 0
    val lateRows = raw.filter(isLate).localCheckpoint(true)
    println(s"[latefold] lateMonth=$lateMonth lateRows=${lateRows.count()}")

    months.grouped(12).foreach { w =>
      Pipeline.runIncrementalWindow(spark, sfDir, s"$root/incr", w,
        writeGold = false, rawBookings = Some(raw.filter(!isLate)))
    }
    def timed(l: String)(body: => Unit): Double = {
      val t0 = System.nanoTime(); body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[latefold] $l: $s%.2f s"); s
    }
    val fullT = timed("full_rebuild")(
      Pipeline.run(spark, sfDir, s"$root/full"): Unit)
    val lateT = timed("late_fold")(
      Pipeline.runIncrementalLate(spark, sfDir, s"$root/incr", lateRows): Unit)
    println(f"[latefold] late/full = ${lateT / fullT}%.2f")
    spark.stop()
  }
}
