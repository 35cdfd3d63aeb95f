package graft.dev

import org.apache.spark.sql.functions.{col, date_format, expr, lit, when}

import graft.Pipeline
import graft.etl.Analog

/** Bench's `incremental.nightly_wall` came in at 62 s at sf0.1 on its
  * first run — ~6× the single-month fold wall. Reproduce the bench's
  * composed night phase by phase (the stage log prints each wall) to
  * see whether the cost is the composition machinery (manifest,
  * dispatch, publish) or one repair's data share.
  */
object ProfileNightly {
  private def timed(name: String)(body: => Unit): Unit = {
    val t0 = System.nanoTime()
    body
    println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs")
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    import spark.implicits._
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = s"${sys.props("java.io.tmpdir")}/graft_prof_nightly"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))

    val months = (Analog.curated(spark, sfDir)
        .select(date_format(col("booking_date"), "yyyy-MM").as("m"))
        .distinct().collect().map(_.getString(0)) ++
      Analog.apartmentsConverted(spark, sfDir)
        .select(date_format(col("listing_created_on"), "yyyy-MM").as("m"))
        .distinct().collect().map(_.getString(0))).toSet.toSeq.sorted
    timed("build") {
      months.grouped(24).foreach { w =>
        Pipeline.runIncrementalWindow(spark, sfDir, out, w,
          writeGold = false)
      }
    }

    val lateMonth = months(months.size / 2)
    val bMonth = date_format(expr(
      s"try_to_date(booking_date, '${graft.etl.Curate.RawDateFormat}')"),
      "yyyy-MM")
    val lateSynth = Analog.bookingsRaw(spark, sfDir)
      .filter(bMonth === lateMonth && col("booking_id") % 97 === 0)
      .withColumn("booking_id", col("booking_id") + 10000000L)
    val attrMove = Analog.attributesRaw(spark, sfDir)
      .withColumn("cityname",
        when(col("id") % 13 === 5, lit("ATLANTIS"))
          .otherwise(col("cityname")))
    val rateFix = Seq(("EUR", 1.2)).toDF("currency", "usd_rate")

    timed("nightly(attr+rate+late)") {
      Pipeline.runNightly(spark, sfDir, out,
        Pipeline.NightlyDeltas(
          attributeUpdates = Some(attrMove),
          rateUpdates = Some(rateFix),
          lateBookings = Some(lateSynth)))
    }
    spark.stop()
  }
}
