package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.etl.{Analog, Curate, Present}

/** Exchange-rate dimension updates (r10 verdict ask #3): the THIRD
  * reference dim (`curated_tranformation.py:121-125` is a literal rate
  * table) gets the same repair algebra as apartments/attributes. A
  * corrected rate re-derives the two USD columns across every Silver
  * row of that currency and repairs the two USD-sourced states; this
  * spec proves the fold lands Silver AND all 7 Gold tables
  * row-bit-identical to a full rebuild over the corrected rates —
  * covering a rate fix (EUR), a rate ADDED for a currency the dim
  * lacked (GBP: bookings exist with null USD columns that must fill
  * in), a no-op row, idempotent redelivery, and rollback refusal.
  * The second test measures the scale story: when the affected
  * currency is confined to few months, ONLY those months' Silver
  * files rewrite (file census), mirroring PipelineDimSpec's
  * O(touched) evidence.
  */
class PipelineRateSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq

  private def goldOver(curated: DataFrame, aptConv: DataFrame) = Map(
    "average_listing_price"  -> Present.weeklyAvgListingPrice(aptConv),
    "occupancy_rate"         -> Present.monthlyOccupancy(curated),
    "most_popular_location"  -> Present.weeklyPopularCities(curated),
    "top_performing_listing" -> Present.weeklyTopListings(curated),
    "bookings_per_user"      -> Present.bookingsPerUser(curated),
    "avg_booking_duration"   -> Present.monthlyAvgDuration(curated),
    "repeat_customer_rate"   -> Present.monthlyRepeatRate(curated))

  private def convert(dim: DataFrame, rates: DataFrame) =
    Curate.convertApartmentPrices(
      Curate.parseRawDates(Curate.dedup(dim), Seq("listing_created_on")),
      rates)

  private def foldAll(out: String,
                      bookings: Option[DataFrame] = None): Seq[String] = {
    val months = (Analog.curated(spark, sf)
        .select(date_format(col("booking_date"), "yyyy-MM").as("m"))
        .distinct().as[String].collect() ++
      Analog.apartmentsConverted(spark, sf)
        .select(date_format(col("listing_created_on"), "yyyy-MM").as("m"))
        .distinct().as[String].collect()).toSet.toSeq.sorted
    months.grouped(12).foreach { w =>
      Pipeline.runIncrementalWindow(spark, sf, out, w, writeGold = false,
        rawBookings = bookings)
    }
    months
  }

  test("rate-update fold ≡ full rebuild over the corrected rates " +
      "(fix + new-currency fill-in + no-op)") {
    val out = Files.createTempDirectory("graft_rate").toString
    foldAll(out)

    // EUR corrected, USD a no-op duplicate of the current row, GBP a
    // rate the dim LACKED (bookings with currency GBP exist — their
    // null total_price_usd must fill in)
    val updates = Seq(("EUR", 1.25), ("USD", 1.0), ("GBP", 1.3))
      .toDF("currency", "usd_rate")
    val correctedRates = Seq(
      ("USD", 1.0), ("EUR", 1.25), ("INR", 0.012), ("GBP", 1.3))
      .toDF("currency", "usd_rate")

    // the fill-in case is real: GBP bookings exist and sit at null
    val gbpBefore = spark.read
      .parquet(s"$out/curated.apartment_bookings")
      .filter(col("currency") === "GBP")
    assert(gbpBefore.count() > 0, "need GBP bookings for the fill-in leg")
    assert(gbpBefore.filter(col("total_price_usd").isNotNull).count() == 0)

    val res = Pipeline.runIncrementalRateUpdate(spark, sf, out, updates,
      writeGold = false)

    val correctedCurated = Curate.curate(Analog.bookingsRaw(spark, sf),
      Analog.apartmentsRaw(spark, sf), Analog.attributesRaw(spark, sf),
      correctedRates)
    val expected = goldOver(correctedCurated,
      convert(Analog.apartmentsRaw(spark, sf), correctedRates))
    for ((name, exp) <- expected) {
      assert(res.gold(name).schema.map(f => (f.name, f.dataType)) ==
        exp.schema.map(f => (f.name, f.dataType)), s"$name schema")
      assert(rows(res.gold(name)) == rows(exp), s"$name diverged")
    }

    // Silver ≡ corrected curate (unordered multiset)
    val silverRows = rows(spark.read
      .parquet(s"$out/curated.apartment_bookings")
      .select(Curate.SilverColumns.map(col): _*)).sorted
    assert(silverRows == rows(correctedCurated).sorted,
      "Silver diverged from the corrected-rates curate")

    // later folds use the corrected rates
    assert(rows(Pipeline.currentRates(spark, out).orderBy("currency"))
      == rows(correctedRates.orderBy("currency")))

    // rollback of a rate fold is refused (its inverse is applying the
    // SCD-2 rate history forward, same as the other dims)
    val exR = intercept[IllegalArgumentException] {
      Pipeline.rollbackLast(spark, out)
    }
    assert(exR.getMessage.contains("SCD-2"), exR.getMessage)

    // idempotent redelivery: the same feed again is a no-op
    val again = Pipeline.runIncrementalRateUpdate(spark, sf, out, updates,
      writeGold = false)
    assert(again.deltaSilver.count() == 0)
    for ((name, exp) <- expected)
      assert(rows(again.gold(name)) == rows(exp),
        s"$name changed under duplicate rate delivery")
  }

  test("rare-currency rate fix rewrites ONLY the affected months " +
      "(file census) and composes with a prior dim update") {
    val out = Files.createTempDirectory("graft_rate_rare").toString
    // crafted feed: EUR confined to the two NEWEST booking months,
    // everything else USD — the rare-currency shape
    val natural = Analog.bookingsRaw(spark, sf)
    val bMonth = date_format(
      to_date(col("booking_date"), Curate.RawDateFormat), "yyyy-MM")
    val bookingMonths = natural.select(bMonth.as("m")).distinct()
      .as[String].collect().sorted
    val eurMonths = bookingMonths.takeRight(2).toSeq
    val crafted = natural.withColumn("currency",
        when(bMonth.isin(eurMonths: _*), "EUR").otherwise("USD"))
      .localCheckpoint(true)
    foldAll(out, bookings = Some(crafted))

    // prior dim update: every apartment re-priced in USD (so the rate
    // fix has NO apartment-side affected rows — the booking-side
    // months are the whole story). Also the dim+rate interleave: the
    // rate fold must run against the UPDATED current dim.
    val aptUsd = Analog.apartmentsRaw(spark, sf)
      .withColumn("currency", lit("USD"))
    Pipeline.runIncrementalDimUpdate(spark, sf, out, aptUsd,
      writeGold = false)

    def filesUnder(dir: String, excl: Set[String]): Map[String, Long] = {
      val d = new java.io.File(dir)
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && !excl(f.getName))
        .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath -> f.lastModified()).toMap
    }
    val touchedMonths = eurMonths.map("booking_month=" + _).toSet
    val silverBefore = filesUnder(
      s"$out/curated.apartment_bookings", touchedMonths)
    // no EUR apartments remain → listing_price must not move AT ALL
    val lpBefore = filesUnder(s"$out/state/listing_price/live", Set.empty)
    assert(silverBefore.nonEmpty && lpBefore.nonEmpty)

    val res = Pipeline.runIncrementalRateUpdate(spark, sf, out,
      Seq(("EUR", 1.4)).toDF("currency", "usd_rate"), writeGold = false)

    assert(filesUnder(s"$out/curated.apartment_bookings", touchedMonths)
      == silverBefore,
      "rare-currency rate fold rewrote unaffected Silver months")
    assert(filesUnder(s"$out/state/listing_price/live", Set.empty)
      == lpBefore,
      "rate fold touched listing_price with no affected apartments")

    // and the result still ≡ full rebuild over (corrected dim,
    // crafted bookings, corrected rates)
    val correctedRates = Seq(
      ("USD", 1.0), ("EUR", 1.4), ("INR", 0.012))
      .toDF("currency", "usd_rate")
    val correctedCurated = Curate.curate(crafted, aptUsd,
      Analog.attributesRaw(spark, sf), correctedRates)
    val expected = goldOver(correctedCurated,
      convert(aptUsd, correctedRates))
    for ((name, exp) <- expected)
      assert(rows(res.gold(name)) == rows(exp),
        s"$name diverged in the rare-currency leg")
  }

  test("repair-vs-rebuild chooser: the targeted and wholesale paths " +
      "land bit-identical warehouses for the same rate fix") {
    val outT = Files.createTempDirectory("graft_rate_t").toString
    val outW = Files.createTempDirectory("graft_rate_w").toString
    Seq(outT, outW).foreach(o => foldAll(o))
    val updates = Seq(("EUR", 1.25)).toDF("currency", "usd_rate")

    def warehouse(out: String): Map[String, Seq[String]] =
      (graft.etl.GoldState.all.map(s =>
        s"state.${s.name}" -> (try rows(spark.read
            .parquet(s"$out/state/${s.name}/live")
            .drop("state_bucket")).sorted
          catch { case _: org.apache.spark.sql.AnalysisException => Nil })) ++
        Seq(
          "silver" -> rows(spark.read
            .parquet(s"$out/curated.apartment_bookings")
            .select(Curate.SilverColumns.map(col): _*)).sorted,
          "rates" -> rows(Pipeline.currentRates(spark, out)
            .orderBy("currency")))).toMap

    // force each path regardless of the measured share
    Pipeline.rateRebuildShareOverride.set(java.lang.Double.valueOf(1.0))
    try Pipeline.runIncrementalRateUpdate(spark, sf, outT, updates,
      writeGold = false): Unit
    finally Pipeline.rateRebuildShareOverride.set(null)
    Pipeline.rateRebuildShareOverride.set(java.lang.Double.valueOf(0.0))
    try Pipeline.runIncrementalRateUpdate(spark, sf, outW, updates,
      writeGold = false): Unit
    finally Pipeline.rateRebuildShareOverride.set(null)

    val t = warehouse(outT)
    val w = warehouse(outW)
    for ((k, v) <- t)
      assert(w(k) == v, s"chooser paths diverged at '$k'")
    // the wholesale write stays bucket-aligned
    assert(Pipeline.bucketFileCounts(spark, outW)
      .forall(_._3 <= Pipeline.StateFilesPerBucket))
    Seq(outT, outW).foreach(d => org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(d)))
  }
}
