package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.etl.{Analog, Curate, GoldState, Present}
import graft.io.Tables

/** MULTI-NIGHT SOAK (r11 verdict ask #1): a real warehouse runs
  * [[Pipeline.runNightly]] for months, not once — night N's repairs
  * interleave with night N+1's window over state whose undo ledger is
  * being retention-pruned underneath, and goldAsOf anchors cross
  * night boundaries. This spec drives THREE consecutive nightlies
  * with mixed phase sets (dim+late, then rate+window, then a
  * window-only night), a rollback+refold between nights, default
  * UndoKeep=3 retention pruning active throughout, and asserts after
  * EACH night that Silver, every state table, and all 8 Gold tables ≡
  * the one-shot rebuild over that night's cumulative corrected
  * inputs; then reads goldAsOf at anchors across the night
  * boundaries (including a MID-night anchor between night 2's two
  * phases) and at the loud horizon edge.
  *
  * The fold horizon is deliberately SHORT of the listing calendar
  * (base folds through 1995-06; apartments run through 1995-07), so
  * night 1's dim update touches listings in a not-yet-folded month —
  * the overlap that pins the r12 folded-horizon guard: without it the
  * dim fold inserts the unfolded month's listing-price weeks early
  * and night 2's window fold double-counts them.
  */
class PipelineSoakSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq

  // ---- calendars ----
  private lazy val months = (Analog.curated(spark, sf)
      .select(date_format(col("booking_date"), "yyyy-MM").as("m"))
      .distinct().as[String].collect() ++
    Analog.apartmentsConverted(spark, sf)
      .select(date_format(col("listing_created_on"), "yyyy-MM").as("m"))
      .distinct().as[String].collect()).toSet.toSeq.sorted
  private lazy val aptMonths = Analog.apartmentsConverted(spark, sf)
    .select(date_format(col("listing_created_on"), "yyyy-MM").as("m"))
    .distinct().as[String].collect().toSeq.sorted

  // ---- inputs and corrections ----
  private lazy val all = Analog.bookingsRaw(spark, sf).localCheckpoint(true)
  private lazy val isLate = date_format(
    to_date(col("booking_date"), Curate.RawDateFormat), "yyyy-MM")
    .isin("1995-03", "1995-04") && col("booking_id") % 3 === 0
  private lazy val onTime = all.filter(!isLate).localCheckpoint(true)
  private lazy val late = all.filter(isLate).localCheckpoint(true)
  private lazy val correctedApts = Analog.apartmentsRaw(spark, sf)
    .withColumn("price",
      when(col("id") % 7 === 3, col("price") * 1.1)
        .otherwise(col("price")))
    .localCheckpoint(true)
  private lazy val origAttrs = Analog.attributesRaw(spark, sf)
    .localCheckpoint(true)
  private lazy val origRates =
    Seq(("USD", 1.0), ("EUR", 1.1), ("INR", 0.012))
      .toDF("currency", "usd_rate")
  private lazy val rateFix =
    Seq(("EUR", 1.25)).toDF("currency", "usd_rate").localCheckpoint(true)
  private lazy val correctedRates =
    Seq(("USD", 1.0), ("EUR", 1.25), ("INR", 0.012))
      .toDF("currency", "usd_rate")
  private lazy val shiftedEvents = Tables.events(spark, sf)
    .withColumn("ts", expr("ts - INTERVAL 29 YEARS"))
    .localCheckpoint(true)

  /** One night's cumulative one-shot expectation. */
  private case class Expected(cutoff: String, bookings: DataFrame,
      apts: DataFrame, rates: DataFrame) {
    lazy val curated: DataFrame = Curate.curate(bookings, apts,
        origAttrs, rates)
      .filter(date_format(col("booking_date"), "yyyy-MM") <= cutoff)
      .localCheckpoint(true)
    lazy val conv: DataFrame = Curate.convertApartmentPrices(
        Curate.parseRawDates(Curate.dedup(apts),
          Seq("listing_created_on")), rates)
      .filter(date_format(col("listing_created_on"), "yyyy-MM") <= cutoff)
    lazy val events: DataFrame = shiftedEvents
      .filter(date_format(col("ts"), "yyyy-MM") <= cutoff)
    lazy val gold: Map[String, DataFrame] = Map(
      "average_listing_price"  -> Present.weeklyAvgListingPrice(conv),
      "occupancy_rate"         -> Present.monthlyOccupancy(curated),
      "most_popular_location"  -> Present.weeklyPopularCities(curated),
      "top_performing_listing" -> Present.weeklyTopListings(curated),
      "bookings_per_user"      -> Present.bookingsPerUser(curated),
      "avg_booking_duration"   -> Present.monthlyAvgDuration(curated),
      "repeat_customer_rate"   -> Present.monthlyRepeatRate(curated),
      "weekly_engagement"      -> Present.weeklyEngagement(events))
    lazy val state: Map[String, DataFrame] = Map(
      GoldState.listingPrice.name -> GoldState.listingPricePartial(conv),
      GoldState.occupancy.name -> GoldState.occupancyPartial(curated),
      GoldState.popularCities.name ->
        GoldState.popularCitiesPartial(curated),
      GoldState.topListings.name -> GoldState.topListingsPartial(curated),
      GoldState.bookingsPerUser.name ->
        GoldState.bookingsPerUserPartial(curated),
      GoldState.duration.name -> GoldState.durationPartial(curated),
      GoldState.repeatFlags.name ->
        GoldState.repeatFlagsPartial(curated, None),
      GoldState.userLast.name -> GoldState.userLastPartial(curated),
      GoldState.engagement.name -> GoldState.engagementPartial(events))
  }

  private def assertWarehouse(out: String, exp: Expected,
                              night: String): Unit = {
    for ((name, e) <- exp.gold)
      assert(rows(spark.read.parquet(s"$out/presentation.$name")).sorted
          == rows(e).sorted,
        s"published Gold $name diverged after $night")
    for ((name, e) <- exp.state)
      assert(rows(spark.read.parquet(s"$out/state/$name/live")
          .drop("state_bucket")).sorted == rows(e).sorted,
        s"state $name diverged after $night")
    assert(rows(spark.read.parquet(s"$out/curated.apartment_bookings")
        .select(Curate.SilverColumns.map(col): _*)).sorted ==
      rows(exp.curated).sorted, s"Silver diverged after $night")
    assert(Pipeline.pendingNightly(spark, out).isEmpty,
      s"manifest still pending after $night")
  }

  private def assertGoldOnly(got: Map[String, DataFrame], exp: Expected,
                             at: String): Unit =
    for ((name, e) <- exp.gold)
      assert(rows(got(name)) == rows(e), s"goldAsOf $name diverged at $at")

  test("three consecutive mixed-phase nightlies, each ≡ the one-shot " +
      "rebuild over its cumulative corrected inputs, with a rollback " +
      "between nights, retention pruning active, and cross-night " +
      "goldAsOf anchors (incl. a mid-night anchor and the loud edge)") {
    val hist = months.take(8) // 1995-01..08; listings run through 07
    val baseCut = hist(hist.size - 3) // 1995-06
    assert(aptMonths.max > baseCut,
      s"horizon-overlap premise broken: listings end ${aptMonths.max}, " +
        s"base folds through $baseCut — the dim update must touch an " +
        "unfolded listing month")
    val out = Files.createTempDirectory("graft_soak").toString
    // base: each month folds individually → a deep ledger, so default
    // UndoKeep=3 pruning is active before night 1 begins
    hist.dropRight(2).foreach { m =>
      Pipeline.runIncrementalWindow(spark, sf, out, Seq(m),
        writeGold = false, rawBookings = Some(onTime),
        rawEvents = Some(shiftedEvents)): Unit
    }

    // ---- night 1: dim correction + late bookings ----
    Pipeline.runNightly(spark, sf, out, Pipeline.NightlyDeltas(
      apartmentUpdates = Some(correctedApts),
      lateBookings = Some(late)))
    val exp1 = Expected(baseCut, onTime.unionByName(late),
      correctedApts, origRates)
    assertWarehouse(out, exp1, "night 1")

    // ---- rollback between nights: undo night 1's newest fold (the
    // late fold), prove the guard blocks new work, refold, re-verify
    val rolled = Pipeline.rollbackLast(spark, out)
    assert(rolled.matches(""".*\.late\d+"""), s"rolled $rolled")
    assert(Pipeline.pendingLate(spark, out).nonEmpty)
    intercept[IllegalArgumentException] {
      Pipeline.runIncrementalWindow(spark, sf, out, Seq(hist(hist.size - 2)),
        rawBookings = Some(onTime), rawEvents = Some(shiftedEvents))
    }
    Pipeline.resumeLate(spark, sf, out)
    assertWarehouse(out, exp1, "night 1 (after rollback + refold)")

    // ---- night 2: rate fix + the next month's window ----
    val win2 = hist(hist.size - 2) // 1995-07
    Pipeline.runNightly(spark, sf, out, Pipeline.NightlyDeltas(
      rateUpdates = Some(rateFix),
      windowMonths = Seq(win2),
      windowBookings = Some(onTime),
      windowEvents = Some(shiftedEvents)))
    val exp2 = Expected(win2, onTime.unionByName(late),
      correctedApts, correctedRates)
    assertWarehouse(out, exp2, "night 2")
    val ledger2 = Pipeline.ledgerEntries(spark, out).map(_._1)
    val rateLabel = ledger2.filter(_.matches(""".*\.rate\d+""")).last

    // ---- night 3: window-only ----
    val win3 = hist.last // 1995-08
    Pipeline.runNightly(spark, sf, out, Pipeline.NightlyDeltas(
      windowMonths = Seq(win3),
      windowBookings = Some(onTime),
      windowEvents = Some(shiftedEvents)))
    val exp3 = Expected(win3, onTime.unionByName(late),
      correctedApts, correctedRates)
    assertWarehouse(out, exp3, "night 3")

    // ---- goldAsOf across night boundaries ----
    // night 2's closing fold (1 back): the night-2 warehouse
    assertGoldOnly(Pipeline.goldAsOf(spark, out, sf, win2), exp2,
      s"$win2 (night-2 close, read after night 3)")
    // MID-night-2 anchor (2 back): rates corrected, window not folded
    val expMid = Expected(baseCut, onTime.unionByName(late),
      correctedApts, correctedRates)
    assertGoldOnly(Pipeline.goldAsOf(spark, out, sf, rateLabel), expMid,
      s"$rateLabel (mid-night-2, read after night 3)")
    // night 1's closing fold is 3 back — past the pruned horizon:
    // loud, never a wrong rewind
    val lateLabel = ledger2.filter(_.matches(""".*\.late\d+""")).last
    intercept[IllegalArgumentException] {
      Pipeline.goldAsOf(spark, out, sf, lateLabel)
    }

    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(out))
  }
}
