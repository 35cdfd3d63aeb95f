package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.etl.{Analog, Curate, GoldState, Present}

/** Interleaved-history equivalence (r10 verdict ask #1, the top
  * remaining risk): the repair paths were each proven in ISOLATION; a
  * real nightly window delivers several at once (the reference's raw
  * layer is mutable Postgres, `scripts/init_db.sql:11-80`). Two
  * realistic timelines against ONE set of final inputs:
  *
  *   A: fold months 1..k → late bookings → apartments price fix →
  *      attributes city move → exchange-rate fix → fold the next
  *      month → roll it back → refold it
  *   B: the dim corrections land FIRST (apartments, attributes,
  *      rate), THEN the late bookings — whose rows then curate
  *      against the already-updated dims — then fold/rollback/refold
  *
  * — where the late slice includes bookings whose apartment is ALSO
  * being price-fixed AND re-citied (the interaction case no
  * single-repair spec exercises). Both orders must land final Silver,
  * every state table, and all Gold ≡ the one-shot computation over
  * the corrected inputs — repair composition must commute.
  */
class PipelineInterleaveSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq

  // ---- shared inputs ----
  private lazy val all = Analog.bookingsRaw(spark, sf).localCheckpoint(true)
  private lazy val bMonth = date_format(
    to_date(col("booking_date"), Curate.RawDateFormat), "yyyy-MM")
  private lazy val isLate = bMonth.isin("1995-03", "1995-04") &&
    col("booking_id") % 3 === 0
  private lazy val onTime = all.filter(!isLate).localCheckpoint(true)
  private lazy val late = all.filter(isLate).localCheckpoint(true)
  private lazy val correctedApts = Analog.apartmentsRaw(spark, sf)
    .withColumn("price",
      when(col("id") % 7 === 3, col("price") * 1.1)
        .otherwise(col("price")))
    .localCheckpoint(true)
  private lazy val correctedAttrs = Analog.attributesRaw(spark, sf)
    .withColumn("cityname",
      when(col("id") % 13 === 5, lit("ATLANTIS"))
        .otherwise(col("cityname")))
    .localCheckpoint(true)
  private lazy val correctedRates =
    Seq(("USD", 1.0), ("EUR", 1.25), ("INR", 0.012))
      .toDF("currency", "usd_rate")
  private lazy val months = (Analog.curated(spark, sf)
      .select(date_format(col("booking_date"), "yyyy-MM").as("m"))
      .distinct().as[String].collect() ++
    Analog.apartmentsConverted(spark, sf)
      .select(date_format(col("listing_created_on"), "yyyy-MM").as("m"))
      .distinct().as[String].collect()).toSet.toSeq.sorted

  private def deliverLate(out: String): Unit =
    Pipeline.runIncrementalLate(spark, sf, out, late,
      writeGold = false): Unit
  private def deliverDims(out: String): Unit = {
    Pipeline.runIncrementalDimUpdate(spark, sf, out, correctedApts,
      writeGold = false)
    Pipeline.runIncrementalAttrUpdate(spark, sf, out, correctedAttrs,
      writeGold = false)
    Pipeline.runIncrementalRateUpdate(spark, sf, out,
      Seq(("EUR", 1.25)).toDF("currency", "usd_rate"),
      writeGold = false): Unit
  }

  /** Fold history, run the nightly batch in the given order, fold the
    * next month, roll it back, refold — then assert ≡ one-shot. */
  private def runTimeline(nightly: Seq[String => Unit]): Unit = {
    val out = Files.createTempDirectory("graft_interleave").toString
    // the interaction rows exist: late bookings on apartments that the
    // dim fix (id % 7 = 3) AND the attr move (id % 13 = 5) both touch
    assert(late.filter(col("apartment_id") % 7 === 3).count() > 0)
    assert(late.filter(col("apartment_id") % 13 === 5).count() > 0)

    months.init.grouped(12).foreach { w =>
      Pipeline.runIncrementalWindow(spark, sf, out, w, writeGold = false,
        rawBookings = Some(onTime))
    }
    nightly.foreach(_(out))
    Pipeline.runIncrementalWindow(spark, sf, out, Seq(months.last),
      writeGold = false, rawBookings = Some(onTime))
    val rolled = Pipeline.rollbackLast(spark, out)
    assert(rolled == months.last, s"rolled back '$rolled'")
    val res = Pipeline.runIncrementalWindow(spark, sf, out,
      Seq(months.last), writeGold = false, rawBookings = Some(onTime))

    // ---- one-shot over the corrected inputs ----
    val correctedCurated = Curate.curate(all, correctedApts,
      correctedAttrs, correctedRates).localCheckpoint(true)
    val correctedConv = Curate.convertApartmentPrices(
      Curate.parseRawDates(Curate.dedup(correctedApts),
        Seq("listing_created_on")), correctedRates)
    val expectedGold = Map(
      "average_listing_price"  -> Present.weeklyAvgListingPrice(correctedConv),
      "occupancy_rate"         -> Present.monthlyOccupancy(correctedCurated),
      "most_popular_location"  -> Present.weeklyPopularCities(correctedCurated),
      "top_performing_listing" -> Present.weeklyTopListings(correctedCurated),
      "bookings_per_user"      -> Present.bookingsPerUser(correctedCurated),
      "avg_booking_duration"   -> Present.monthlyAvgDuration(correctedCurated),
      "repeat_customer_rate"   -> Present.monthlyRepeatRate(correctedCurated))
    for ((name, exp) <- expectedGold) {
      assert(res.gold(name).schema.map(f => (f.name, f.dataType)) ==
        exp.schema.map(f => (f.name, f.dataType)), s"$name schema")
      assert(rows(res.gold(name)) == rows(exp),
        s"$name diverged from the one-shot rebuild")
    }

    // ---- Silver ≡ the one-shot curate (unordered multiset) ----
    val silverRows = rows(spark.read
      .parquet(s"$out/curated.apartment_bookings")
      .select(Curate.SilverColumns.map(col): _*)).sorted
    assert(silverRows == rows(correctedCurated).sorted,
      "Silver diverged from the one-shot corrected curate")

    // ---- every STATE table ≡ the one-shot partial over the
    // corrected inputs (the strongest form: not just the Gold
    // projections but the stored mergeable grain) ----
    val expectedState: Map[String, DataFrame] = Map(
      GoldState.listingPrice.name ->
        GoldState.listingPricePartial(correctedConv),
      GoldState.occupancy.name ->
        GoldState.occupancyPartial(correctedCurated),
      GoldState.popularCities.name ->
        GoldState.popularCitiesPartial(correctedCurated),
      GoldState.topListings.name ->
        GoldState.topListingsPartial(correctedCurated),
      GoldState.bookingsPerUser.name ->
        GoldState.bookingsPerUserPartial(correctedCurated),
      GoldState.duration.name ->
        GoldState.durationPartial(correctedCurated),
      GoldState.repeatFlags.name ->
        GoldState.repeatFlagsPartial(correctedCurated, None),
      GoldState.userLast.name ->
        GoldState.userLastPartial(correctedCurated))
    // decimal sums WIDEN under repeated merge (sum of (28,2) → (38,2))
    // while the one-shot partial stays at one sum's width — same
    // values, different precision metadata; compare scale only
    def normType(dt: org.apache.spark.sql.types.DataType): String =
      dt match {
        case d: org.apache.spark.sql.types.DecimalType => s"decimal(*,${d.scale})"
        case other => other.simpleString
      }
    for ((name, exp) <- expectedState) {
      val live = spark.read.parquet(s"$out/state/$name/live")
        .drop("state_bucket")
      assert(live.schema.map(f => (f.name, normType(f.dataType))) ==
        exp.schema.map(f => (f.name, normType(f.dataType))),
        s"state $name schema")
      assert(rows(live).sorted == rows(exp).sorted,
        s"state $name diverged from the one-shot partial")
    }
  }

  test("late + dim + attr + rate + fold + rollback/refold ≡ one-shot") {
    runTimeline(Seq(deliverLate, deliverDims))
  }

  test("dims FIRST, late after (late rows curate against the updated " +
      "dims) ≡ the same one-shot — repair composition commutes") {
    runTimeline(Seq(deliverDims, deliverLate))
  }
}
