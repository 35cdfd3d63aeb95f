package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.etl.{Analog, Curate, GoldState, Present}
import graft.io.Tables

/** GENERATED night sequences (r12 verdict ask #4): the hand-picked
  * soaks approximate the algebra's real claim — closure under
  * ARBITRARY composition of nightly phase sets, rollback points, and
  * anchor reads. This spec samples bounded scenarios from a ScalaCheck
  * generator (phase subset per night from {late-slice, dim price
  * bump, attr move, rate fix, window, fragment+compact}, an optional
  * rollback+repair after each night) at FIXED seeds — deterministic
  * per the repo's
  * no-RNG contract, while still exploring compositions nobody
  * hand-picked — and asserts after EVERY generated night that the
  * published warehouse ≡ the one-shot rebuild over that night's
  * cumulative corrected inputs; at the end, every night's closing
  * label is read back through goldAsOf and must be either EXACT or
  * LOUDLY refused at the documented horizon — never silently wrong.
  *
  * Late corrections arrive as disjoint slices (booking_id % 6 ∈ {0,3}
  * of the 1995-03/04 months), rate fixes climb a fixed ladder
  * (EUR 1.1 → 1.2 → 1.25), the dim price bump and the attr move each
  * apply at most once, and windows consume the next unfolded months
  * in order — so every generated sequence has a well-defined one-shot
  * expectation. A dim update landing while later listing months are
  * still unfolded also re-exercises the r12 folded-horizon guard
  * under generated composition. */
class PipelineSoakCheckSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq

  private lazy val months = (Analog.curated(spark, sf)
      .select(date_format(col("booking_date"), "yyyy-MM").as("m"))
      .distinct().as[String].collect() ++
    Analog.apartmentsConverted(spark, sf)
      .select(date_format(col("listing_created_on"), "yyyy-MM").as("m"))
      .distinct().as[String].collect()).toSet.toSeq.sorted

  private lazy val all = Analog.bookingsRaw(spark, sf).localCheckpoint(true)
  private lazy val isLate = date_format(
    to_date(col("booking_date"), Curate.RawDateFormat), "yyyy-MM")
    .isin("1995-03", "1995-04") && col("booking_id") % 3 === 0
  private lazy val onTime = all.filter(!isLate).localCheckpoint(true)
  private lazy val lateSlices = Seq(
    all.filter(isLate && col("booking_id") % 6 === 0).localCheckpoint(true),
    all.filter(isLate && col("booking_id") % 6 === 3).localCheckpoint(true))
  private lazy val origAttrs = Analog.attributesRaw(spark, sf)
    .localCheckpoint(true)
  private lazy val movedAttrs = origAttrs.withColumn("cityname",
    when(col("id") % 13 === 5, lit("ATLANTIS"))
      .otherwise(col("cityname")))
    .localCheckpoint(true)
  private lazy val origApts = Analog.apartmentsRaw(spark, sf)
    .localCheckpoint(true)
  private lazy val bumpedApts = origApts.withColumn("price",
    when(col("id") % 7 === 3, col("price") * 1.1)
      .otherwise(col("price")))
    .localCheckpoint(true)
  private val rateLadder = Seq(1.2, 1.25)
  private def ratesAt(v: Double): DataFrame =
    Seq(("USD", 1.0), ("EUR", v), ("INR", 0.012))
      .toDF("currency", "usd_rate")
  private lazy val shiftedEvents = Tables.events(spark, sf)
    .withColumn("ts", expr("ts - INTERVAL 29 YEARS"))
    .localCheckpoint(true)

  private case class Expected(cutoff: String, bookings: DataFrame,
      apts: DataFrame, attrs: DataFrame, rates: DataFrame) {
    lazy val curated: DataFrame = Curate.curate(bookings,
        apts, attrs, rates)
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
  }

  private def assertWarehouse(out: String, exp: Expected,
                              at: String): Unit = {
    for ((name, e) <- exp.gold)
      assert(rows(spark.read.parquet(s"$out/presentation.$name")).sorted
          == rows(e).sorted, s"published Gold $name diverged at $at")
    assert(Pipeline.pendingNightly(spark, out).isEmpty,
      s"manifest still pending at $at")
  }

  // ---- the generator: one bounded scenario = 3 night plans ----
  private case class NightPlan(late: Boolean, dim: Boolean,
      attr: Boolean, rate: Boolean, window: Boolean, compact: Boolean,
      rollback: Boolean)
  private val genNight: Gen[NightPlan] = for {
    late <- Gen.oneOf(true, false)
    dim <- Gen.oneOf(true, false)
    attr <- Gen.oneOf(true, false)
    rate <- Gen.oneOf(true, false)
    window <- Gen.oneOf(true, false)
    compact <- Gen.oneOf(true, false)
    rollback <- Gen.oneOf(true, false)
  } yield NightPlan(late, dim, attr, rate, window, compact, rollback)
  private val genScenario: Gen[List[NightPlan]] = Gen.listOfN(3, genNight)

  private def fragmentOne(out: String): Boolean = {
    val cand = Pipeline.bucketFileCounts(spark, out)
      .find(_._1 == GoldState.topListings.name)
    cand.foreach { case (state, bucket, _) =>
      val dir = s"$out/state/$state/live/state_bucket=$bucket"
      val content = spark.read.parquet(dir).localCheckpoint(true)
      content.repartition(4).write.mode("overwrite").parquet(dir)
      new java.io.File(dir, "_SUCCESS").delete(): Unit
    }
    cand.nonEmpty
  }

  /** Run one generated scenario end-to-end; returns nothing, fails
    * the test on any divergence. */
  private def runScenario(plans: List[NightPlan], tag: String): Unit = {
    val hist = months.take(8)
    val out = Files.createTempDirectory(s"graft_gen_$tag").toString
    // base: folds through hist(5) on the on-time feed
    hist.take(6).foreach { m =>
      Pipeline.runIncrementalWindow(spark, sf, out, Seq(m),
        writeGold = false, rawBookings = Some(onTime),
        rawEvents = Some(shiftedEvents)): Unit
    }
    var cutoff = hist(5)
    var bookings = onTime
    var slicesLeft = lateSlices.indices.toList
    var aptsNow = origApts
    var dimLeft = true
    var attrsNow = origAttrs
    var attrLeft = true
    var rateSteps = rateLadder.toList
    var rateNow = 1.1
    var winsLeft = List(hist(6), hist(7))
    val anchors = scala.collection.mutable.ListBuffer
      .empty[(String, Expected)]

    plans.zipWithIndex.foreach { case (p, i) =>
      val lateDelta = if (p.late && slicesLeft.nonEmpty) {
        val s = slicesLeft.head; slicesLeft = slicesLeft.tail
        Some(lateSlices(s))
      } else None
      val dimDelta = if (p.dim && dimLeft) {
        dimLeft = false; Some(bumpedApts)
      } else None
      val attrDelta = if (p.attr && attrLeft) {
        attrLeft = false; Some(movedAttrs)
      } else None
      val rateDelta = if (p.rate && rateSteps.nonEmpty) {
        rateNow = rateSteps.head; rateSteps = rateSteps.tail
        Some(Seq(("EUR", rateNow)).toDF("currency", "usd_rate"))
      } else None
      val winDelta = if (p.window && winsLeft.nonEmpty) {
        val w = winsLeft.head; winsLeft = winsLeft.tail; Seq(w)
      } else Nil
      val doCompact = p.compact && fragmentOne(out)
      val deltas = Pipeline.NightlyDeltas(
        apartmentUpdates = dimDelta,
        attributeUpdates = attrDelta,
        rateUpdates = rateDelta,
        lateBookings = lateDelta,
        windowMonths = winDelta,
        windowBookings = if (winDelta.nonEmpty) Some(onTime) else None,
        windowEvents = if (winDelta.nonEmpty) Some(shiftedEvents) else None,
        compactBuckets = doCompact)
      if (deltas.phases.nonEmpty) {
        Pipeline.runNightly(spark, sf, out, deltas)
        // cumulative expectation
        lateDelta.foreach(d => bookings = bookings.unionByName(d))
        dimDelta.foreach(_ => aptsNow = bumpedApts)
        attrDelta.foreach(_ => attrsNow = movedAttrs)
        if (winDelta.nonEmpty) cutoff = winDelta.last
        val exp = Expected(cutoff, bookings, aptsNow, attrsNow,
          ratesAt(rateNow))
        // optional rollback+repair of the night's newest fold, when
        // it is a rollback-able kind (dim-kind folds refuse by
        // contract — compensation is their path, covered elsewhere)
        val newest = Pipeline.ledgerEntries(spark, out).last._1
        if (p.rollback && !newest.matches(""".*\.(dim|att|rate)\d+""")) {
          val rolled = Pipeline.rollbackLast(spark, out)
          if (rolled.matches(""".*\.late\d+"""))
            Pipeline.resumeLate(spark, sf, out)
          else if (rolled.matches(""".*\.cmp\d+"""))
            Pipeline.resumeCompact(spark, out): Unit
          else if (rolled.matches(""".*\.evt\d+"""))
            Pipeline.resumeLateEvents(spark, sf, out)
          else // a window month: refold it
            Pipeline.runIncrementalWindow(spark, sf, out, Seq(rolled),
              rawBookings = Some(onTime),
              rawEvents = Some(shiftedEvents)): Unit
        }
        assertWarehouse(out, exp, s"$tag night $i ($p)")
        anchors += ((Pipeline.ledgerEntries(spark, out).last._1, exp))
      }
    }

    // cross-night anchor reads: every generated night's closing label
    // is either served exactly or refused loudly at the documented
    // horizon — never silently wrong
    anchors.toList.foreach { case (label, exp) =>
      try {
        val got = Pipeline.goldAsOf(spark, out, sf, label)
        for ((name, e) <- exp.gold)
          assert(rows(got(name)) == rows(e),
            s"goldAsOf $name diverged at $tag anchor $label")
      } catch {
        case e: IllegalArgumentException =>
          assert(e.getMessage.contains("horizon") ||
            e.getMessage.contains("watermark"),
            s"$tag anchor $label: unexpected refusal ${e.getMessage}")
      }
    }
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(out))
  }

  test("ScalaCheck-generated 3-night scenarios (fixed seeds): after " +
      "every generated night the warehouse ≡ one-shot over the " +
      "cumulative corrected inputs; every closing label replays " +
      "exactly through goldAsOf or is refused loudly") {
    val params = Gen.Parameters.default
    val scenarios = (0 until 4).map { i =>
      genScenario.pureApply(params, org.scalacheck.rng.Seed(913L + i))
    }
    // the seeds must differ somewhere, or the sample proves less
    // than it claims
    assert(scenarios.distinct.size == scenarios.size,
      s"degenerate sample: $scenarios")
    scenarios.zipWithIndex.foreach { case (plans, i) =>
      runScenario(plans, s"s$i")
    }
  }
}
