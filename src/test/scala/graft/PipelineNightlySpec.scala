package graft

import java.nio.file.Files

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.etl.{Analog, Curate, GoldState, Present}
import graft.io.Tables

/** The NIGHTLY driver ([[Pipeline.runNightly]]): one entry point for
  * one night's arrivals — dim/attr/rate corrections, late bookings,
  * late events, and the new month's window — applied in the canonical
  * order with one manifest as the resumable unit and ONE Gold publish.
  *
  * Two legs:
  *
  *  1. EQUIVALENCE — a full six-phase nightly (all three dim repairs +
  *     late bookings + late events + the next month) lands final
  *     Silver, every state table, and all 8 Gold tables (engagement
  *     included — the composition the interleave spec leaves out)
  *     ≡ the one-shot rebuild over the corrected inputs.
  *  2. CRASH/RESUME at the CROSS-PHASE boundaries — the dispatcher's
  *     outcome classes the per-path sweep can't see: manifest durable
  *     but nothing applied; a phase's delta pending (resume must route
  *     to that phase's resume*, then continue the REMAINING phases);
  *     a phase complete and the next not started (ledger-seq
  *     detection); everything folded with only the publish/retirement
  *     left. Targets are selected MECHANICALLY from the clean run's
  *     boundary trace by stage-name class, so a new phase following
  *     the `*.delta.persist` convention is swept automatically.
  *     Intra-phase boundary coverage is PipelineCrashSweepSpec's job —
  *     inside a nightly each phase runs the same staged code, so its
  *     per-boundary idempotence transfers.
  */
class PipelineNightlySpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq

  // ---- shared inputs (the interleave spec's salts, plus events) ----
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
  private lazy val correctedAttrs = Analog.attributesRaw(spark, sf)
    .withColumn("cityname",
      when(col("id") % 13 === 5, lit("ATLANTIS"))
        .otherwise(col("cityname")))
    .localCheckpoint(true)
  private lazy val rateFix =
    Seq(("EUR", 1.25)).toDF("currency", "usd_rate").localCheckpoint(true)
  private lazy val correctedRates =
    Seq(("USD", 1.0), ("EUR", 1.25), ("INR", 0.012))
      .toDF("currency", "usd_rate")
  // events shifted into the folded booking-month territory (the raw
  // feed's calendar is disjoint from the bookings'); one slice arrives
  // LATE through the nightly's evt phase
  private lazy val shiftedEvents = Tables.events(spark, sf)
    .withColumn("ts", expr("ts - INTERVAL 29 YEARS"))
    .localCheckpoint(true)
  private lazy val isLateEvt = col("event_id") % 11 === 5
  private lazy val baseEvents =
    shiftedEvents.filter(!isLateEvt).localCheckpoint(true)
  private lazy val lateEvents =
    shiftedEvents.filter(isLateEvt).localCheckpoint(true)
  private lazy val months = (Analog.curated(spark, sf)
      .select(date_format(col("booking_date"), "yyyy-MM").as("m"))
      .distinct().as[String].collect() ++
    Analog.apartmentsConverted(spark, sf)
      .select(date_format(col("listing_created_on"), "yyyy-MM").as("m"))
      .distinct().as[String].collect()).toSet.toSeq.sorted

  private def buildBase(hist: Seq[String], out: String): Unit =
    hist.init.grouped(12).foreach { w =>
      Pipeline.runIncrementalWindow(spark, sf, out, w, writeGold = false,
        rawBookings = Some(onTime), rawEvents = Some(baseEvents)): Unit
    }

  private def nightly(hist: Seq[String]) = Pipeline.NightlyDeltas(
    apartmentUpdates = Some(correctedApts),
    attributeUpdates = Some(correctedAttrs),
    rateUpdates = Some(rateFix),
    lateBookings = Some(late),
    lateEvents = Some(lateEvents),
    windowMonths = Seq(hist.last),
    windowBookings = Some(onTime),
    windowEvents = Some(baseEvents))

  test("a full six-phase nightly ≡ the one-shot rebuild over the " +
      "corrected inputs (Silver, all 9 states, all 8 Gold)") {
    val out = Files.createTempDirectory("graft_nightly").toString
    // the interaction rows exist: late bookings on apartments the dim
    // fix AND the attr move both touch
    assert(late.filter(col("apartment_id") % 7 === 3).count() > 0)
    assert(late.filter(col("apartment_id") % 13 === 5).count() > 0)
    assert(lateEvents.count() > 0)

    buildBase(months, out)
    val res = Pipeline.runNightly(spark, sf, out, nightly(months))

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
      "repeat_customer_rate"   -> Present.monthlyRepeatRate(correctedCurated),
      "weekly_engagement"      -> Present.weeklyEngagement(shiftedEvents))
    for ((name, exp) <- expectedGold) {
      assert(res.gold(name).schema.map(f => (f.name, f.dataType)) ==
        exp.schema.map(f => (f.name, f.dataType)), s"$name schema")
      assert(rows(res.gold(name)) == rows(exp),
        s"$name diverged from the one-shot rebuild")
      // the nightly publishes ONCE — the parquet table matches too
      assert(rows(spark.read.parquet(s"$out/presentation.$name")
          .orderBy(exp.columns.map(col).toSeq: _*)).sorted ==
        rows(exp).sorted, s"published $name diverged")
    }

    // ---- Silver ≡ the one-shot curate (unordered multiset) ----
    val silverRows = rows(spark.read
      .parquet(s"$out/curated.apartment_bookings")
      .select(Curate.SilverColumns.map(col): _*)).sorted
    assert(silverRows == rows(correctedCurated).sorted,
      "Silver diverged from the one-shot corrected curate")
    // ---- stored events ≡ the full feed (multiset — multiplicity is
    // signal) ----
    assert(rows(spark.read.parquet(s"$out/curated.events")
        .select(shiftedEvents.columns.map(col).toSeq: _*)).sorted ==
      rows(shiftedEvents).sorted,
      "stored events diverged from the full feed")

    // ---- every STATE table ≡ the one-shot partial ----
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
        GoldState.userLastPartial(correctedCurated),
      GoldState.engagement.name ->
        GoldState.engagementPartial(shiftedEvents))
    def normType(dt: org.apache.spark.sql.types.DataType): String =
      dt match {
        case d: org.apache.spark.sql.types.DecimalType =>
          s"decimal(*,${d.scale})"
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

    // the manifest retired; nothing pending
    assert(Pipeline.pendingNightly(spark, out).isEmpty)
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(out))
  }

  // ------------------------------------------------------------------
  // Crash/resume at the cross-phase boundaries
  // ------------------------------------------------------------------

  private case class InjectedCrash(at: String)
    extends RuntimeException(s"injected crash after $at")

  private def causedByInjection(e: Throwable): Boolean =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10)
      .exists(_.isInstanceOf[InjectedCrash])

  /** Everything recovery must reproduce, as sorted row strings. */
  private def snapshot(out: String): Map[String, Seq[String]] = {
    def rowsAt(p: String): Seq[String] =
      try rows(spark.read.parquet(p)).sorted
      catch { case _: org.apache.spark.sql.AnalysisException => Nil }
    (GoldState.all.map(s =>
        s"state.${s.name}" -> rowsAt(s"$out/state/${s.name}/live")) ++
      Pipeline.goldTableNames.map(n =>
        s"gold.$n" -> rowsAt(s"$out/presentation.$n")) ++
      Seq(
        "silver" -> rowsAt(s"$out/curated.apartment_bookings"),
        "events" -> rowsAt(s"$out/curated.events"),
        "dim.apartments" ->
          rows(Pipeline.currentApartmentsRaw(spark, sf, out)).sorted,
        "dim.attributes" ->
          rows(Pipeline.currentAttributesRaw(spark, sf, out)).sorted,
        "dim.rates" -> rows(Pipeline.currentRates(spark, out)).sorted,
        "ledger" -> Pipeline.processedMonths(spark, out))).toMap
  }

  test("resumeNightly ≡ clean at every cross-phase boundary class " +
      "(manifest durable / phase pending / phase not started / " +
      "publish-only left)") {
    // short history: the subject is the DISPATCHER, independent of
    // depth — but it must span the late slices (1995-03/04, events in
    // 1995-01)
    val hist = months.take(6)
    val base = Files.createTempDirectory("graft_nightly_base").toString
    buildBase(hist, base)
    def copyBase(): String = {
      val d = Files.createTempDirectory("graft_nightly_c").toString
      org.apache.commons.io.FileUtils.copyDirectory(
        new java.io.File(base), new java.io.File(d))
      d
    }

    Pipeline.serializeStages.set(true)
    try {
      // clean run: the boundary trace + the expected warehouse
      val clean = copyBase()
      val stages = ListBuffer[String]()
      Pipeline.stageBoundaryHook.set(n => { stages += n; () })
      Pipeline.runNightly(spark, sf, clean, nightly(hist))
      Pipeline.stageBoundaryHook.remove()
      val expected = snapshot(clean)
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(clean))

      // mechanical target selection by boundary class (see the class
      // doc): every phase's resumable-unit persist, the manifest
      // persist, one phase-entry representative, a mid-window-fold
      // boundary, and the final publish
      val persists = stages.filter(s =>
        s == "nightly.manifest.persist" || s.endsWith(".delta.persist"))
      assert(persists.size == 6,
        s"expected the manifest + 5 phase persists, got $persists")
      val targets =
        (persists ++ Seq("validate.late", "curate.delta.write",
          stages.last)).distinct
      assert(targets.forall(stages.contains), s"unknown target in $targets")

      for (target <- targets) {
        val out = copyBase()
        Pipeline.stageBoundaryHook.set(n =>
          if (n == target) throw InjectedCrash(n))
        val crashed =
          try { Pipeline.runNightly(spark, sf, out, nightly(hist)); false }
          catch {
            case _: InjectedCrash => true
            case e: Throwable if causedByInjection(e) => true
          }
        Pipeline.stageBoundaryHook.remove()
        assert(crashed, s"hook at '$target' never fired")
        // the manifest is durable at every selected boundary, so
        // recovery is always resumeNightly — and the standard guard
        // refuses other work until it runs
        assert(Pipeline.pendingNightly(spark, out).nonEmpty,
          s"no pending manifest after crash at '$target'")
        intercept[IllegalArgumentException] {
          Pipeline.runIncrementalWindow(spark, sf, out,
            Seq("2999-01"), rawBookings = Some(onTime))
        }
        Pipeline.resumeNightly(spark, sf, out)
        assert(Pipeline.pendingNightly(spark, out).isEmpty,
          s"manifest not retired after resume at '$target'")
        val got = snapshot(out)
        for ((k, exp) <- expected)
          assert(got(k) == exp,
            s"'$k' diverged after crash at '$target'")
        org.apache.commons.io.FileUtils
          .deleteDirectory(new java.io.File(out))
      }
    } finally {
      Pipeline.serializeStages.remove()
      Pipeline.stageBoundaryHook.remove()
    }
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(base))
  }

  test("a window-only nightly ≡ runIncrementalWindow + publish (the " +
      "single-phase dispatch edge), and its crash resumes from the " +
      "manifest's persisted feed slice") {
    val hist = months.take(6)
    val viaWindow = Files.createTempDirectory("graft_nightly_w1").toString
    val viaNightly = Files.createTempDirectory("graft_nightly_w2").toString
    Seq(viaWindow, viaNightly).foreach(buildBase(hist, _))
    Pipeline.runIncrementalWindow(spark, sf, viaWindow, Seq(hist.last),
      rawBookings = Some(onTime), rawEvents = Some(baseEvents))
    val winOnly = Pipeline.NightlyDeltas(windowMonths = Seq(hist.last),
      windowBookings = Some(onTime), windowEvents = Some(baseEvents))

    // crash right after the manifest persists, then resume: the window
    // must fold from the manifest's slice (the feed could have moved)
    Pipeline.serializeStages.set(true)
    try {
      Pipeline.stageBoundaryHook.set(n =>
        if (n == "nightly.manifest.persist") throw InjectedCrash(n))
      intercept[InjectedCrash] {
        Pipeline.runNightly(spark, sf, viaNightly, winOnly)
      }
      Pipeline.stageBoundaryHook.remove()
      Pipeline.resumeNightly(spark, sf, viaNightly)
    } finally {
      Pipeline.serializeStages.remove()
      Pipeline.stageBoundaryHook.remove()
    }
    assert(Pipeline.pendingNightly(spark, viaNightly).isEmpty)

    val a = snapshot(viaWindow)
    val b = snapshot(viaNightly)
    for ((k, v) <- a)
      assert(b(k) == v, s"window-only nightly diverged at '$k'")
    Seq(viaWindow, viaNightly).foreach(d =>
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(d)))
  }

  test("abortNightly retires un-started phases; applied phases persist") {
    val hist = months.take(6)
    val out = Files.createTempDirectory("graft_nightly_a").toString
    buildBase(hist, out)
    Pipeline.serializeStages.set(true)
    try {
      // crash right after the rate phase's resumable unit persisted
      Pipeline.stageBoundaryHook.set(n =>
        if (n == "rate.delta.persist") throw InjectedCrash(n))
      intercept[InjectedCrash] {
        Pipeline.runNightly(spark, sf, out, nightly(hist))
      }
      Pipeline.stageBoundaryHook.remove()
      // a phase is mid-fold — abort must refuse until it's resumed
      intercept[IllegalArgumentException] {
        Pipeline.abortNightly(spark, sf, out)
      }
      Pipeline.resumeRate(spark, sf, out, writeGold = false)
      val aborted = Pipeline.abortNightly(spark, sf, out)
      assert(aborted.nonEmpty, "nothing aborted")
      assert(Pipeline.pendingNightly(spark, out).isEmpty)
      // the abort REPUBLISHED Gold from the applied phases' state
      // (r11 ADVICE #2): every phase ran writeGold=false, so without
      // the abort-time publish the presentation tables would still
      // serve the pre-nightly warehouse. Expected = the one-shot
      // metrics over the folded history (hist.init months of onTime)
      // under the corrected dims/rates the applied phases landed.
      val bm = date_format(
        to_date(col("booking_date"), Curate.RawDateFormat), "yyyy-MM")
      val appliedCurated = Curate.curate(
        onTime.filter(bm.isin(hist.init: _*)),
        correctedApts, correctedAttrs, correctedRates)
      val expPopular = Present.weeklyPopularCities(appliedCurated)
      assert(rows(spark.read
          .parquet(s"$out/presentation.most_popular_location")).sorted ==
        rows(expPopular).sorted,
        "published Gold not republished from applied phases by abort")
      // applied phases persist: dim, attr, and the resumed rate fix
      // are in the current dims; un-started phases never landed
      assert(rows(Pipeline.currentRates(spark, out)).sorted ==
        rows(correctedRates).sorted, "rate fix lost by abort")
      assert(rows(Curate.dedup(
          Pipeline.currentApartmentsRaw(spark, sf, out))).sorted ==
        rows(Curate.dedup(correctedApts)).sorted,
        "dim update lost by abort")
      val lateIds = late.select("booking_id").distinct()
      val silverLate = spark.read
        .parquet(s"$out/curated.apartment_bookings")
        .join(lateIds, Seq("booking_id"), "left_semi").count()
      assert(silverLate == 0, "an aborted (un-started) late phase " +
        "must not have touched Silver")
      // and the warehouse accepts new work again
      Pipeline.runIncrementalWindow(spark, sf, out, Seq(hist.last),
        rawBookings = Some(onTime), rawEvents = Some(baseEvents),
        writeGold = false)
    } finally {
      Pipeline.serializeStages.remove()
      Pipeline.stageBoundaryHook.remove()
    }
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(out))
  }
}
