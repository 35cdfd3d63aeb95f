package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.etl.{Analog, Curate, GoldState, Present}
import graft.io.Tables

/** MULTI-NIGHT SOAK UNDER SNAPSHOT MODE (r12 verdict ask #2): the r11
  * soak proved the nightly algebra under default undo pruning;
  * compaction and snapshots were each specced standalone but never
  * COMPOSED with the nightly machinery they run inside. This spec
  * drives the same three-night shape with `GRAFT_SNAP_EVERY = 2` and
  * snapshot retention `GRAFT_SNAP_KEEP = 3` active throughout, a
  * rollback+refold between nights, a bucket deliberately fragmented
  * before a night that runs window + compaction TOGETHER, and asserts
  * after each night that the warehouse ≡ the one-shot rebuild over
  * that night's cumulative corrected inputs; then the snapshot-mode
  * payoffs and bounds:
  *
  *  - a DEEP cross-night anchor (night 1's close, read after night 3,
  *    past the UndoKeep window that refused it in the pruning-mode
  *    soak) serves exactly, from the nearest retained snapshot;
  *  - goldAsOf is transparent across the compaction fold;
  *  - retention holds: exactly SnapKeep complete snapshots remain (the
  *    newest cadence seqs), dead undos are gone, the watermark
  *    advanced, and a below-watermark anchor is refused loudly;
  *  - the files-per-bucket census bound survives the composed night.
  */
class PipelineSnapSoakSpec extends SparkSpec {
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
  }

  private def assertWarehouse(out: String, exp: Expected,
                              night: String): Unit = {
    for ((name, e) <- exp.gold)
      assert(rows(spark.read.parquet(s"$out/presentation.$name")).sorted
          == rows(e).sorted,
        s"published Gold $name diverged after $night")
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

  /** Fragment one live bucket the way an unaligned writer would. */
  private def fragment(out: String, state: String, bucket: String,
                       n: Int): Unit = {
    val dir = s"$out/state/$state/live/state_bucket=$bucket"
    val content = spark.read.parquet(dir).localCheckpoint(true)
    content.repartition(n).write.mode("overwrite").parquet(dir)
    new java.io.File(dir, "_SUCCESS").delete(): Unit
  }

  test("three nightlies under SNAP_EVERY=2 + SNAP_KEEP=3 with a " +
      "rollback+refold, a window+compaction night, retention pruning, " +
      "and deep cross-night goldAsOf anchors — each night ≡ one-shot") {
    val hist = months.take(8)
    val out = Files.createTempDirectory("graft_snapsoak").toString
    Pipeline.snapEveryOverride.set(2)
    Pipeline.snapKeepOverride.set(3)
    try {
      // base: 6 single-month folds (seqs 0..5; cadence snapshots 0,2,4)
      hist.take(6).foreach { m =>
        Pipeline.runIncrementalWindow(spark, sf, out, Seq(m),
          writeGold = false, rawBookings = Some(onTime),
          rawEvents = Some(shiftedEvents)): Unit
      }
      val baseCut = hist(5)

      // ---- night 1: dim correction + late bookings ----
      Pipeline.runNightly(spark, sf, out, Pipeline.NightlyDeltas(
        apartmentUpdates = Some(correctedApts),
        lateBookings = Some(late)))
      val exp1 = Expected(baseCut, onTime.unionByName(late),
        correctedApts, origRates)
      assertWarehouse(out, exp1, "night 1")

      // ---- rollback night 1's late fold, refold, re-verify; in
      // snapshot mode the rollback also drops any snapshot the label
      // carried (PipelineSnapshotSpec pins the content side) ----
      val rolled = Pipeline.rollbackLast(spark, out)
      assert(rolled.matches(""".*\.late\d+"""), s"rolled $rolled")
      Pipeline.resumeLate(spark, sf, out)
      assertWarehouse(out, exp1, "night 1 (after rollback + refold)")

      // ---- night 2: rate fix + next month's window ----
      val win2 = hist(6)
      Pipeline.runNightly(spark, sf, out, Pipeline.NightlyDeltas(
        rateUpdates = Some(rateFix),
        windowMonths = Seq(win2),
        windowBookings = Some(onTime),
        windowEvents = Some(shiftedEvents)))
      val exp2 = Expected(win2, onTime.unionByName(late),
        correctedApts, correctedRates)
      assertWarehouse(out, exp2, "night 2")

      // ---- fragment an early-month bucket no later fold touches,
      // then night 3: window + compaction in ONE night ----
      val earlyBucket = Pipeline.bucketFileCounts(spark, out)
        .filter(t => t._1 == GoldState.topListings.name &&
          t._2.startsWith(hist.head)).head
      fragment(out, earlyBucket._1, earlyBucket._2, 5)
      assert(Pipeline.bucketFileCounts(spark, out)
          .exists(_._3 > Pipeline.StateFilesPerBucket),
        "fragmentation setup did nothing")
      val win3 = hist(7)
      Pipeline.runNightly(spark, sf, out, Pipeline.NightlyDeltas(
        windowMonths = Seq(win3),
        windowBookings = Some(onTime),
        windowEvents = Some(shiftedEvents),
        compactBuckets = true))
      val exp3 = Expected(win3, onTime.unionByName(late),
        correctedApts, correctedRates)
      assertWarehouse(out, exp3, "night 3")
      assert(Pipeline.bucketFileCounts(spark, out)
          .forall(_._3 <= Pipeline.StateFilesPerBucket),
        "census bound broken after the window+compaction night")

      // ---- snapshot-mode payoffs and bounds ----
      val entries = Pipeline.ledgerEntries(spark, out)
      val labels = entries.map(_._1)
      val cmpLabel = labels.filter(_.matches(""".*\.cmp\d+""")).last
      val lateLabel = labels.filter(_.matches(""".*\.late\d+""")).last
      val rateLabel = labels.filter(_.matches(""".*\.rate\d+""")).last

      // compaction is goldAsOf-transparent in snapshot mode too
      assertGoldOnly(Pipeline.goldAsOf(spark, out, sf, cmpLabel), exp3,
        s"$cmpLabel (compaction fold)")
      // DEEP cross-night anchor: night 1's close, read after night 3 —
      // 4+ folds back, past the UndoKeep window the pruning-mode soak
      // is refused at; snapshots make it exact
      assertGoldOnly(Pipeline.goldAsOf(spark, out, sf, lateLabel), exp1,
        s"$lateLabel (night-1 close, read after night 3)")
      // mid-night-2 anchor: rates corrected, window not yet folded
      val expMid = Expected(baseCut, onTime.unionByName(late),
        correctedApts, correctedRates)
      assertGoldOnly(Pipeline.goldAsOf(spark, out, sf, rateLabel), expMid,
        s"$rateLabel (mid-night-2, read after night 3)")

      // retention: exactly SnapKeep complete markers remain, and they
      // are the NEWEST cadence seqs
      val snapDir = new java.io.File(s"$out/state/_snapshots")
      val markers = Option(snapDir.list()).getOrElse(Array.empty)
        .filter(_.startsWith("asof=")).map(_.stripPrefix("asof="))
        .filter(l => new java.io.File(
          s"$out/state/_snapshots/asof=$l/_complete").exists())
        .toSet
      val cadence = entries.filter(_._2 % 2 == 0)
      val expectRetained = cadence.takeRight(3).map(_._1).toSet
      assert(markers == expectRetained,
        s"retained snapshots $markers != expected $expectRetained")
      // the watermark sits at the oldest retained snapshot's seq, and
      // a below-watermark anchor is refused loudly
      val wmSeq = cadence.takeRight(3).head._2
      val wm = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$out/state/_undo_watermark")),
        "UTF-8").trim
      assert(wm == wmSeq.toString, s"watermark $wm != $wmSeq")
      val deep = entries.find(_._2 == wmSeq - 1).get._1
      val e = intercept[IllegalArgumentException] {
        Pipeline.goldAsOf(spark, out, sf, deep)
      }
      assert(e.getMessage.contains("watermark"),
        s"below-watermark refusal must cite the watermark: ${e.getMessage}")
      // dead undos are gone: no undo dir for any fold at/below the
      // watermark in any state
      val seqOf = entries.toMap
      for (s <- GoldState.all) {
        val undo = new java.io.File(s"$out/state/${s.name}/undo")
        val stale = Option(undo.list()).getOrElse(Array.empty)
          .filter(_.startsWith("asof=")).map(_.stripPrefix("asof="))
          .filter(l => seqOf.get(l).exists(_ <= wmSeq))
        assert(stale.isEmpty,
          s"dead undos survived retention in ${s.name}: ${stale.toSeq}")
      }
    } finally {
      Pipeline.snapEveryOverride.set(-1)
      Pipeline.snapKeepOverride.set(-1)
    }
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(out))
  }
}
