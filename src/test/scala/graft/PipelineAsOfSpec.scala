package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.etl.{Analog, Curate, Present}
import graft.io.Tables

/** TIME TRAVEL ([[Pipeline.goldAsOf]]): every Gold table as of a past
  * fold, reconstructed read-only by applying the LATER folds' undo
  * snapshots in reverse. The horizon is the undo retention
  * ([[Pipeline.UndoKeep]]): the last UndoKeep-1 folds are rewindable,
  * deeper asks fail loudly (absence of a pruned snapshot is
  * indistinguishable from "fold didn't touch this state").
  *
  * Legs: anchor = the newest fold (identity — asOf ≡ live Gold);
  * anchor = 1 and 2 folds back (each ≡ the rebuild over the history
  * that had been folded at that moment); anchor past the horizon
  * (loud); and the repair case — a rate fold on top, then asOf to the
  * pre-repair anchor serves the ORIGINAL-rate Gold (rewind across a
  * repair fold, not just across appends).
  */
class PipelineAsOfSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq

  private lazy val shiftedEvents = Tables.events(spark, sf)
    .withColumn("ts", expr("ts - INTERVAL 29 YEARS"))
    .localCheckpoint(true)
  private lazy val months = (Analog.curated(spark, sf)
      .select(date_format(col("booking_date"), "yyyy-MM").as("m"))
      .distinct().as[String].collect() ++
    Analog.apartmentsConverted(spark, sf)
      .select(date_format(col("listing_created_on"), "yyyy-MM").as("m"))
      .distinct().as[String].collect()).toSet.toSeq.sorted

  /** The 8 expected Gold tables over the history folded up to and
    * including month `cutoff`. */
  private def expectedAt(cutoff: String): Map[String, DataFrame] = {
    val cur = Analog.curated(spark, sf)
      .filter(date_format(col("booking_date"), "yyyy-MM") <= cutoff)
    val conv = Analog.apartmentsConverted(spark, sf)
      .filter(date_format(col("listing_created_on"), "yyyy-MM") <= cutoff)
    val evts = shiftedEvents
      .filter(date_format(col("ts"), "yyyy-MM") <= cutoff)
    Map(
      "average_listing_price"  -> Present.weeklyAvgListingPrice(conv),
      "occupancy_rate"         -> Present.monthlyOccupancy(cur),
      "most_popular_location"  -> Present.weeklyPopularCities(cur),
      "top_performing_listing" -> Present.weeklyTopListings(cur),
      "bookings_per_user"      -> Present.bookingsPerUser(cur),
      "avg_booking_duration"   -> Present.monthlyAvgDuration(cur),
      "repeat_customer_rate"   -> Present.monthlyRepeatRate(cur),
      "weekly_engagement"      -> Present.weeklyEngagement(evts))
  }

  private def assertGold(got: Map[String, DataFrame],
                         exp: Map[String, DataFrame], at: String): Unit =
    for ((name, e) <- exp) {
      assert(got(name).schema.map(f => (f.name, f.dataType)) ==
        e.schema.map(f => (f.name, f.dataType)), s"$name schema at $at")
      assert(rows(got(name)) == rows(e), s"$name diverged at $at")
    }

  test("goldAsOf ≡ the Gold of that moment, at every rewindable " +
      "anchor; loud past the horizon; rewinds across a repair fold; " +
      "read-only") {
    // four ledger entries: two windows of the older history, then the
    // last two months as single-month folds
    assert(months.size >= 4, s"need 4 fold anchors, got $months")
    val older = months.dropRight(2)
    val (w1, w2) = older.splitAt(math.max(1, older.size / 2))
    val out = Files.createTempDirectory("graft_asof").toString
    Seq(w1, w2, Seq(months(months.size - 2)), Seq(months.last))
      .filter(_.nonEmpty)
      .foreach { w =>
        Pipeline.runIncrementalWindow(spark, sf, out, w,
          writeGold = false, rawEvents = Some(shiftedEvents)): Unit
      }

    val liveBefore = rows(spark.read
      .parquet(s"$out/state/top_listings/live")).sorted

    // identity: anchor = the newest fold
    assertGold(Pipeline.goldAsOf(spark, out, sf, months.last),
      expectedAt(months.last), months.last)
    // one fold back
    assertGold(Pipeline.goldAsOf(spark, out, sf, months(months.size - 2)),
      expectedAt(months(months.size - 2)), months(months.size - 2))
    // two folds back (the horizon's edge at UndoKeep=3)
    assertGold(Pipeline.goldAsOf(spark, out, sf, w2.max),
      expectedAt(w2.max), w2.max)
    // three folds back: past the horizon — loud, never a wrong rewind
    intercept[IllegalArgumentException] {
      Pipeline.goldAsOf(spark, out, sf, w1.max)
    }
    // an unledgered anchor is loud too
    intercept[IllegalArgumentException] {
      Pipeline.goldAsOf(spark, out, sf, "2999-01")
    }

    // read-only: live state is untouched by the rewinds above
    assert(rows(spark.read.parquet(s"$out/state/top_listings/live"))
      .sorted == liveBefore, "goldAsOf mutated live state")

    // ---- rewind across a REPAIR fold: a rate fix lands on top; asOf
    // to the pre-repair anchor must serve the ORIGINAL-rate Gold ----
    Pipeline.runIncrementalRateUpdate(spark, sf, out,
      Seq(("EUR", 1.25)).toDF("currency", "usd_rate"),
      writeGold = false)
    val preRate = expectedAt(months.last) // original rates
    assertGold(Pipeline.goldAsOf(spark, out, sf, months.last),
      preRate, s"${months.last} pre-rate")
    // and the live Gold moved: the corrected rates changed revenue
    val correctedRates =
      Seq(("USD", 1.0), ("EUR", 1.25), ("INR", 0.012))
        .toDF("currency", "usd_rate")
    val correctedCur = Curate.curate(Analog.bookingsRaw(spark, sf),
      Analog.apartmentsRaw(spark, sf), Analog.attributesRaw(spark, sf),
      correctedRates)
    val rateLabel = Pipeline.ledgerEntries(spark, out).last._1
    assertGold(
      Pipeline.goldAsOf(spark, out, sf, rateLabel),
      Map("top_performing_listing" ->
        Present.weeklyTopListings(correctedCur)),
      "post-rate live")
    assert(rows(Present.weeklyTopListings(correctedCur)) !=
      rows(preRate("top_performing_listing")),
      "rate fix was a no-op — the repair-rewind leg proves nothing")

    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(out))
  }

  test("the persisted prune watermark refuses anchors whose snapshots " +
      "were pruned under a SMALLER UndoKeep — raising GRAFT_UNDO_KEEP " +
      "must not un-refuse them (r11 ADVICE #1)") {
    assert(months.size >= 7, s"need ≥7 fold anchors, got $months")
    val hist = months.take(7) // anchors, not depth — keep the run lean
    val out = Files.createTempDirectory("graft_asof_wm").toString
    // every month folds individually under UndoKeep=3: by the end the
    // watermark sits at the 3rd-newest ledger seq
    hist.foreach { m =>
      Pipeline.runIncrementalWindow(spark, sf, out, Seq(m),
        writeGold = false, rawEvents = Some(shiftedEvents)): Unit
    }
    // operator "remedy": raise UndoKeep well past the ask depth. The
    // old count check would now pass a 4-back anchor whose later
    // folds' undo snapshots are GONE — the watermark must refuse it.
    Pipeline.undoKeepOverride.set(10)
    try {
      val deep = hist(hist.size - 5) // 4 folds back
      val e = intercept[IllegalArgumentException] {
        Pipeline.goldAsOf(spark, out, sf, deep)
      }
      assert(e.getMessage.contains("watermark"),
        s"refusal must cite the watermark, got: ${e.getMessage}")
      // anchors at/after the watermark still serve correctly
      val ok = hist(hist.size - 3) // 2 folds back = the watermark
      assertGold(Pipeline.goldAsOf(spark, out, sf, ok),
        expectedAt(ok), s"$ok under raised UndoKeep")
    } finally Pipeline.undoKeepOverride.set(-1)
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(out))
  }

  test("GRAFT_SNAP_EVERY extends goldAsOf to ANY ledgered fold: deep " +
      "anchors serve from the nearest periodic snapshot + undo rewind, " +
      "at snapshot labels and between them") {
    assert(months.size >= 8, s"need ≥8 fold anchors, got $months")
    val hist = months.take(8) // anchors, not depth — keep the run lean
    val out = Files.createTempDirectory("graft_asof_snap").toString
    Pipeline.snapEveryOverride.set(2)
    try {
      hist.foreach { m =>
        Pipeline.runIncrementalWindow(spark, sf, out, Seq(m),
          writeGold = false, rawEvents = Some(shiftedEvents)): Unit
      }
      // deepest possible anchor: the FIRST fold (hist.size-1 back,
      // far past UndoKeep-1) — seq 0 is itself a snapshot label
      assertGold(Pipeline.goldAsOf(spark, out, sf, hist.head),
        expectedAt(hist.head), s"${hist.head} (snapshot label)")
      // an anchor BETWEEN snapshots (odd seq): nearest snapshot above
      // + one undo application
      assertGold(Pipeline.goldAsOf(spark, out, sf, hist(1)),
        expectedAt(hist(1)), s"${hist(1)} (between snapshots)")
      // the newest fold still serves from live
      assertGold(Pipeline.goldAsOf(spark, out, sf, hist.last),
        expectedAt(hist.last), s"${hist.last} (live)")
      // snapshot markers exist only at the cadence
      val snaps = new java.io.File(s"$out/state/_snapshots")
      assert(Option(snaps.list()).getOrElse(Array.empty)
        .count(_.startsWith("asof=")) >= hist.size / 2,
        "periodic snapshots missing")
    } finally Pipeline.snapEveryOverride.set(-1)
    // back in pruning mode the same deep ask is refused loudly — the
    // horizon contract is mode-dependent, never silently wrong
    intercept[IllegalArgumentException] {
      Pipeline.goldAsOf(spark, out, sf, hist.head)
    }
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(out))
  }
}
