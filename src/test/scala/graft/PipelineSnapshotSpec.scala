package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.etl.{Analog, Curate, Present}
import graft.io.Tables

/** Snapshot-mode durability hardening (r12 ADVICE + verdict ask #3):
  *
  *  1. ADVICE #1 (high): a rollback must DELETE the rolled-back
  *     label's periodic full snapshot — labels AND ledger seqs are
  *     deterministically reused after rollback+refold, so the stale
  *     snapshot would otherwise pass every marker check and
  *     [[Pipeline.goldAsOf]] would silently serve rolled-back Gold.
  *  2. ADVICE #2 (medium): the prune watermark write is atomic
  *     (tmp + rename) and every crash window recovers — never a
  *     torn file bricking all later folds.
  *  3. ADVICE #4 (low): a cadence snapshot lost to a crash between
  *     the ledger marker and the snapshot write is REPAIRED by the
  *     next fold's sweep (reconstructed from live rewound through the
  *     retained undo deltas), restoring the ≤ SnapEvery rewind bound.
  *  4. Verdict ask #3: GRAFT_SNAP_KEEP retention — keep the newest M
  *     snapshots, prune dead undo deltas, advance the watermark;
  *     anchors at/after the oldest retained snapshot stay exact,
  *     older ones are refused loudly.
  *  5. ADVICE #3 (low): StateFilesPerBucket > 1 is an upper BOUND on
  *     the per-bucket file fan-out, not an exact count.
  */
class PipelineSnapshotSpec extends SparkSpec {
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

  /** The 8 expected Gold tables over history ≤ `cutoff`, from the
    * given booking feed. */
  private def expectedAt(cutoff: String,
                         bookings: DataFrame): Map[String, DataFrame] = {
    val cur = Curate.curate(bookings, Analog.apartmentsRaw(spark, sf),
        Analog.attributesRaw(spark, sf),
        Seq(("USD", 1.0), ("EUR", 1.1), ("INR", 0.012))
          .toDF("currency", "usd_rate"))
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
    for ((name, e) <- exp)
      assert(rows(got(name)) == rows(e), s"$name diverged at $at")

  test("rollback deletes the label's full snapshot: a rollback+refold " +
      "that REUSES the label and seq with different content must serve " +
      "the refolded Gold, never the stale snapshot (r12 ADVICE #1)") {
    assert(months.size >= 3, s"need 3 fold months, got $months")
    val hist = months.take(3)
    val m2 = hist.last
    // the refold's content differs: a third of m2's bookings are held
    // back first, then the refold includes them
    val all = Analog.bookingsRaw(spark, sf).localCheckpoint(true)
    val isHeld = date_format(
      to_date(col("booking_date"), Curate.RawDateFormat), "yyyy-MM")
      .===(m2) && col("booking_id") % 3 === 0
    val partial = all.filter(!isHeld).localCheckpoint(true)
    assert(all.count() > partial.count(), "held-back slice is empty")
    val out = Files.createTempDirectory("graft_snap_rb").toString
    Pipeline.snapEveryOverride.set(1) // snapshot at every fold
    try {
      hist.foreach { m =>
        Pipeline.runIncrementalWindow(spark, sf, out, Seq(m),
          writeGold = false, rawBookings = Some(partial),
          rawEvents = Some(shiftedEvents)): Unit
      }
      val snapMarker = new java.io.File(
        s"$out/state/_snapshots/asof=$m2/_complete")
      assert(snapMarker.exists(), "premise: snapshot at the last fold")

      val rolled = Pipeline.rollbackLast(spark, out)
      assert(rolled == m2)
      // the label's snapshot is gone the moment the rollback returns
      assert(!new java.io.File(s"$out/state/_snapshots/asof=$m2").exists(),
        "stale global snapshot marker survived the rollback")
      assert(!new java.io.File(
          s"$out/state/top_listings/snap/asof=$m2").exists(),
        "stale per-state snapshot survived the rollback")

      // refold the SAME month with the full feed: same label, and
      // writeLedger reissues the seq the rollback just freed — the
      // advisor's exact reuse scenario
      Pipeline.runIncrementalWindow(spark, sf, out, Seq(m2),
        writeGold = false, rawBookings = Some(all),
        rawEvents = Some(shiftedEvents)): Unit
      // goldAsOf at the reused label anchors on the REFRESHED snapshot
      // (seq matches again) and must serve the full-feed Gold
      assertGold(Pipeline.goldAsOf(spark, out, sf, m2),
        expectedAt(m2, all), s"$m2 after rollback+refold")
      // the stale and fresh contents genuinely differ, or this proves
      // nothing
      assert(rows(expectedAt(m2, all)("occupancy_rate")) !=
        rows(expectedAt(m2, partial)("occupancy_rate")),
        "held-back slice did not change the Gold")
    } finally Pipeline.snapEveryOverride.set(-1)
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(out))
  }

  test("a cadence snapshot lost between ledger and snapshot write is " +
      "repaired by the next fold's sweep, reconstructed exactly " +
      "(r12 ADVICE #4)") {
    assert(months.size >= 5, s"need 5 fold months, got $months")
    val hist = months.take(5)
    val out = Files.createTempDirectory("graft_snap_sweep").toString
    Pipeline.snapEveryOverride.set(2) // cadence snapshots at seq 0, 2, 4
    try {
      hist.take(4).foreach { m =>
        Pipeline.runIncrementalWindow(spark, sf, out, Seq(m),
          writeGold = false, rawEvents = Some(shiftedEvents)): Unit
      }
      val lost = hist(2) // seq 2, on cadence
      // simulate the crash: the fold is ledgered but its snapshot
      // never landed
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(s"$out/state/_snapshots/asof=$lost"))
      for {
        d <- new java.io.File(s"$out/state").listFiles().toSeq
        snap = new java.io.File(d, s"snap/asof=$lost")
        if snap.exists()
      } org.apache.commons.io.FileUtils.deleteDirectory(snap)

      // the next fold's sweep must rebuild it
      Pipeline.runIncrementalWindow(spark, sf, out, Seq(hist(4)),
        writeGold = false, rawEvents = Some(shiftedEvents)): Unit
      val marker = new java.io.File(
        s"$out/state/_snapshots/asof=$lost/_complete")
      assert(marker.exists(), "sweep did not repair the lost snapshot")
      val stamp = new String(java.nio.file.Files.readAllBytes(
        marker.toPath), "UTF-8").trim
      assert(stamp == "2", s"marker must stamp the fold seq, got '$stamp'")
      // anchored at the reconstructed snapshot (zero undo
      // applications), the Gold is exact
      assertGold(Pipeline.goldAsOf(spark, out, sf, lost),
        expectedAt(lost, Analog.bookingsRaw(spark, sf)),
        s"$lost from the reconstructed snapshot")
    } finally Pipeline.snapEveryOverride.set(-1)
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(out))
  }

  test("GRAFT_SNAP_KEEP retention keeps the newest M snapshots, prunes " +
      "dead undo deltas, advances the watermark; retained anchors stay " +
      "exact, older ones are refused (r12 verdict ask #3)") {
    assert(months.size >= 8, s"need 8 fold months, got $months")
    val hist = months.take(8) // seqs 0..7; cadence snapshots 0,2,4,6
    val out = Files.createTempDirectory("graft_snap_keep").toString
    Pipeline.snapEveryOverride.set(2)
    Pipeline.snapKeepOverride.set(2) // retain snapshots at seq 4 and 6
    try {
      hist.foreach { m =>
        Pipeline.runIncrementalWindow(spark, sf, out, Seq(m),
          writeGold = false, rawEvents = Some(shiftedEvents)): Unit
      }
      // dropped snapshots are gone, retained ones present
      for (i <- Seq(0, 2))
        assert(!new java.io.File(
            s"$out/state/_snapshots/asof=${hist(i)}").exists(),
          s"snapshot at seq $i survived retention")
      for (i <- Seq(4, 6))
        assert(new java.io.File(
            s"$out/state/_snapshots/asof=${hist(i)}/_complete").exists(),
          s"retained snapshot at seq $i missing")
      // the watermark sits at the oldest retained snapshot's seq
      val wm = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$out/state/_undo_watermark")),
        "UTF-8").trim
      assert(wm == "4", s"watermark must be 4, got '$wm'")
      // dead undo deltas (seq ≤ 4) are pruned; later ones retained
      val occUndo = new java.io.File(
        s"$out/state/${graft.etl.GoldState.topListings.name}/undo")
      val undoLabels = Option(occUndo.list()).getOrElse(Array.empty)
        .filter(_.startsWith("asof=")).map(_.stripPrefix("asof=")).toSet
      for (i <- 0 to 4) assert(!undoLabels(hist(i)),
        s"dead undo at seq $i survived retention: $undoLabels")
      for (i <- 5 to 7) assert(undoLabels(hist(i)),
        s"live undo at seq $i was wrongly pruned: $undoLabels")
      // exact service across the retained horizon: the oldest retained
      // snapshot label, a between-snapshots label, and live
      val bookings = Analog.bookingsRaw(spark, sf)
      for (i <- Seq(4, 5, 7))
        assertGold(Pipeline.goldAsOf(spark, out, sf, hist(i)),
          expectedAt(hist(i), bookings), s"${hist(i)} under retention")
      // below the watermark: loud, citing the watermark
      val e = intercept[IllegalArgumentException] {
        Pipeline.goldAsOf(spark, out, sf, hist(3))
      }
      assert(e.getMessage.contains("watermark"),
        s"refusal must cite the watermark, got: ${e.getMessage}")
    } finally {
      Pipeline.snapEveryOverride.set(-1)
      Pipeline.snapKeepOverride.set(-1)
    }
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(out))
  }

  test("the prune watermark write is atomic and every crash window " +
      "recovers (r12 ADVICE #2)") {
    val root = Files.createTempDirectory("graft_wm").toString + "/state"
    new java.io.File(root).mkdirs()
    def mainF = new java.io.File(s"$root/_undo_watermark")
    def tmpF = new java.io.File(s"$root/_undo_watermark.tmp")
    // roundtrip
    Pipeline.writeWatermark(spark, root, 5L)
    assert(Pipeline.undoWatermark(spark, root) == 5L)
    assert(!tmpF.exists(), "tmp must not linger after a clean write")
    // crash between delete and rename: main gone, complete tmp —
    // recovery serves the tmp value and finishes the rename
    java.nio.file.Files.write(tmpF.toPath, "7".getBytes("UTF-8"))
    mainF.delete()
    assert(Pipeline.undoWatermark(spark, root) == 7L)
    assert(mainF.exists() && !tmpF.exists(),
      "recovery must finish the rename")
    assert(Pipeline.undoWatermark(spark, root) == 7L)
    // crash before the tmp content landed, nothing ever written:
    // garbage tmp is dropped, not trusted
    mainF.delete()
    java.nio.file.Files.write(tmpF.toPath, Array.empty[Byte])
    assert(Pipeline.undoWatermark(spark, root) == Long.MinValue)
    assert(!tmpF.exists(), "garbage tmp must be cleaned")
    // a corrupt MAIN file refuses loudly with the recovery step — the
    // old failure mode was a bare NumberFormatException on every fold
    java.nio.file.Files.write(mainF.toPath, Array.empty[Byte])
    val e = intercept[IllegalStateException] {
      Pipeline.undoWatermark(spark, root)
    }
    assert(e.getMessage.contains("watermark") &&
      e.getMessage.contains("Recover"),
      s"corrupt-watermark refusal must name the recovery, got: " +
        e.getMessage)
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(root).getParentFile)
  }

  test("StateFilesPerBucket > 1 bounds the per-bucket fan-out " +
      "(≤ N, exact only at the default 1 — r12 ADVICE #3)") {
    assert(months.nonEmpty)
    val out = Files.createTempDirectory("graft_fanout").toString
    Pipeline.filesPerBucketOverride.set(3)
    try {
      Pipeline.runIncrementalWindow(spark, sf, out, months.take(2),
        writeGold = false, rawEvents = Some(shiftedEvents)): Unit
      val counts = Pipeline.bucketFileCounts(spark, out)
      assert(counts.nonEmpty)
      val worst = counts.filter(_._3 > 3)
      assert(worst.isEmpty, s"fan-out exceeded the bound: $worst")
    } finally Pipeline.filesPerBucketOverride.set(-1)
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(out))
  }
}
