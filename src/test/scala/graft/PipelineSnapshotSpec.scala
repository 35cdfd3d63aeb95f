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

  test("SnapKeep=1: retention at a cadence-aligned newest fold caps " +
      "the watermark at newestSeq-1, so the newest fold's undo " +
      "survives and rollbackLast still RESTORES; a rollback past the " +
      "pruned horizon refuses loudly (r13 ADVICE, high)") {
    assert(months.size >= 3, s"need 3 fold months, got $months")
    val hist = months.take(3)
    val m2 = hist.last
    val all = Analog.bookingsRaw(spark, sf).localCheckpoint(true)
    val isHeld = date_format(
      to_date(col("booking_date"), Curate.RawDateFormat), "yyyy-MM")
      .===(m2) && col("booking_id") % 3 === 0
    val partial = all.filter(!isHeld).localCheckpoint(true)
    assert(all.count() > partial.count(), "held-back slice is empty")
    val out = Files.createTempDirectory("graft_snap_keep1").toString
    Pipeline.snapEveryOverride.set(1) // EVERY fold is cadence-aligned
    Pipeline.snapKeepOverride.set(1)  // the advisor's exact setting
    try {
      hist.foreach { m =>
        Pipeline.runIncrementalWindow(spark, sf, out, Seq(m),
          writeGold = false, rawBookings = Some(partial),
          rawEvents = Some(shiftedEvents)): Unit
      }
      // seqs 0,1,2 each snapshotted; retention keeps only seq 2 — the
      // NEWEST fold. The pre-fix advance set wm=keepOldest=2 and the
      // undo prune (seq <= wm) deleted the newest fold's own undo;
      // the capped advance stops at newestSeq-1 = 1.
      val wm = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$out/state/_undo_watermark")),
        "UTF-8").trim
      assert(wm == "1", s"watermark must cap at newestSeq-1=1, got '$wm'")
      for (i <- Seq(0, 1))
        assert(!new java.io.File(
            s"$out/state/_snapshots/asof=${hist(i)}").exists(),
          s"snapshot at seq $i survived SnapKeep=1 retention")
      assert(new java.io.File(
          s"$out/state/_snapshots/asof=$m2/_complete").exists(),
        "the newest snapshot must be retained")
      val tl = graft.etl.GoldState.topListings.name
      assert(new java.io.File(s"$out/state/$tl/undo/asof=$m2").exists(),
        "the newest fold's undo must survive the retention prune")
      // the rollback actually RESTORES (pre-fix: absent undo read as
      // "untouched", silent skip, refold double-applies into Gold)
      assert(Pipeline.rollbackLast(spark, out) == m2)
      Pipeline.runIncrementalWindow(spark, sf, out, Seq(m2),
        writeGold = false, rawBookings = Some(all),
        rawEvents = Some(shiftedEvents)): Unit
      assertGold(Pipeline.goldAsOf(spark, out, sf, m2),
        expectedAt(m2, all), s"$m2 after SnapKeep=1 rollback+refold")
      assert(rows(expectedAt(m2, all)("occupancy_rate")) !=
        rows(expectedAt(m2, partial)("occupancy_rate")),
        "held-back slice did not change the Gold")
      // a second rollback of the refolded m2 is still provably safe
      // (its undo was just rewritten) ...
      assert(Pipeline.rollbackLast(spark, out) == m2)
      // ... but the fold BELOW the watermark lost its undos to the
      // retention prune: refuse loudly, never a silent skip
      val e = intercept[IllegalArgumentException] {
        Pipeline.rollbackLast(spark, out)
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

  test("retention crash sweep: a crash after the watermark advance, " +
      "and a crash after the snapshot drop, are both retried to " +
      "completion by later folds — including the undo prune, which " +
      "keys off the persisted watermark (a drop-set-keyed retry " +
      "would never run again once the drop completed)") {
    assert(months.size >= 10, s"need 10 fold months, got $months")
    val hist = months.take(10)
    val out = Files.createTempDirectory("graft_snap_crash").toString
    Pipeline.snapEveryOverride.set(2)
    Pipeline.snapKeepOverride.set(2)
    Pipeline.serializeStages.set(true)
    try {
      def fold(m: String): Unit =
        Pipeline.runIncrementalWindow(spark, sf, out, Seq(m),
          writeGold = false, rawEvents = Some(shiftedEvents)): Unit
      def wmFile: String = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$out/state/_undo_watermark")),
        "UTF-8").trim
      def marker(l: String) = new java.io.File(
        s"$out/state/_snapshots/asof=$l/_complete")
      def undoLabels(state: String): Set[String] = {
        val d = new java.io.File(s"$out/state/$state/undo")
        Option(d.list()).getOrElse(Array.empty)
          .filter(_.startsWith("asof=")).map(_.stripPrefix("asof=")).toSet
      }
      val tl = graft.etl.GoldState.topListings.name

      // seqs 0..5; at seq 4's retention: drop seq-0 snapshot, wm=2
      hist.take(6).foreach(fold)
      assert(wmFile == "2")

      // ---- leg A: crash right after the watermark ADVANCE (before
      // the drop) at seq 6's retention (wm 2 → 4) ----
      Pipeline.stageBoundaryHook.set(n =>
        if (n == "snap.retention.watermark")
          throw new RuntimeException(s"injected at $n"))
      intercept[RuntimeException] { fold(hist(6)) }
      Pipeline.stageBoundaryHook.remove()
      assert(wmFile == "4", "watermark did not land before the crash")
      assert(marker(hist(2)).exists(),
        "drop ran before the injected crash — wrong boundary")
      // degraded window is correct-side: over-refusal below the new
      // watermark, exact service at/above it
      intercept[IllegalArgumentException] {
        Pipeline.goldAsOf(spark, out, sf, hist(3))
      }
      assertGold(Pipeline.goldAsOf(spark, out, sf, hist(5)),
        expectedAt(hist(5), Analog.bookingsRaw(spark, sf)),
        s"${hist(5)} during the degraded retention window")
      // next fold retries the drop and the undo prune to completion
      fold(hist(7))
      assert(!marker(hist(2)).exists(), "retry did not finish the drop")
      assert(!undoLabels(tl).exists(l => hist.indexOf(l) >= 0 &&
          hist.indexOf(l) <= 4),
        s"retry did not finish the undo prune: ${undoLabels(tl)}")

      // ---- leg B: crash right after the DROP (before the undo
      // prune) at seq 8's retention (drop seq-4 snapshot, wm 4 → 6) ----
      Pipeline.stageBoundaryHook.set(n =>
        if (n == "snap.retention.drop")
          throw new RuntimeException(s"injected at $n"))
      intercept[RuntimeException] { fold(hist(8)) }
      Pipeline.stageBoundaryHook.remove()
      assert(wmFile == "6" && !marker(hist(4)).exists())
      assert(undoLabels(tl).exists(l => Seq(hist(5), hist(6)).contains(l)),
        "undo prune ran before the injected crash — wrong boundary")
      // seq 9's retention has NOTHING left to drop (snaps == SnapKeep)
      // — the watermark-keyed undo stage must still prune the dead
      // deltas the crash orphaned
      fold(hist(9))
      for (s <- graft.etl.GoldState.all) {
        val stale = undoLabels(s.name)
          .filter(l => hist.indexOf(l) >= 0 && hist.indexOf(l) <= 6)
        assert(stale.isEmpty,
          s"dead undos leaked past the crash in ${s.name}: $stale")
      }
      // full service across the retained horizon after both crashes
      for (i <- Seq(7, 8, 9))
        assertGold(Pipeline.goldAsOf(spark, out, sf, hist(i)),
          expectedAt(hist(i), Analog.bookingsRaw(spark, sf)),
          s"${hist(i)} after both retention crashes")
      intercept[IllegalArgumentException] {
        Pipeline.goldAsOf(spark, out, sf, hist(5))
      }
    } finally {
      Pipeline.stageBoundaryHook.remove()
      Pipeline.serializeStages.remove()
      Pipeline.snapEveryOverride.set(-1)
      Pipeline.snapKeepOverride.set(-1)
    }
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(out))
  }

  test("a crash MID-SWEEP (one state's snapshot written, marker " +
      "absent) repairs at the next fold — together with the crashed " +
      "fold's own never-written snapshot") {
    assert(months.size >= 6, s"need 6 fold months, got $months")
    val hist = months.take(6)
    val out = Files.createTempDirectory("graft_sweep_crash").toString
    Pipeline.snapEveryOverride.set(2)
    Pipeline.serializeStages.set(true)
    try {
      def fold(m: String): Unit =
        Pipeline.runIncrementalWindow(spark, sf, out, Seq(m),
          writeGold = false, rawEvents = Some(shiftedEvents)): Unit
      hist.take(4).foreach(fold) // seqs 0..3; snapshots at 0, 2
      val lost = hist(2)
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(s"$out/state/_snapshots/asof=$lost"))
      for {
        d <- new java.io.File(s"$out/state").listFiles().toSeq
        snap = new java.io.File(d, s"snap/asof=$lost")
        if snap.exists()
      } org.apache.commons.io.FileUtils.deleteDirectory(snap)
      // fold seq 4: the sweep reconstructs seq 2 FIRST (ledger
      // order); crash after its first state's snapshot write — both
      // seq 2 (partial, no marker) and seq 4 (never started) are lost
      var fired = false
      Pipeline.stageBoundaryHook.set(n =>
        if (n == s"snapshot.${graft.etl.GoldState.listingPrice.name}" &&
            !fired) {
          fired = true; throw new RuntimeException(s"injected at $n")
        })
      intercept[RuntimeException] { fold(hist(4)) }
      Pipeline.stageBoundaryHook.remove()
      assert(!new java.io.File(
          s"$out/state/_snapshots/asof=$lost/_complete").exists())
      // next fold's sweep repairs BOTH
      fold(hist(5))
      for ((l, seq) <- Seq(lost -> 2, hist(4) -> 4)) {
        val m = new java.io.File(s"$out/state/_snapshots/asof=$l/_complete")
        assert(m.exists(), s"sweep did not repair asof=$l")
        val stamp = new String(
          java.nio.file.Files.readAllBytes(m.toPath), "UTF-8").trim
        assert(stamp == seq.toString, s"asof=$l stamped '$stamp'")
        assertGold(Pipeline.goldAsOf(spark, out, sf, l),
          expectedAt(l, Analog.bookingsRaw(spark, sf)),
          s"$l from the crash-repaired snapshot")
      }
    } finally {
      Pipeline.stageBoundaryHook.remove()
      Pipeline.serializeStages.remove()
      Pipeline.snapEveryOverride.set(-1)
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
