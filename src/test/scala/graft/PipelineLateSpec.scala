package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.etl.{Analog, Curate}

/** Late-arriving data: bookings for already-folded months withheld
  * from the window folds and delivered afterwards through
  * `runIncrementalLate` must land the 7 Gold tables row-bit-identical
  * to a full rebuild over ALL the data — order-free metrics by
  * merge, the repeat-rate family by the targeted per-user repair. */
class PipelineLateSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("late bookings repair the folded Gold to the full rebuild") {
    val outFull = Files.createTempDirectory("graft_late_full").toString
    val outIncr = Files.createTempDirectory("graft_late_incr").toString
    val full = Pipeline.run(spark, sf, outFull)

    val bookingMonths = Analog.curated(spark, sf)
      .select(date_format(col("booking_date"), "yyyy-MM").as("m"))
      .distinct().as[String].collect()
    val listingMonths = Analog.apartmentsConverted(spark, sf)
      .select(date_format(col("listing_created_on"), "yyyy-MM").as("m"))
      .distinct().as[String].collect()
    // event months included: the rebuild publishes weekly_engagement,
    // so the folded warehouse must too (they sort after every booking
    // month and fold as their own trailing windows)
    val eventMonths = io.Tables.events(spark, sf)
      .select(date_format(col("ts"), "yyyy-MM").as("m"))
      .distinct().as[String].collect()
    val months = (bookingMonths ++ listingMonths ++ eventMonths)
      .toSet.toSeq.sorted

    // withhold every 3rd booking of two mid-history months — their
    // users' LATER bookings get folded with a wrong LAG carry that
    // the late repair must fix
    val lateMonths = bookingMonths.sorted
      .slice(bookingMonths.length / 2, bookingMonths.length / 2 + 2)
    val raw = Analog.bookingsRaw(spark, sf)
    val monthOfRaw = date_format(
      expr(s"try_to_date(booking_date, '${Curate.RawDateFormat}')"),
      "yyyy-MM")
    val isLate = monthOfRaw.isin(lateMonths: _*) &&
      col("booking_id") % 3 === 0
    val lateRows = raw.filter(isLate)
    assert(lateRows.count() > 0)

    months.grouped(12).foreach { w =>
      Pipeline.runIncrementalWindow(spark, sf, outIncr, w,
        writeGold = false, rawBookings = Some(raw.filter(!isLate)))
    }

    // ---- deliver HALF the late rows normally; simulate the OTHER
    // half's runIncrementalLate crashing right after its delta
    // persist — BEFORE the Silver rewrite (the r9 crash window:
    // resumeLate used to fold the delta into state while Silver never
    // received the rows → silent permanent divergence) ----
    val lateA = lateRows.filter(col("booking_id") % 2 === 0)
    val lateB = lateRows.filter(col("booking_id") % 2 =!= 0)
    assert(lateA.count() > 0 && lateB.count() > 0)
    Pipeline.runIncrementalLate(spark, sf, outIncr, lateA,
      writeGold = false)

    val silverDir = s"$outIncr/curated.apartment_bookings"
    val doneB = Pipeline.processedMonths(outIncr)
    val maxBaseB = doneB.map(_.take(7)).max
    val labelB = f"$maxBaseB.late${doneB.count(_.startsWith(maxBaseB))}%02d"
    val lateCuratedB = Curate.curate(lateB,
        graft.etl.Analog.apartmentsRaw(spark, sf),
        graft.etl.Analog.attributesRaw(spark, sf),
        graft.io.Tables.exchangeRates(spark))
      .withColumn("booking_month", date_format(col("booking_date"), "yyyy-MM"))
    val existingB = spark.read.parquet(silverDir)
    // replicate runIncrementalLate exactly up to its first persist
    Curate.dedup(lateCuratedB)
      .select(existingB.columns.map(col).toSeq: _*)
      .exceptAll(existingB)
      .write.mode("overwrite")
      .parquet(s"$outIncr/state/_late_delta/asof=$labelB")
    assert(Pipeline.pendingLate(spark, outIncr) == Seq(labelB))
    // resume must RE-APPLY the Silver rewrite from the persisted
    // delta (it never ran) and then fold — Gold AND Silver land
    // identical to the full rebuild below
    val out = Pipeline.resumeLate(spark, sf, outIncr).head
    assert(Pipeline.pendingLate(spark, outIncr).isEmpty)

    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq
    for ((name, fullDf) <- full.metrics) {
      val inc = out.gold(name)
      assert(inc.schema.map(f => (f.name, f.dataType)) ==
        fullDf.schema.map(f => (f.name, f.dataType)), name)
      assert(rows(inc) == rows(fullDf), s"$name rows diverged after late repair")
    }
    val silverF = rows(spark.read
      .parquet(s"$outFull/curated.apartment_bookings")).sorted
    val silverI = rows(spark.read
      .parquet(s"$outIncr/curated.apartment_bookings")).sorted
    assert(silverF == silverI)

    // ---- simulated crash AFTER the Silver rewrite, BEFORE the state
    // fold completed: ledger marker and part of the label's state
    // gone, but the PERSISTED late delta remains. Both fold entry
    // points must refuse loudly (the late rows are in Silver but not
    // in state — a silent retry would lose them: its exceptAll diff
    // is empty), and resumeLate must finish the fold from the
    // persisted delta to the same bit-exact Gold ----
    val lateLabel = Pipeline.processedMonths(outIncr).last
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(
      s"$outIncr/state/_ledger/asof=$lateLabel"))
    // a touched repeat_flags live bucket lost mid-write (the late
    // months' repaired users certainly have flags in them)
    val lostBucket = new java.io.File(
      s"$outIncr/state/repeat_flags/live/state_bucket=${lateMonths.head}-01")
    assert(lostBucket.isDirectory, s"expected touched bucket $lostBucket")
    org.apache.commons.io.FileUtils.deleteDirectory(lostBucket)
    assert(Pipeline.pendingLate(spark, outIncr) == Seq(lateLabel))
    val exW = intercept[IllegalArgumentException] {
      Pipeline.runIncremental(spark, sf, outIncr, "2099-01")
    }
    assert(exW.getMessage.contains("pending"), exW.getMessage)
    val exL = intercept[IllegalArgumentException] {
      Pipeline.runIncrementalLate(spark, sf, outIncr, lateRows)
    }
    assert(exL.getMessage.contains("pending"), exL.getMessage)
    val resumed = Pipeline.resumeLate(spark, sf, outIncr)
    assert(resumed.size == 1 && Pipeline.pendingLate(spark, outIncr).isEmpty)
    for ((name, fullDf) <- full.metrics) {
      assert(rows(resumed.head.gold(name)) == rows(fullDf),
        s"$name diverged after crash resume")
    }

    // redelivering the SAME late rows is a no-op: every row full-row
    // -duplicates Silver, so lateNew is empty and all state survives
    val again = Pipeline.runIncrementalLate(spark, sf, outIncr, lateRows)
    assert(again.deltaSilver.count() == 0)
    for ((name, fullDf) <- full.metrics) {
      assert(rows(again.gold(name)) == rows(fullDf),
        s"$name changed under duplicate late delivery")
    }

    // genuinely NEW months must be refused toward the window path
    val futureRows = raw.filter(monthOfRaw === months.max)
    if (futureRows.limit(1).count() > 0) {
      // months.max is folded, so this is fine; a synthetic future
      // month (shift the date) must refuse
      val shifted = futureRows.withColumn("booking_date",
        date_format(add_months(
          expr(s"try_to_date(booking_date, '${Curate.RawDateFormat}')"),
          120), Curate.RawDateFormat))
      val ex = intercept[IllegalArgumentException] {
        Pipeline.runIncrementalLate(spark, sf, outIncr, shifted)
      }
      assert(ex.getMessage.contains("NEWER"), ex.getMessage)
    }
  }
}
