package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.etl.{Analog, Curate, GoldState, Present}
import graft.io.Tables

/** Regression coverage for the four r10 ADVICE defects:
  *  1. a touched state bucket whose new content is EMPTY must be
  *     deleted (dynamic partition overwrite alone leaves it stale);
  *  2. rollbackLast must pick the newest fold by the ledger's
  *     monotonic `_seq`, never by lexical label sort (`.attNN` sorts
  *     before `.lateNN` on the same base month);
  *  3. the current-dim store must survive a torn write: readers use
  *     the newest COMPLETE version, and a root with NO complete
  *     version fails loudly instead of silently reverting to the feed;
  *  4. with a non-fatal quality gate, null-date listings must be
  *     excluded from the fold partial (skip-and-report), not
  *     re-summed into the `__null__` week on every fold.
  */
class PipelineAdviceSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq

  private def allMonths: Seq[String] =
    (Analog.curated(spark, sf)
        .select(date_format(col("booking_date"), "yyyy-MM").as("m"))
        .distinct().as[String].collect() ++
      Analog.apartmentsConverted(spark, sf)
        .select(date_format(col("listing_created_on"), "yyyy-MM").as("m"))
        .distinct().as[String].collect()).toSet.toSeq.sorted

  private def foldAll(out: String): Unit =
    allMonths.grouped(12).foreach { w =>
      Pipeline.runIncrementalWindow(spark, sf, out, w, writeGold = false)
    }

  test("dim update that empties a week deletes its live bucket " +
      "(fold ≡ rebuild; ADVICE #1)") {
    val out = Files.createTempDirectory("graft_adv_empty").toString
    foldAll(out)

    // listing_created_on = 1995-01-01 + id (ids 1..200 at sf0.001), so
    // Monday-week 1995-01-02 holds EXACTLY ids 1..7. Move all seven
    // +700 days → the 1995-01-02 bucket's new content is EMPTY.
    val orig = Analog.apartmentsRaw(spark, sf)
    val weekIds = (1L to 7L)
    val updates = orig.filter(col("id").isin(weekIds: _*))
      .withColumn("listing_created_on", date_format(
        date_add(to_date(col("listing_created_on"), Curate.RawDateFormat),
          700), Curate.RawDateFormat))
    val emptied = new java.io.File(
      s"$out/state/listing_price/live/state_bucket=1995-01-02")
    assert(emptied.isDirectory, s"expected a live bucket at $emptied")

    val res = Pipeline.runIncrementalDimUpdate(spark, sf, out, updates,
      writeGold = false)

    assert(!emptied.exists,
      "emptied week bucket survived the dim fold — stale rows kept")
    val corrected = graft.ops.Upsert.applyUpdates(orig,
      updates.select(orig.columns.map(col).toSeq: _*), Seq("id"))
    val expected = Present.weeklyAvgListingPrice(
      Curate.convertApartmentPrices(
        Curate.parseRawDates(Curate.dedup(corrected),
          Seq("listing_created_on")),
        Tables.exchangeRates(spark)))
    assert(rows(res.gold("average_listing_price")) == rows(expected),
      "listing_price gold diverged from the corrected-dim rebuild")
    assert(!rows(expected).exists(_.startsWith("1995-01-02|")),
      "sanity: the rebuild should have no 1995-01-02 week either")
  }

  test("rollbackLast orders folds by ledger _seq, not label sort " +
      "(ADVICE #2)") {
    // ---- scenario (a), the r10 bug: base → late01 → att02. Lexical
    // done.last is late01 ('a' < 'l'); fold order's newest is att02,
    // which rollback must pick — and refuse, as a dim-kind fold ----
    val outA = Files.createTempDirectory("graft_adv_seq_a").toString
    val all = Analog.bookingsRaw(spark, sf).localCheckpoint(true)
    val isLate = col("booking_id") % 17 === 3
    allMonths.grouped(12).foreach { w =>
      Pipeline.runIncrementalWindow(spark, sf, outA, w,
        writeGold = false, rawBookings = Some(all.filter(!isLate)))
    }
    Pipeline.runIncrementalLate(spark, sf, outA, all.filter(isLate),
      writeGold = false)
    // id 1: has an attributes row (1 % 10 != 0) AND a confirmed
    // booking at sf0.001, so the reassignment genuinely lands in
    // popular_cities state (id 33 has no confirmed booking here)
    val attUpd = Analog.attributesRaw(spark, sf)
      .filter(col("id") === 1L).withColumn("cityname", lit("ATLANTIS"))
    Pipeline.runIncrementalAttrUpdate(spark, sf, outA, attUpd,
      writeGold = false)
    val entries = Pipeline.ledgerEntries(spark, outA)
    assert(entries.last._1.contains(".att"),
      s"newest-by-seq should be the attr fold: $entries")
    assert(entries.map(_._2) == entries.map(_._2).sorted &&
      entries.map(_._2).distinct == entries.map(_._2),
      s"_seq must be strictly monotonic: $entries")
    val ex = intercept[IllegalArgumentException] {
      Pipeline.rollbackLast(spark, outA)
    }
    assert(ex.getMessage.contains("dim fold"),
      s"rollback should refuse the NEWEST fold (att02), got: ${ex.getMessage}")

    // ---- scenario (b): base → att01 → late02. Rollback correctly
    // targets the late fold; the att repair's city reassignment must
    // SURVIVE the rollback, and resumeLate must restore the exact
    // pre-rollback state ----
    val outB = Files.createTempDirectory("graft_adv_seq_b").toString
    allMonths.grouped(12).foreach { w =>
      Pipeline.runIncrementalWindow(spark, sf, outB, w,
        writeGold = false, rawBookings = Some(all.filter(!isLate)))
    }
    Pipeline.runIncrementalAttrUpdate(spark, sf, outB, attUpd,
      writeGold = false)
    Pipeline.runIncrementalLate(spark, sf, outB, all.filter(isLate),
      writeGold = false)
    def liveRows(name: String): Seq[String] =
      try rows(spark.read.parquet(s"$outB/state/$name/live")).sorted
      catch { // a state no fold has touched (engagement: no events)
        case _: org.apache.spark.sql.AnalysisException => Nil
      }
    val before = GoldState.all.map(s => s.name -> liveRows(s.name)).toMap
    val rolled = Pipeline.rollbackLast(spark, outB)
    assert(rolled.contains(".late"), s"expected to roll the late fold: $rolled")
    assert(liveRows("popular_cities").exists(_.contains("ATLANTIS")),
      "rolling back the late fold reverted the OLDER attr repair")
    val resumed = Pipeline.resumeLate(spark, sf, outB, writeGold = false)
    assert(resumed.size == 1)
    GoldState.all.foreach { s =>
      assert(liveRows(s.name) == before(s.name),
        s"${s.name} diverged after rollback+resume of the late fold")
    }
  }

  test("current-dim store survives a torn write; empty root fails " +
      "loudly (ADVICE #3)") {
    val out = Files.createTempDirectory("graft_adv_atomic").toString
    foldAll(out)
    val orig = Analog.apartmentsRaw(spark, sf)
    val upd1 = orig.filter(col("id") === 3L)
      .withColumn("price", col("price") * 1.1)
    Pipeline.runIncrementalDimUpdate(spark, sf, out, upd1, writeGold = false)
    val upd2 = orig.filter(col("id") === 10L)
      .withColumn("price", col("price") * 1.2)
    Pipeline.runIncrementalDimUpdate(spark, sf, out, upd2, writeGold = false)
    val root = new java.io.File(s"$out/dim/apartments_current")
    def versions = root.listFiles().filter(_.getName.startsWith("v=")).sorted
    assert(versions.length == 2, s"keep-2 GC: ${versions.mkString(",")}")

    // torn write of a NEWER version (no _SUCCESS): readers must keep
    // serving the newest COMPLETE version — upd2's price sticks
    val torn = new java.io.File(root, "v=9999-99.dim99")
    torn.mkdirs()
    java.nio.file.Files.write(new java.io.File(torn, "part-00000.parquet")
      .toPath, Array[Byte](1, 2, 3))
    val served = Pipeline.currentApartmentsRaw(spark, sf, out)
    val expect2 = graft.ops.Upsert.applyUpdates(
      graft.ops.Upsert.applyUpdates(orig,
        upd1.select(orig.columns.map(col).toSeq: _*), Seq("id")),
      upd2.select(orig.columns.map(col).toSeq: _*), Seq("id"))
    assert(rows(served.orderBy("id")) == rows(expect2.orderBy("id")),
      "torn newer version leaked into the served current dim")

    // NO complete version at all → loud failure, never a silent
    // fallback to the original feed
    versions.filterNot(_ == torn).foreach { v =>
      new java.io.File(v, "_SUCCESS").delete()
    }
    val ex = intercept[IllegalArgumentException] {
      Pipeline.currentApartmentsRaw(spark, sf, out).count()
    }
    assert(ex.getMessage.contains("no complete version"), ex.getMessage)
  }

  test("non-fatal gate skips null-date listings from the partial — " +
      "no __null__ double-count across folds (ADVICE #4)") {
    val out = Files.createTempDirectory("graft_adv_nullw").toString
    // seed a current dim carrying one null-date row BEFORE any fold
    val orig = Analog.apartmentsRaw(spark, sf)
    val nullRow = Seq((9901L, "undated", "Brand#1", 50.0, "USD",
        null.asInstanceOf[String], true))
      .toDF("id", "title", "source", "price", "currency",
        "listing_created_on", "is_active")
    orig.unionByName(nullRow.select(orig.columns.map(col).toSeq: _*))
      .write.parquet(s"$out/dim/apartments_current/v=0000-seed")

    val months = allMonths
    val (w1, w2) = months.splitAt(months.size / 2)
    Pipeline.runIncrementalWindow(spark, sf, out, w1,
      failOnViolations = false, writeGold = false)
    val res = Pipeline.runIncrementalWindow(spark, sf, out, w2,
      failOnViolations = false, writeGold = false)

    assert(!new java.io.File(
      s"$out/state/listing_price/live/state_bucket=__null__").exists,
      "null-date listing leaked into the fold partial")
    // non-null weeks ≡ the rebuild over the seeded dim; the null week
    // is the one deliberate (reported, loud) difference
    val expected = Present.weeklyAvgListingPrice(
      Curate.convertApartmentPrices(
        Curate.parseRawDates(
          Curate.dedup(spark.read
            .parquet(s"$out/dim/apartments_current/v=0000-seed")),
          Seq("listing_created_on")),
        Tables.exchangeRates(spark)))
      .filter(col("week_start").isNotNull)
    assert(rows(res.gold("average_listing_price")) == rows(expected),
      "non-null weeks diverged (double-count?)")
  }

  test("a garbage WINDOW feed refuses at nightly submit with nothing " +
      "durable — no manifest, no ledger entry, no dim applied " +
      "(r11 ADVICE #3)") {
    val out = Files.createTempDirectory("graft_adv_wval").toString
    val hist = allMonths.take(5)
    hist.init.grouped(12).foreach { w =>
      Pipeline.runIncrementalWindow(spark, sf, out, w, writeGold = false)
    }
    val before = Pipeline.ledgerEntries(spark, out).map(_._1)
    // garbage: some window rows carry a null booking_date — they
    // route into every window slice (bm.isNull) and must trip the
    // SUBMIT gate, not phase 6 after the dim phase already landed
    val garbage = Analog.bookingsRaw(spark, sf)
      .withColumn("booking_date",
        when(col("booking_id") % 5 === 0, lit(null: String))
          .otherwise(col("booking_date")))
    val dimFix = Analog.apartmentsRaw(spark, sf)
      .withColumn("price",
        when(col("id") % 7 === 3, col("price") * 1.1)
          .otherwise(col("price")))
    val e = intercept[IllegalArgumentException] {
      Pipeline.runNightly(spark, sf, out, Pipeline.NightlyDeltas(
        apartmentUpdates = Some(dimFix),
        windowMonths = Seq(hist.last),
        windowBookings = Some(garbage)))
    }
    assert(e.getMessage.contains("windowBookings"), e.getMessage)
    assert(Pipeline.pendingNightly(spark, out).isEmpty,
      "a refused submit must leave no manifest")
    assert(Pipeline.ledgerEntries(spark, out).map(_._1) == before,
      "a refused submit must leave the ledger untouched")
    assert(!new java.io.File(s"$out/dim/apartments_current").exists,
      "the dim phase must not have landed before the submit gate")
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(out))
  }

  test("GRAFT_UNDO_KEEP parses defensively: malformed or <2 values " +
      "fail with a message naming the variable (r11 ADVICE #4)") {
    assert(Pipeline.parseUndoKeep("3") == 3)
    assert(Pipeline.parseUndoKeep(" 5 ") == 5) // stray whitespace OK
    for (bad <- Seq("", "abc", "3x", "-1", "0", "1",
        "99999999999999999999")) {
      val e = intercept[IllegalArgumentException] {
        Pipeline.parseUndoKeep(bad)
      }
      assert(e.getMessage.contains("GRAFT_UNDO_KEEP"),
        s"'$bad' → ${e.getMessage}")
    }
  }
}
