package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.etl.Analog

/** Proves the r8 verdict's top ask: `Pipeline.runIncremental`'s 7
  * Gold tables are row-bit-identical to `Pipeline.run`'s over the
  * same data — the q188 stored ⊕ delta ≡ one-shot argument lifted to
  * the whole flagship pipeline, fed month window by month window. */
class PipelineIncrementalSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("month-window folds reproduce the full pipeline's 7 Gold tables") {
    val outFull = Files.createTempDirectory("graft_pipe_full").toString
    val outIncr = Files.createTempDirectory("graft_pipe_incr").toString
    val full = Pipeline.run(spark, sf, outFull)

    // every month either side of the pipeline touches: booking months
    // drive Silver partitions, listing months drive the apartments dim
    val bookingMonths = Analog.curated(spark, sf)
      .select(date_format(col("booking_date"), "yyyy-MM").as("m"))
      .distinct().as[String].collect()
    val listingMonths = Analog.apartmentsConverted(spark, sf)
      .select(date_format(col("listing_created_on"), "yyyy-MM").as("m"))
      .distinct().as[String].collect()
    val months = (bookingMonths ++ listingMonths).toSet.toSeq.sorted
    assert(months.size > 20, s"need a real month spread, got $months")

    // fold 12-month windows, then the LAST month alone — the exact
    // single-month nightly shape the verdict names
    val windows = months.init.grouped(12).toSeq
    windows.foreach { w =>
      Pipeline.runIncrementalWindow(spark, sf, outIncr, w, writeGold = false)
    }

    // ---- simulated MID-FOLD CRASH on the last month: live buckets
    // partly overwritten, ledger marker never reached. The month
    // stays unledgered, so the refold is permitted and re-derives
    // every touched bucket from its undo snapshot — the idempotent
    // recovery path ----
    Pipeline.runIncremental(spark, sf, outIncr, months.last,
      writeGold = false)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(
      s"$outIncr/state/_ledger/asof=${months.last}"))
    // a touched live bucket lost mid-write (duration is keyed by
    // checkin month, so the fold certainly touched this bucket)
    val lostBucket = new java.io.File(
      s"$outIncr/state/duration/live/state_bucket=${months.last}-01")
    assert(lostBucket.isDirectory, s"expected touched bucket $lostBucket")
    org.apache.commons.io.FileUtils.deleteDirectory(lostBucket)
    assert(!Pipeline.processedMonths(outIncr).contains(months.last))

    // ---- file census: buckets the refold does NOT touch must stay
    // physically untouched (same files, same mtimes) — the O(touched)
    // write guarantee, not a full-state rewrite ----
    def bucketFiles(name: String, excl: Set[String]): Map[String, Long] = {
      val live = new java.io.File(s"$outIncr/state/$name/live")
      live.listFiles().filter(f => f.isDirectory &&
          f.getName.startsWith("state_bucket=") &&
          !excl(f.getName.stripPrefix("state_bucket=")))
        .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath -> f.lastModified()).toMap
    }
    val nextMonth = java.time.YearMonth.parse(months.last)
      .plusMonths(1).toString
    val durTouched = Set(s"${months.last}-01", s"$nextMonth-01")
    val durBefore = bucketFiles("duration", durTouched)
    assert(durBefore.nonEmpty, "need untouched duration buckets")
    val bpuBefore = bucketFiles("bookings_per_user", Set.empty)

    val out = Pipeline.runIncremental(spark, sf, outIncr, months.last)
    assert(Pipeline.processedMonths(outIncr).size == windows.size + 1)

    assert(bucketFiles("duration", durTouched) == durBefore,
      "refold rewrote duration buckets outside the touched set")
    // user-grain states: ONLY buckets containing delta users rewritten
    import graft.etl.GoldState
    val deltaBuckets = GoldState.bookingsPerUser
      .withBucket(out.deltaSilver.select("user_id"))
      .select("state_bucket").distinct().as[String].collect().toSet
    val bpuUntouchedAfter = bucketFiles("bookings_per_user", deltaBuckets)
    assert(bpuUntouchedAfter ==
      bpuBefore.filter { case (p, _) =>
        !deltaBuckets.exists(b => p.contains(s"state_bucket=$b/")) },
      "refold rewrote bookings_per_user buckets outside the delta's")

    // ---- undo retention: at most UndoKeep snapshots per state, the
    // newest label's always present for a state the fold touched ----
    GoldState.all.foreach { s =>
      val undo = new java.io.File(s"$outIncr/state/${s.name}/undo")
      val asofs = Option(undo.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith("asof=")).map(_.getName).sorted
      assert(asofs.length <= Pipeline.UndoKeep,
        s"${s.name} undo not pruned: ${asofs.mkString(",")}")
    }
    assert(new java.io.File(
      s"$outIncr/state/duration/undo/asof=${months.last}/_touched").exists)

    // ---- the Silver delta read is partition-pruned (metadata, not
    // a filtered full scan) ----
    out.deltaSilver.collect()
    val plan = out.deltaSilver.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("booking_month"),
      s"expected partition pruning on booking_month:\n$plan")

    // ---- all 7 booking Gold tables: schema and ordered rows
    // identical (weekly_engagement folds LAST — the events month
    // sorts after every booking month — and is compared below) ----
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq
    for ((name, fullDf) <- full.metrics - "weekly_engagement") {
      val inc = out.gold(name)
      // nullability flags differ (sum-of-counts vs count, parquet
      // roundtrips); names and types are the schema contract
      assert(inc.schema.map(f => (f.name, f.dataType)) ==
        fullDf.schema.map(f => (f.name, f.dataType)),
        s"$name schema: ${inc.schema} vs ${fullDf.schema}")
      assert(rows(inc) == rows(fullDf), s"$name rows diverged")
      // and the PUBLISHED tables agree on disk (unordered multiset —
      // parquet read order is not the write order)
      val f = rows(spark.read.parquet(s"$outFull/presentation.$name")).sorted
      val i = rows(spark.read.parquet(s"$outIncr/presentation.$name")).sorted
      assert(f == i, s"$name published rows diverged")
    }

    // ---- accumulated Silver partitions ≡ the full run's Silver ----
    val silverF = rows(spark.read
      .parquet(s"$outFull/curated.apartment_bookings")).sorted
    val silverI = rows(spark.read
      .parquet(s"$outIncr/curated.apartment_bookings")).sorted
    assert(silverF == silverI)

    // ---- monotonic-append gate: refolding a folded month refuses
    // loudly (it would double-count partials) ----
    val ex = intercept[IllegalArgumentException] {
      Pipeline.runIncremental(spark, sf, outIncr, months.last)
    }
    assert(ex.getMessage.contains("monotonic-append"), ex.getMessage)

    // ---- rollback: restore every touched bucket from the last
    // label's undo (created buckets deleted), unledger the month —
    // then the refold is re-admitted and lands the identical state
    // and Gold (fold determinism makes rollback+refold lossless) ----
    def liveRows(name: String): Seq[String] =
      try rows(spark.read.parquet(s"$outIncr/state/$name/live")).sorted
      catch { // a state no fold has touched yet (events fold below)
        case _: org.apache.spark.sql.AnalysisException => Nil
      }
    val stateBefore = graft.etl.GoldState.all
      .map(s => s.name -> liveRows(s.name)).toMap
    val rolled = Pipeline.rollbackLast(spark, outIncr)
    assert(rolled == months.last)
    assert(!Pipeline.processedMonths(outIncr).contains(months.last))
    assert(liveRows("duration") != stateBefore("duration"),
      "rollback should have removed the last month's contributions")
    val out2 = Pipeline.runIncremental(spark, sf, outIncr, months.last,
      writeGold = false)
    graft.etl.GoldState.all.foreach { s =>
      assert(liveRows(s.name) == stateBefore(s.name),
        s"${s.name} state diverged after rollback+refold")
    }
    for ((name, fullDf) <- full.metrics - "weekly_engagement")
      assert(rows(out2.gold(name)) == rows(fullDf),
        s"$name diverged after rollback+refold")

    // ---- the events month folds as its own trailing window (the
    // feeds' calendars are disjoint — every event month sorts after
    // every booking month): engagement Gold ≡ the rebuild's, and the
    // booking states are untouched by it ----
    val eventMonths = io.Tables.events(spark, sf)
      .select(date_format(col("ts"), "yyyy-MM").as("m"))
      .distinct().as[String].collect().toSeq.sorted
    val outEvt = Pipeline.runIncrementalWindow(spark, sf, outIncr,
      eventMonths)
    assert(rows(outEvt.gold("weekly_engagement")) ==
      rows(full.metrics("weekly_engagement")),
      "weekly_engagement diverged from the rebuild")
    assert(rows(spark.read.parquet(
        s"$outIncr/presentation.weekly_engagement")).sorted ==
      rows(spark.read.parquet(
        s"$outFull/presentation.weekly_engagement")).sorted,
      "published weekly_engagement diverged")
    graft.etl.GoldState.all.filterNot(_.name == "weekly_engagement")
      .foreach { s =>
        assert(liveRows(s.name) == stateBefore(s.name),
          s"${s.name} state changed under an events-only fold")
      }
  }
}
