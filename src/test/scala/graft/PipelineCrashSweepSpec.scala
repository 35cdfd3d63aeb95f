package graft

import java.nio.file.Files

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.{Analog, GoldState}

/** Exhaustive crash-point sweep (r10 verdict ask #2): for EVERY stage
  * boundary of every fold path, inject a crash right after the stage's
  * effects land ([[Pipeline.stageBoundaryHook]]), recover the standard
  * way (resume if a persisted delta is pending, refold otherwise), and
  * assert the warehouse — all 8 state tables, the 7+ published Gold
  * tables, Silver, both current dims, and the ledger — is byte-for-row
  * identical to a clean run of the same fold.
  *
  * The boundary list is ENUMERATED FROM A CLEAN RUN's hook trace, so a
  * newly added stage is automatically swept — the r9 late-fold crash
  * window was found by a human reading code; this makes the class
  * mechanical. Stages run serialized ([[Pipeline.serializeStages]]):
  * a crash after stage N leaves exactly stages 1..N durable, the
  * strongest recovery contract (a concurrent real crash leaves a
  * subset of these states, each covered by the same per-stage
  * idempotence the sweep exercises).
  */
class PipelineCrashSweepSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private case class InjectedCrash(at: String)
    extends RuntimeException(s"injected crash after $at")

  // ---- shared base warehouse: months.init folded once from the
  // on-time slice (late rows withheld so the late path has work).
  // History is truncated to the first 7 months: the sweep's subject
  // is STAGE coverage (every boundary × every path — ~117 crash
  // injections, quadratic in stage count), which is independent of
  // history depth; a short history keeps the per-boundary
  // fold/snapshot cost down while still spanning month straddles and
  // the late slice. Full-depth equivalence is
  // PipelineIncrementalSpec/LateSpec/DimSpec/RateSpec territory. ----
  private object Base {
    lazy val months: Seq[String] =
      (Analog.curated(spark, sf)
          .select(date_format(col("booking_date"), "yyyy-MM").as("m"))
          .distinct().as[String].collect() ++
        Analog.apartmentsConverted(spark, sf)
          .select(date_format(col("listing_created_on"), "yyyy-MM").as("m"))
          .distinct().as[String].collect()).toSet.toSeq.sorted.take(7)
    lazy val all: DataFrame =
      Analog.bookingsRaw(spark, sf).localCheckpoint(true)
    // late rows live strictly BEFORE the last month (already-folded
    // territory for the late path; absent from the window path's month)
    lazy val isLate = col("booking_id") % 17 === 3 &&
      date_format(to_date(col("booking_date"), etl.Curate.RawDateFormat),
        "yyyy-MM").isin(months.init: _*)
    lazy val onTime: DataFrame = all.filter(!isLate).localCheckpoint(true)
    lazy val late: DataFrame = all.filter(isLate).localCheckpoint(true)
    lazy val dir: String = {
      val d = Files.createTempDirectory("graft_sweep_base").toString
      Pipeline.runIncrementalWindow(spark, sf, d, months.init,
        rawBookings = Some(onTime))
      d
    }
  }

  private def copyBase(): String = {
    val d = Files.createTempDirectory("graft_sweep").toString
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(Base.dir), new java.io.File(d))
    d
  }

  /** Everything recovery must reproduce, as sorted row strings. */
  private def snapshot(out: String): Map[String, Seq[String]] = {
    def rows(df: DataFrame): Seq[String] =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|"))
        .toSeq.sorted
    def rowsAt(p: String): Seq[String] =
      try rows(spark.read.parquet(p))
      catch { case _: org.apache.spark.sql.AnalysisException => Nil }
    (GoldState.all.map(s =>
        s"state.${s.name}" -> rowsAt(s"$out/state/${s.name}/live")) ++
      Pipeline.goldTableNames.map(n =>
        s"gold.$n" -> rowsAt(s"$out/presentation.$n")) ++
      Seq(
        "silver" -> rowsAt(s"$out/curated.apartment_bookings"),
        "dim.apartments" ->
          rows(Pipeline.currentApartmentsRaw(spark, sf, out)),
        "dim.attributes" ->
          rows(Pipeline.currentAttributesRaw(spark, sf, out)),
        "dim.rates" -> rows(Pipeline.currentRates(spark, out)),
        "silver.events" -> rowsAt(s"$out/curated.events"),
        "ledger" -> Pipeline.processedMonths(spark, out))).toMap
  }

  /** Resume a crashed fold the way an operator would: a pending
    * persisted delta means resume; otherwise the fold never persisted
    * anything resumable and is simply re-run. */
  private def recover(out: String, rerun: String => Unit): Unit =
    if (Pipeline.pendingLate(spark, out).nonEmpty)
      Pipeline.resumeLate(spark, sf, out): Unit
    else if (Pipeline.pendingDim(spark, out).nonEmpty)
      Pipeline.resumeDim(spark, sf, out): Unit
    else if (Pipeline.pendingAttr(spark, out).nonEmpty)
      Pipeline.resumeAttr(spark, sf, out): Unit
    else if (Pipeline.pendingRate(spark, out).nonEmpty)
      Pipeline.resumeRate(spark, sf, out): Unit
    else if (Pipeline.pendingEvents(spark, out).nonEmpty)
      Pipeline.resumeLateEvents(spark, sf, out): Unit
    else rerun(out)

  private def causedByInjection(e: Throwable): Boolean =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10)
      .exists(_.isInstanceOf[InjectedCrash])

  private def sweep(pathName: String)(runPath: String => Unit): Unit = {
    Pipeline.serializeStages.set(true)
    try {
      // clean run: record the boundary list and the expected warehouse
      val clean = copyBase()
      val stages = ListBuffer[String]()
      Pipeline.stageBoundaryHook.set(n => { stages += n; () })
      runPath(clean)
      Pipeline.stageBoundaryHook.remove()
      val expected = snapshot(clean)
      assert(stages.size >= 10,
        s"$pathName: expected a real boundary list, got $stages")
      assert(stages.distinct == stages.toSeq,
        s"$pathName: stage names must be unique to be sweepable: $stages")

      for (target <- stages) {
        val out = copyBase()
        Pipeline.stageBoundaryHook.set(n =>
          if (n == target) throw InjectedCrash(n))
        val crashed =
          try { runPath(out); false }
          catch {
            case _: InjectedCrash => true
            case e: Throwable if causedByInjection(e) => true
          }
        Pipeline.stageBoundaryHook.remove()
        assert(crashed, s"$pathName: hook at '$target' never fired")
        recover(out, runPath)
        val got = snapshot(out)
        for ((k, exp) <- expected)
          assert(got(k) == exp,
            s"$pathName: '$k' diverged after crash at '$target'")
        org.apache.commons.io.FileUtils
          .deleteDirectory(new java.io.File(out))
      }
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(clean))
    } finally {
      Pipeline.serializeStages.remove()
      Pipeline.stageBoundaryHook.remove()
    }
  }

  test("window fold: resume ≡ clean at every stage boundary") {
    sweep("window") { out =>
      Pipeline.runIncrementalWindow(spark, sf, out, Seq(Base.months.last),
        rawBookings = Some(Base.onTime))
    }
  }

  test("late fold: resume ≡ clean at every stage boundary") {
    sweep("late") { out =>
      Pipeline.runIncrementalLate(spark, sf, out, Base.late)
    }
  }

  test("dim fold: resume ≡ clean at every stage boundary") {
    val orig = Analog.apartmentsRaw(spark, sf)
    val updates = orig.filter(col("id").isin(3L, 10L))
      .withColumn("price", col("price") * 1.1)
      .unionByName(orig.filter(col("id") === 17L)
        .withColumn("listing_created_on", date_format(
          date_add(to_date(col("listing_created_on"),
            etl.Curate.RawDateFormat), 10), etl.Curate.RawDateFormat)))
      .localCheckpoint(true)
    sweep("dim") { out =>
      Pipeline.runIncrementalDimUpdate(spark, sf, out, updates)
    }
  }

  test("rate fold: resume ≡ clean at every stage boundary") {
    val updates = Seq(("EUR", 1.25)).toDF("currency", "usd_rate")
      .localCheckpoint(true)
    sweep("rate") { out =>
      Pipeline.runIncrementalRateUpdate(spark, sf, out, updates)
    }
  }

  test("late-events fold: resume ≡ clean at every stage boundary") {
    // events shifted into already-folded month territory (the late
    // contract requires affected months ≤ the folded max)
    val late = io.Tables.events(spark, sf)
      .withColumn("ts", expr("ts - INTERVAL 29 YEARS"))
      .filter(col("event_id") % 11 === 5)
      .localCheckpoint(true)
    sweep("events") { out =>
      Pipeline.runIncrementalLateEvents(spark, sf, out, late)
    }
  }

  test("rollback: re-run ≡ clean at every per-state restore boundary") {
    Pipeline.serializeStages.set(true)
    try {
      def foldLast(out: String): Unit =
        Pipeline.runIncrementalWindow(spark, sf, out,
          Seq(Base.months.last), rawBookings = Some(Base.onTime)): Unit
      // clean rollback: enumerate its restore boundaries + expectation
      val clean = copyBase()
      foldLast(clean)
      val stages = ListBuffer[String]()
      Pipeline.stageBoundaryHook.set(n => { stages += n; () })
      Pipeline.rollbackLast(spark, clean)
      Pipeline.stageBoundaryHook.remove()
      val restoreStages = stages.filter(_.startsWith("rollback."))
      assert(restoreStages.size >= 5,
        s"expected per-state restore boundaries, got $stages")
      val expected = snapshot(clean)
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(clean))

      for (target <- restoreStages) {
        val out = copyBase()
        foldLast(out)
        Pipeline.stageBoundaryHook.set(n =>
          if (n == target) throw InjectedCrash(n))
        val crashed =
          try { Pipeline.rollbackLast(spark, out); false }
          catch {
            case _: InjectedCrash => true
            case e: Throwable if causedByInjection(e) => true
          }
        Pipeline.stageBoundaryHook.remove()
        assert(crashed, s"rollback hook at '$target' never fired")
        // a crashed rollback leaves the label ledgered (the entry is
        // removed LAST) — re-running completes it: restored states
        // have no undo left and are skipped, the rest restore
        Pipeline.rollbackLast(spark, out)
        val got = snapshot(out)
        for ((k, exp) <- expected)
          assert(got(k) == exp,
            s"rollback: '$k' diverged after crash at '$target'")
        org.apache.commons.io.FileUtils
          .deleteDirectory(new java.io.File(out))
      }
    } finally {
      Pipeline.serializeStages.remove()
      Pipeline.stageBoundaryHook.remove()
    }
  }

  test("attr fold: resume ≡ clean at every stage boundary") {
    val orig = Analog.attributesRaw(spark, sf)
    val updates = orig.filter(col("id") === 1L)
      .withColumn("cityname", lit("ATLANTIS"))
      .unionByName(orig.filter(col("id") === 44L)
        .withColumn("bedrooms", col("bedrooms") + 1))
      .localCheckpoint(true)
    sweep("attr") { out =>
      Pipeline.runIncrementalAttrUpdate(spark, sf, out, updates)
    }
  }
}
