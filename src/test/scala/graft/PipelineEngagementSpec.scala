package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.etl.{Analog, Present}
import graft.io.Tables

/** Engagement folded into the incremental flagship (r10 verdict ask
  * #4): the events feed (q13's input — the user_viewing-style feed the
  * reference ingests, `curated_tranformation.py:130`) folds as its own
  * GoldState in `runIncrementalWindow`, with a LATE-events merge leg
  * (`runIncrementalLateEvents`). All three aggregates are order-free,
  * so both paths are pure merges; this spec proves the published
  * `weekly_engagement` Gold ≡ `Present.weeklyEngagement` over the full
  * feed after every step, plus the touched-bucket census (a late
  * delivery confined to one week rewrites ONLY that week's state
  * bucket) and redelivery idempotence.
  */
class PipelineEngagementSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq

  test("window + late events fold ≡ full rebuild, touched-bucket census") {
    val out = Files.createTempDirectory("graft_engage").toString
    val events = Tables.events(spark, sf).localCheckpoint(true)
    // the late slice is confined to ONE week (2024-01-01 is a Monday,
    // so [01-09, 01-14] ⊂ the 2024-01-08 week) — the census shape
    val isLate = col("event_id") % 11 === 5 &&
      col("ts").cast("date") >= lit("2024-01-09").cast("date") &&
      col("ts").cast("date") < lit("2024-01-15").cast("date")
    val onTime = events.filter(!isLate).localCheckpoint(true)
    val late = events.filter(isLate).localCheckpoint(true)
    assert(late.count() > 0, "need a non-empty late slice")

    val months = (Analog.curated(spark, sf)
        .select(date_format(col("booking_date"), "yyyy-MM").as("m"))
        .distinct().as[String].collect() ++
      Analog.apartmentsConverted(spark, sf)
        .select(date_format(col("listing_created_on"), "yyyy-MM").as("m"))
        .distinct().as[String].collect() ++
      events.select(date_format(col("ts"), "yyyy-MM").as("m"))
        .distinct().as[String].collect()).toSet.toSeq.sorted
    var lastGold: Map[String, DataFrame] = Map.empty
    months.grouped(12).foreach { w =>
      lastGold = Pipeline.runIncrementalWindow(spark, sf, out, w,
        writeGold = false, rawEvents = Some(onTime)).gold
    }

    // ---- window folds: Gold ≡ rebuild over the on-time feed, and
    // the state's buckets are exactly the event weeks ----
    val expectedOnTime = Present.weeklyEngagement(onTime)
    assert(lastGold("weekly_engagement").schema
        .map(f => (f.name, f.dataType)) ==
      expectedOnTime.schema.map(f => (f.name, f.dataType)))
    assert(rows(lastGold("weekly_engagement")) == rows(expectedOnTime),
      "window-folded engagement diverged from the on-time rebuild")
    val expectedBuckets = events
      .select(date_format(Present.weekOf(col("ts")), "yyyy-MM-dd"))
      .distinct().as[String].collect().toSet.map("state_bucket=" + (_: String))
    def bucketDirs(): Set[String] = {
      val d = new java.io.File(s"$out/state/weekly_engagement/live")
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(_.isDirectory).map(_.getName)
        .filter(_.startsWith("state_bucket=")).toSet
    }
    assert(bucketDirs() == expectedBuckets,
      s"engagement buckets ${bucketDirs()} != event weeks $expectedBuckets")

    // ---- census baseline: every bucket EXCEPT the late week must
    // keep its files byte-for-byte ----
    val lateWeek = "state_bucket=2024-01-08"
    def filesExcept(excl: String): Map[String, Long] = {
      val d = new java.io.File(s"$out/state/weekly_engagement/live")
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName != excl)
        .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath -> f.lastModified()).toMap
    }
    val before = filesExcept(lateWeek)
    assert(before.nonEmpty)

    // ---- late leg: merge ≡ rebuild over ALL events ----
    val res = Pipeline.runIncrementalLateEvents(spark, sf, out, late,
      writeGold = false)
    assert(filesExcept(lateWeek) == before,
      "late-events fold rewrote buckets outside the late week")
    val expectedAll = Present.weeklyEngagement(events)
    assert(rows(res.gold("weekly_engagement")) == rows(expectedAll),
      "late-folded engagement diverged from the full rebuild")
    // the stored events table carries the full feed (multiset)
    assert(spark.read.parquet(s"$out/curated.events").count()
      == events.count())

    // ---- redelivery: the same late feed again contributes nothing ----
    val again = Pipeline.runIncrementalLateEvents(spark, sf, out, late,
      writeGold = false)
    assert(again.deltaSilver.count() == 0)
    assert(rows(again.gold("weekly_engagement")) == rows(expectedAll),
      "engagement changed under duplicate late-events delivery")
    assert(spark.read.parquet(s"$out/curated.events").count()
      == events.count(), "redelivery duplicated stored events")

    // ---- multiset semantics: a delivery carrying TWO copies of a
    // row the store holds once contributes exactly the one extra copy
    // (exceptAll is a multiset diff — redelivery of the stored copy
    // is absorbed, multiplicity beyond it is new signal) ----
    val copies = late.limit(3).localCheckpoint(true)
    val res3 = Pipeline.runIncrementalLateEvents(spark, sf, out,
      copies.unionByName(copies), writeGold = false)
    assert(res3.deltaSilver.count() == 3)
    val expectedPlus = Present.weeklyEngagement(
      events.unionByName(copies))
    assert(rows(res3.gold("weekly_engagement")) == rows(expectedPlus),
      "extra-copy delivery miscounted")
  }
}
