package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.etl.{Analog, GoldState}
import graft.io.Tables

/** STATE-BUCKET COMPACTION ([[Pipeline.compactStateBuckets]]) and the
  * files-per-bucket census behind it (r11 verdict asks #3/#4).
  *
  * Legs:
  *  1. ALIGNMENT BY CONSTRUCTION — a long all-single-month fold
  *     sequence (every ledgered fold rewrites buckets) never grows any
  *     live bucket past [[Pipeline.StateFilesPerBucket]] files: the
  *     bucket-aligned write makes the write-amplification census a
  *     function of the data, not of task scheduling (the r11
  *     164-vs-212-file artifact swing).
  *  2. COMPACTION — a bucket fragmented under another write
  *     discipline is rewritten row-set-identically; untouched buckets
  *     keep their exact files; the fold is ledgered (`.cmpNN`),
  *     goldAsOf-transparent, and a re-run is a clean no-op.
  *  3. CRASH/RESUME at both compaction boundaries (plan persisted /
  *     live overwritten, unledgered) — the standard pending-delta
  *     contract: other folds refuse, resumeCompact finishes.
  *  4. The NIGHTLY phase wiring (`compactBuckets = true`).
  */
class PipelineCompactSpec extends SparkSpec {
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

  private def stateContent(out: String): Map[String, Seq[String]] =
    GoldState.all.map { s =>
      s.name -> (try rows(spark.read.parquet(s"$out/state/${s.name}/live")
          .drop("state_bucket")).sorted
        catch { case _: org.apache.spark.sql.AnalysisException => Nil })
    }.toMap

  private def bucketFiles(out: String, state: String,
                          bucket: String): Seq[String] = {
    val d = new java.io.File(s"$out/state/$state/live/state_bucket=$bucket")
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSeq.sorted
  }

  /** Fragment one live bucket the way an unaligned writer would:
    * rewrite exactly that bucket dir as N small parquet files. */
  private def fragment(out: String, state: String, bucket: String,
                       n: Int): Unit = {
    val dir = s"$out/state/$state/live/state_bucket=$bucket"
    val content = spark.read.parquet(dir).localCheckpoint(true)
    content.repartition(n).write.mode("overwrite").parquet(dir)
    // drop the commit-protocol extras so the dir looks like a plain
    // partition dir again
    new java.io.File(dir, "_SUCCESS").delete(): Unit
  }

  test("a long single-month fold sequence keeps every live bucket at " +
      "≤ StateFilesPerBucket files (census deterministic by " +
      "construction); a fragmented bucket compacts row-identically " +
      "with untouched buckets untouched; crash/resume; re-run no-op") {
    val out = Files.createTempDirectory("graft_cmp").toString
    assert(months.size >= 8, s"need a long fold sequence, got $months")
    // a 20-fold sequence (the r11 verdict's bar) — covers the whole
    // listing calendar plus a year of booking-only months
    months.take(20).foreach { m =>
      Pipeline.runIncrementalWindow(spark, sf, out, Seq(m),
        writeGold = false): Unit
      val worst = Pipeline.bucketFileCounts(spark, out)
        .filter(_._3 > Pipeline.StateFilesPerBucket)
      assert(worst.isEmpty,
        s"bucket grew past StateFilesPerBucket after fold $m: $worst")
    }
    assert(Pipeline.compactStateBuckets(spark, out).isEmpty,
      "an aligned warehouse must have nothing to compact")

    // ---- fragment one populated bucket of two different states ----
    val census = Pipeline.bucketFileCounts(spark, out)
    val (tlState, tlBucket, _) = census.filter(_._1 == "top_listings").head
    val (buState, buBucket, _) =
      census.filter(_._1 == "bookings_per_user").head
    fragment(out, tlState, tlBucket, 5)
    fragment(out, buState, buBucket, 4)
    val fragged = Pipeline.bucketFileCounts(spark, out)
      .filter(_._3 > Pipeline.StateFilesPerBucket)
    assert(fragged.map(t => (t._1, t._2)).toSet ==
      Set((tlState, tlBucket), (buState, buBucket)),
      s"fragmentation setup wrong: $fragged")

    val before = stateContent(out)
    // file identity of a NON-fragmented bucket must survive compaction
    val untouchedBucket = census
      .find(t => t._1 == "top_listings" && t._2 != tlBucket).get._2
    val untouchedFiles = bucketFiles(out, "top_listings", untouchedBucket)
    val ledgerBefore = Pipeline.ledgerEntries(spark, out).map(_._1)

    // ---- crash at both compaction boundaries, resume each ----
    Pipeline.serializeStages.set(true)
    try {
      for (target <- Seq("cmp.delta.persist", s"cmp.state.$buState")) {
        Pipeline.stageBoundaryHook.set(n =>
          if (n == target) throw new RuntimeException(s"injected at $n"))
        intercept[RuntimeException] {
          Pipeline.compactStateBuckets(spark, out)
        }
        Pipeline.stageBoundaryHook.remove()
        assert(Pipeline.pendingCompact(spark, out).nonEmpty,
          s"no pending plan after crash at $target")
        // the standard guard: other folds refuse while a plan pends
        intercept[IllegalArgumentException] {
          Pipeline.runIncrementalLate(spark, sf, out,
            Analog.bookingsRaw(spark, sf).limit(1))
        }
        // roll the warehouse back to the fragmented layout for the
        // next target by resuming, verifying, then re-fragmenting
        val resumed = Pipeline.resumeCompact(spark, out)
        assert(resumed.nonEmpty && Pipeline.pendingCompact(spark, out).isEmpty)
        assert(stateContent(out) == before,
          s"content diverged after crash at $target + resume")
        assert(Pipeline.bucketFileCounts(spark, out)
          .forall(_._3 <= Pipeline.StateFilesPerBucket))
        if (target == "cmp.delta.persist") {
          fragment(out, tlState, tlBucket, 5)
          fragment(out, buState, buBucket, 4)
        }
      }
    } finally {
      Pipeline.serializeStages.remove()
      Pipeline.stageBoundaryHook.remove()
    }

    // ---- the compaction fold's observable contract ----
    assert(stateContent(out) == before, "compaction changed row content")
    assert(bucketFiles(out, "top_listings", untouchedBucket) ==
      untouchedFiles, "compaction rewrote an untouched bucket's files")
    val newLabels = Pipeline.ledgerEntries(spark, out).map(_._1)
      .filterNot(ledgerBefore.contains)
    assert(newLabels.nonEmpty && newLabels.forall(_.matches(""".*\.cmp\d+""")),
      s"compaction labels wrong: $newLabels")
    // goldAsOf across the cmp fold: identical content on both sides
    val cmpLabel = newLabels.last
    val prevLabel = Pipeline.ledgerEntries(spark, out).map(_._1)
      .takeWhile(_ != cmpLabel).last
    val atCmp = Pipeline.goldAsOf(spark, out, sf, cmpLabel)
    val atPrev = Pipeline.goldAsOf(spark, out, sf, prevLabel)
    for (n <- Pipeline.goldTableNames)
      assert(rows(atCmp(n)) == rows(atPrev(n)),
        s"goldAsOf not transparent across compaction for $n")
    // idempotent: nothing left to compact
    assert(Pipeline.compactStateBuckets(spark, out).isEmpty)

    // ---- nightly wiring: a compact-only night ----
    fragment(out, tlState, tlBucket, 3)
    Pipeline.runNightly(spark, sf, out,
      Pipeline.NightlyDeltas(compactBuckets = true))
    assert(Pipeline.pendingNightly(spark, out).isEmpty)
    assert(Pipeline.bucketFileCounts(spark, out)
      .forall(_._3 <= Pipeline.StateFilesPerBucket))
    assert(stateContent(out) == before,
      "nightly compaction changed row content")

    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(out))
  }
}
