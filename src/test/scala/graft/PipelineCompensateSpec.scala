package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.etl.{Analog, GoldState}

/** Dim-fold compensation ([[Pipeline.compensateLastDimUpdate]]):
  * `rollbackLast` refuses dim-kind folds because they also mutate the
  * current dim and re-derive Silver columns; the documented recovery —
  * re-apply the fold's SCD-2 history snapshot as a new update feed —
  * was a manual recipe until now. One leg per kind proves the round
  * trip (update → compensate) lands every state table, Silver, and
  * the current dims row-bit-identical to the pre-update warehouse;
  * the guard legs prove the refusals are loud (a fold that ADDED keys
  * has no superseded versions to restore — no tombstones — and a
  * window fold is rollbackLast territory).
  */
class PipelineCompensateSpec extends SparkSpec {
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

  private lazy val base: String = {
    val d = Files.createTempDirectory("graft_comp_base").toString
    months.grouped(12).foreach { w =>
      Pipeline.runIncrementalWindow(spark, sf, d, w, writeGold = false)
    }
    d
  }

  private def copyBase(): String = {
    val d = Files.createTempDirectory("graft_comp").toString
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(base), new java.io.File(d))
    d
  }

  /** What compensation must restore: every state table, Silver, and
    * the three current dims. NOT the ledger or the SCD-2 history —
    * compensation is append-only by design (both folds stay
    * auditable). */
  private def snapshot(out: String): Map[String, Seq[String]] = {
    def rowsAt(p: String): Seq[String] =
      try rows(spark.read.parquet(p)).sorted
      catch { case _: org.apache.spark.sql.AnalysisException => Nil }
    (GoldState.all.map(s =>
        s"state.${s.name}" -> rowsAt(s"$out/state/${s.name}/live")) ++
      Seq(
        "silver" -> rowsAt(s"$out/curated.apartment_bookings"),
        "dim.apartments" ->
          rows(Pipeline.currentApartmentsRaw(spark, sf, out)).sorted,
        "dim.attributes" ->
          rows(Pipeline.currentAttributesRaw(spark, sf, out)).sorted,
        "dim.rates" ->
          rows(Pipeline.currentRates(spark, out)).sorted)).toMap
  }

  private def roundTrip(name: String, out: String)(update: => Unit): Unit = {
    val pre = snapshot(out)
    update
    val mid = snapshot(out)
    assert(mid != pre, s"$name: the update was a no-op — the " +
      "compensation leg proves nothing")
    val label = Pipeline.compensateLastDimUpdate(spark, sf, out,
      writeGold = false)
    assert(label.contains(name), s"compensated '$label', expected $name")
    val post = snapshot(out)
    for ((k, v) <- pre)
      assert(post(k) == v, s"$name: '$k' not restored by compensation")
  }

  test("dim (apartments price fix): update → compensate ≡ pre-update") {
    val out = copyBase()
    roundTrip("dim", out) {
      Pipeline.runIncrementalDimUpdate(spark, sf, out,
        Analog.apartmentsRaw(spark, sf)
          .withColumn("price",
            when(col("id") % 7 === 3, col("price") * 1.1)
              .otherwise(col("price"))),
        writeGold = false): Unit
    }
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(out))
  }

  test("att (city reassignment): update → compensate ≡ pre-update") {
    val out = copyBase()
    roundTrip("att", out) {
      Pipeline.runIncrementalAttrUpdate(spark, sf, out,
        Analog.attributesRaw(spark, sf)
          .withColumn("cityname",
            when(col("id") % 13 === 5, lit("ATLANTIS"))
              .otherwise(col("cityname"))),
        writeGold = false): Unit
    }
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(out))
  }

  test("rate (EUR fix): update → compensate ≡ pre-update; and the " +
      "compensating fold is itself compensatable (undo-redo)") {
    val out = copyBase()
    roundTrip("rate", out) {
      Pipeline.runIncrementalRateUpdate(spark, sf, out,
        Seq(("EUR", 1.25)).toDF("currency", "usd_rate"),
        writeGold = false): Unit
    }
    // redo: compensating the compensation re-lands the EUR fix
    val fixed = {
      Pipeline.runIncrementalRateUpdate(spark, sf, out,
        Seq(("EUR", 1.25)).toDF("currency", "usd_rate"),
        writeGold = false)
      snapshot(out)
    }
    Pipeline.compensateLastDimUpdate(spark, sf, out, writeGold = false)
    Pipeline.compensateLastDimUpdate(spark, sf, out, writeGold = false)
    assert(snapshot(out) == fixed, "undo-redo did not re-land the fix")
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(out))
  }

  test("a fold that ADDED keys is refused (no tombstones); a window " +
      "fold is refused (rollbackLast territory)") {
    val out = copyBase()
    // window fold on top: not a dim-kind label
    intercept[IllegalArgumentException] {
      Pipeline.compensateLastDimUpdate(spark, sf, out)
    }
    // a dim update that adds a brand-new apartment id
    val orig = Analog.apartmentsRaw(spark, sf)
    Pipeline.runIncrementalDimUpdate(spark, sf, out,
      orig.limit(1).withColumn("id",
        (col("id") + 10000000).cast(orig.schema("id").dataType)),
      writeGold = false)
    intercept[IllegalArgumentException] {
      Pipeline.compensateLastDimUpdate(spark, sf, out)
    }
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(out))
  }
}
