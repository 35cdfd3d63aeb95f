package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.etl.Analog

/** The persisted quality audit trail ([[Pipeline.qualityHistory]]):
  * every fold's validate stages write their report (totals +
  * per-check violation counts) under
  * `state/_quality/asof=<label>/<stage>.json` — a plain FS write, no
  * Spark job, so the fold wall doesn't pay for its own audit. The
  * record lands BEFORE the gate throws, so refused feeds are
  * auditable too (the trail answers "what did the gate see the night
  * it refused").
  */
class PipelineQualitySpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("fold validates persist per-label reports; a refused feed is " +
      "recorded with its violation counts; empty trail reads empty") {
    val out = Files.createTempDirectory("graft_quality").toString
    // empty trail: empty frame, not an error
    assert(Pipeline.qualityHistory(spark, out).count() == 0)

    val months = (Analog.curated(spark, sf)
        .select(date_format(col("booking_date"), "yyyy-MM").as("m"))
        .distinct().as[String].collect() ++
      Analog.apartmentsConverted(spark, sf)
        .select(date_format(col("listing_created_on"), "yyyy-MM").as("m"))
        .distinct().as[String].collect()).toSet.toSeq.sorted.take(2)
    months.foreach { m =>
      Pipeline.runIncrementalWindow(spark, sf, out, Seq(m),
        writeGold = false)
    }

    val hist = Pipeline.qualityHistory(spark, out)
    // 3 window validates × 2 folds
    assert(hist.count() == 6, s"expected 6 reports, got ${hist.count()}")
    assert(hist.select("label").distinct().as[String].collect().toSet ==
      months.toSet)
    assert(hist.select("stage").distinct().as[String].collect().toSet ==
      Set("validate.delta", "validate.events.delta",
        "validate.listings.delta"))
    // clean history: every recorded check saw zero violations
    val violCols = hist.select("violations.*").columns
    val dirtyRows = hist.filter(violCols.map(c =>
        col("violations").getField(c) > 0).reduce(_ || _))
      .count()
    assert(dirtyRows == 0, s"clean folds recorded violations")
    // the bookings gate actually counted rows
    assert(hist.filter(col("stage") === "validate.delta" &&
      col("total") > 0).count() == 2)

    // ---- a refused feed is recorded: a dim update with a null id
    // fails its gate (fatal), and the trail still has the report ----
    val dirty = Analog.apartmentsRaw(spark, sf).limit(1)
      .withColumn("id", lit(null).cast(
        Analog.apartmentsRaw(spark, sf).schema("id").dataType))
    intercept[IllegalStateException] {
      Pipeline.runIncrementalDimUpdate(spark, sf, out, dirty,
        writeGold = false)
    }
    val refused = Pipeline.qualityHistory(spark, out)
      .filter(col("stage") === "validate.dim")
    assert(refused.count() == 1, "refused gate not recorded")
    assert(refused.select(col("violations").getField("not_null(id)"))
      .as[Long].head() == 1L, "violation count not recorded")

    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(out))
  }
}
