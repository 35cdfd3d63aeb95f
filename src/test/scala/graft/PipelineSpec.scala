package graft

import java.nio.file.Files

import graft.SparkSpec

class PipelineSpec extends SparkSpec {

  test("pipeline writes partitioned Silver; month metrics prune partitions") {
    val out = Files.createTempDirectory("graft_pipe").toString
    val res = Pipeline.run(spark, "/root/testdata/sf0.001", out)
    assert(res.curated.count() == 1500)
    assert(res.metrics.size == 7)

    val m = Pipeline.monthMetrics(spark, out, "1995-06")
    val occ = m("occupancy_rate")
    // the month predicate must reach the scan as a partition filter
    val plan = occ.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("booking_month"),
      s"expected partition pruning on booking_month:\n$plan")
    // incremental rows must be VALUE-identical to the full-run rows
    // for the same month keys (not just correctly labeled)
    val fullOcc = res.metrics("occupancy_rate").collect()
      .map(r => r.getDate(0).toString -> r.toSeq).toMap
    val incOcc = occ.collect().map(r => r.getDate(0).toString -> r.toSeq).toMap
    assert(incOcc.keySet == Set("1995-06-01"))
    assert(incOcc("1995-06-01") == fullOcc("1995-06-01"))
    val fullDur = res.metrics("avg_booking_duration").collect()
      .map(r => r.getDate(0).toString -> r.toSeq).toMap
    val incDur = m("avg_booking_duration").collect()
      .map(r => r.getDate(0).toString -> r.toSeq).toMap
    assert(incDur.keySet == Set("1995-06-01"))
    assert(incDur("1995-06-01") == fullDur("1995-06-01"))

    // ---- FILE-COUNT pruning proof (r7 verdict item 3): the month
    // window must touch exactly the contributing partitions' files —
    // pruning at the METADATA level, not a full scan with a filter
    import org.apache.spark.sql.functions.{col, input_file_name}
    import spark.implicits._
    val silverDir = s"$out/curated.apartment_bookings"
    val months = new java.io.File(silverDir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("booking_month="))
    assert(months.length > 2, "need >2 partitions for pruning to bind")
    def filesIn(mth: String): Set[String] =
      new java.io.File(s"$silverDir/booking_month=$mth").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    val window = Seq("1995-05", "1995-06")
    val readFiles = spark.read.parquet(silverDir)
      .filter(col("booking_month").isin(window: _*))
      .select(input_file_name()).distinct().as[String].collect()
      .map(uri => uri.substring(uri.lastIndexOf('/') + 1)).toSet
    assert(readFiles == window.flatMap(filesIn).toSet,
      s"month window read $readFiles, expected exactly the " +
        s"${window.mkString("/")} partition files")
  }
}
