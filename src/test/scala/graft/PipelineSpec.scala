package graft

import java.nio.file.Files

import graft.SparkSpec

class PipelineSpec extends SparkSpec {

  test("pipeline writes partitioned Silver; month metrics prune partitions") {
    val out = Files.createTempDirectory("graft_pipe").toString
    val res = Pipeline.run(spark, "/root/testdata/sf0.001", out)
    assert(res.curated.count() == 1500)
    assert(res.metrics.size == 8)

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

  test("dim-filtered fact join prunes Silver partitions at RUNTIME " +
      "(DynamicPruningExpression)") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

    val out = Files.createTempDirectory("graft_dpp").toString
    Pipeline.run(spark, "/root/testdata/sf0.001", out)
    val silverDir = s"$out/curated.apartment_bookings"
    Pipeline.writeMonthDim(spark, silverDir, s"$out/dim_month")

    val df = Pipeline.quarterCityRevenue(spark, silverDir,
      s"$out/dim_month", "1995-Q2")
    df.collect() // metrics and the final adaptive plan need execution

    // the quarter predicate sits on the DIM side only — the fact scan
    // can only prune through the runtime subquery
    val plan = df.queryExecution.executedPlan
    assert(plan.toString.toLowerCase.contains("dynamicpruning"),
      s"expected a DynamicPruningExpression on the fact scan:\n$plan")

    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case other =>
        other.children.flatMap(scans) ++ other.subqueries.flatMap(scans)
    }
    // the fact scan is the one carrying the static-vs-dynamic file
    // metrics (they exist only when runtime pruning applied)
    val fact = scans(plan).filter(_.metrics.contains("staticFilesNum"))
    assert(fact.nonEmpty, s"no dynamically pruned scan in:\n$plan")
    val numFiles = fact.head.metrics("numFiles").value
    val staticFiles = fact.head.metrics("staticFilesNum").value
    assert(numFiles < staticFiles,
      s"runtime census did not shrink: numFiles=$numFiles static=$staticFiles")
    // and the files actually read are EXACTLY the quarter's three
    // month partitions' files
    val expected = Seq("1995-04", "1995-05", "1995-06").map { m =>
      new java.io.File(s"$silverDir/booking_month=$m").listFiles()
        .count(_.getName.endsWith(".parquet"))
    }.sum
    assert(numFiles == expected,
      s"read $numFiles files, expected the quarter's $expected")
  }
}
