package graft.dev

import org.apache.spark.sql.functions.{col, date_format}

import graft.Pipeline
import graft.etl.Analog
import graft.io.Tables

/** r8 verdict item 2: dynamic partition pruning measured at 10×
  * (sf0.1) next to the static-pruning evidence (PLANS "file-census").
  *
  * Setup: build the month-partitioned Silver at sf0.1 (~81 month
  * partitions), write the parquet month dim, then run
  * [[Pipeline.quarterCityRevenue]] (fact ⋈ quarter-filtered dim on
  * the partition column) with dynamic pruning ON vs OFF, median of
  * 5 interleaved passes each. Also prints the fact scan's
  * numFiles/staticFilesNum metrics and the DynamicPruningExpression
  * plan line, so PLANS can cite a runtime census, not just wall
  * time. */
object ProfileDpp10x {

  private def medianOf(xs: Seq[Double]): Double =
    xs.sorted.apply((xs.size - 1) / 2)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local()
    val out = s"${sys.props("java.io.tmpdir")}/graft_dpp10x"
    val silverDir = s"$out/silver"
    val dimDir = s"$out/dim_month"

    Tables.writeParquet(
      Analog.curated(spark, sfDir).withColumn("booking_month",
        date_format(col("booking_date"), "yyyy-MM")),
      silverDir, partitionBy = Seq("booking_month"))
    Pipeline.writeMonthDim(spark, silverDir, dimDir)
    val nMonths = spark.read.parquet(silverDir)
      .select("booking_month").distinct().count()
    println(s"[dpp10x] months=$nMonths")

    def run(): Unit = Pipeline.quarterCityRevenue(
      spark, silverDir, dimDir, "1995-Q2").collect(): Unit

    def time(): Double = {
      val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
    }
    // interleaved passes: on/off alternate so host drift hits both
    val on = scala.collection.mutable.ArrayBuffer.empty[Double]
    val off = scala.collection.mutable.ArrayBuffer.empty[Double]
    run() // warmup
    (1 to 5).foreach { _ =>
      spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
      on += time()
      spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
      off += time()
    }
    spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")

    // runtime census + plan line
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case other =>
        other.children.flatMap(scans) ++ other.subqueries.flatMap(scans)
    }
    val df = Pipeline.quarterCityRevenue(spark, silverDir, dimDir, "1995-Q2")
    df.collect()
    val fact = scans(df.queryExecution.executedPlan)
      .filter(_.metrics.contains("staticFilesNum"))
    fact.headOption.foreach { f =>
      println(s"[dpp10x] numFiles=${f.metrics("numFiles").value} " +
        s"staticFilesNum=${f.metrics("staticFilesNum").value} " +
        s"pruningTime=${f.metrics.get("pruningTime").map(_.value)}")
      println("[dpp10x] PartitionFilters line: " + f.toString
        .linesIterator.find(_.contains("PartitionFilters")).getOrElse(""))
    }
    println(f"[dpp10x] dpp_on_median=${medianOf(on.toSeq)}%.3f s " +
      f"dpp_off_median=${medianOf(off.toSeq)}%.3f s " +
      s"(on=${on.map(x => f"$x%.3f").mkString(",")} " +
      s"off=${off.map(x => f"$x%.3f").mkString(",")})")
    spark.stop()
  }
}
