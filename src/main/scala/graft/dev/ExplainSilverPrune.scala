package graft.dev

import org.apache.spark.sql.functions.col

import graft.{GraftSession, Pipeline}

/** r7 verdict item 3: print the month-partitioned Silver's pruning
  * evidence — run the pipeline at sf0.01, then explain the
  * single-month Gold query reading the stored Silver and show its
  * `PartitionFilters:` line plus the partition/file census.
  * runMain graft.dev.ExplainSilverPrune [sfDir] */
object ExplainSilverPrune {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.local()
    val out = java.nio.file.Files
      .createTempDirectory("graft_prune").toString
    Pipeline.run(spark, sfDir, out)
    val silverDir = s"$out/curated.apartment_bookings"
    val parts = new java.io.File(silverDir).listFiles()
      .filter(_.isDirectory).sortBy(_.getName)
    println(s"[prune] silver partitions: ${parts.length} " +
      s"(${parts.map(_.getName).mkString(", ")})")
    println(s"[prune] files per partition: " +
      parts.map(_.listFiles().count(_.getName.endsWith(".parquet")))
        .mkString(","))
    val occ = Pipeline.monthMetrics(spark, out, "1995-06")("occupancy_rate")
    occ.collect()
    occ.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("PartitionFilters"))
      .foreach { l =>
        val i = l.indexOf("PartitionFilters")
        println("[prune] " + l.substring(i).take(250))
      }
    // file-level: which files does the month window actually open?
    import org.apache.spark.sql.functions.input_file_name
    val read = spark.read.parquet(silverDir)
      .filter(col("booking_month").isin("1995-05", "1995-06"))
      .select(input_file_name()).distinct().collect()
      .map(_.getString(0)).map(u => u.substring(u.indexOf("booking_month=")))
    println(s"[prune] month-window files opened: ${read.sorted.mkString(", ")}")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    spark.stop()
  }
}
