package graft.dev

import graft.Pipeline
import graft.etl.Analog
import org.apache.spark.sql.functions.{col, date_format}

/** r8 verdict ask #1 evidence: delta-vs-full wall time for the
  * flagship Gold refresh at sf0.1. Bootstraps incremental state over
  * every month but the last (untimed), then times
  * `Pipeline.runIncremental` of the final month against a full
  * `Pipeline.run` rebuild — and prints the Silver delta scan's
  * PartitionFilters line (the pruned read the fold rides on). */
object ProfilePipelineIncr {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local()
    val root = s"${sys.props("java.io.tmpdir")}/graft_pipe_incr10x"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    val outFull = s"$root/full"; val outIncr = s"$root/incr"

    import spark.implicits._
    val bookingMonths = Analog.curated(spark, sfDir)
      .select(date_format(col("booking_date"), "yyyy-MM").as("m"))
      .distinct().as[String].collect()
    val listingMonths = Analog.apartmentsConverted(spark, sfDir)
      .select(date_format(col("listing_created_on"), "yyyy-MM").as("m"))
      .distinct().as[String].collect()
    val months = (bookingMonths ++ listingMonths).toSet.toSeq.sorted
    println(s"[pipeincr] months=${months.size} last=${months.last}")

    def timed(label: String)(body: => Unit): Double = {
      val t0 = System.nanoTime(); body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[pipeincr] $label: $s%.2f s"); s
    }

    // bootstrap state over all but the last month (untimed — this is
    // the warehouse's accumulated history)
    months.init.grouped(12).foreach { w =>
      Pipeline.runIncrementalWindow(spark, sfDir, outIncr, w,
        writeGold = false)
    }

    val fullT = timed("full_rebuild (Pipeline.run)") {
      Pipeline.run(spark, sfDir, outFull): Unit
    }
    var out: Pipeline.IncrementalOutputs = null
    val deltaT = timed(s"delta_fold (runIncremental ${months.last})") {
      out = Pipeline.runIncremental(spark, sfDir, outIncr, months.last)
    }
    println(f"[pipeincr] delta/full = ${deltaT / fullT}%.2f")

    out.deltaSilver.collect()
    val line = out.deltaSilver.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("PartitionFilters"))
    println(s"[pipeincr] delta scan: ${line.getOrElse("<none>")}")
    spark.stop()
  }
}
