package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, date_format, lit}

import graft.Pipeline
import graft.etl.Analog
import graft.io.Tables

/** r8 verdict ask #1 evidence: delta-vs-full wall time for the
  * flagship Gold refresh. Bootstraps incremental state over every
  * month but the last (untimed — the warehouse's accumulated
  * history), then times `Pipeline.runIncremental` of the final month
  * against a full `Pipeline.run` rebuild, and prints the Silver
  * delta scan's PartitionFilters line.
  *
  * Run TWICE: at sf0.1 and at 10× (orders replicated with offset
  * keys into a scratch table dir). The point is the TREND: the full
  * rebuild's cost grows with history while the fold's grows only
  * with the delta month (plus a column-pruned Bronze filter scan
  * that a date-partitioned raw lake would prune too) — locally the
  * ratio is noise at 150k rows because both sides are fixed job
  * overhead, and becomes visible at 1.5M. */
object ProfilePipelineIncr {

  private def profile(spark: SparkSession, label: String,
                      sfDir: String, root: String): Unit = {
    import spark.implicits._
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    val outFull = s"$root/full"; val outIncr = s"$root/incr"

    val bookingMonths = Analog.curated(spark, sfDir)
      .select(date_format(col("booking_date"), "yyyy-MM").as("m"))
      .distinct().as[String].collect()
    val listingMonths = Analog.apartmentsConverted(spark, sfDir)
      .select(date_format(col("listing_created_on"), "yyyy-MM").as("m"))
      .distinct().as[String].collect()
    val months = (bookingMonths ++ listingMonths).toSet.toSeq.sorted
    println(s"[pipeincr:$label] months=${months.size} last=${months.last}")

    def timed(l: String)(body: => Unit): Double = {
      val t0 = System.nanoTime(); body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[pipeincr:$label] $l: $s%.2f s"); s
    }

    months.init.grouped(12).foreach { w =>
      Pipeline.runIncrementalWindow(spark, sfDir, outIncr, w,
        writeGold = false)
    }
    val fullT = timed("full_rebuild (Pipeline.run)") {
      Pipeline.run(spark, sfDir, outFull): Unit
    }
    var out: Pipeline.IncrementalOutputs = null
    val foldStart = System.currentTimeMillis()
    val deltaT = timed(s"delta_fold (runIncremental ${months.last})") {
      out = Pipeline.runIncremental(spark, sfDir, outIncr, months.last)
    }
    println(f"[pipeincr:$label] delta/full = ${deltaT / fullT}%.2f")

    // ---- write-amplification census (r10 ask #3): parquet bytes
    // this fold actually WROTE under state/ (mtime >= fold start)
    // vs the TOTAL live state — which is exactly what the r9
    // full-copy-per-asof layout wrote on every fold ----
    def census(dir: java.io.File,
               since: Long): (Long, Long) = {
      val fs = Option(dir.listFiles).getOrElse(Array.empty[java.io.File])
      fs.foldLeft((0L, 0L)) { case ((n, b), f) =>
        if (f.isDirectory) {
          val (n2, b2) = census(f, since); (n + n2, b + b2)
        } else if (f.getName.endsWith(".parquet") &&
            f.lastModified >= since) (n + 1, b + f.length)
        else (n, b)
      }
    }
    val stateDir = new java.io.File(s"$outIncr/state")
    val lives = Option(stateDir.listFiles).getOrElse(Array.empty)
      .filter(_.isDirectory).map(d => new java.io.File(d, "live"))
      .filter(_.isDirectory)
    val undos = Option(stateDir.listFiles).getOrElse(Array.empty)
      .filter(_.isDirectory).map(d => new java.io.File(d, "undo"))
      .filter(_.isDirectory)
    def sumAll(dirs: Seq[java.io.File], since: Long) =
      dirs.map(census(_, since)).foldLeft((0L, 0L)) {
        case ((n, b), (n2, b2)) => (n + n2, b + b2) }
    val (wFiles, wBytes) = sumAll(lives.toSeq, foldStart)
    val (uFiles, uBytes) = sumAll(undos.toSeq, foldStart)
    val (tFiles, tBytes) = sumAll(lives.toSeq, 0L)
    println(f"[pipeincr:$label] fold wrote $wFiles live files / " +
      f"${wBytes / 1024.0}%.0f KiB (+ undo $uFiles / " +
      f"${uBytes / 1024.0}%.0f KiB); total live state $tFiles files / " +
      f"${tBytes / 1024.0}%.0f KiB; r9 full-copy layout wrote " +
      f"${tBytes.toDouble / (wBytes + uBytes)}%.1fx more per fold")
    out.deltaSilver.collect()
    val line = out.deltaSilver.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("PartitionFilters"))
      .map(_.replaceAll("ReadSchema:.*", ""))
    println(s"[pipeincr:$label] delta scan: ${line.getOrElse("<none>")}")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local()
    val base = s"${sys.props("java.io.tmpdir")}/graft_pipe_incr10x"
    profile(spark, "sf0.1", sfDir, s"$base/run1x")

    // 10× history: orders replicated with offset keys (same month
    // spread, distinct rows); part/nation pass through
    val repDir = s"$base/sfx10_data"
    val o = Tables.orders(spark, sfDir)
    (0 until 10).map(k =>
        o.withColumn("o_orderkey", col("o_orderkey") + lit(k * 10000000L)))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$repDir/orders.parquet")
    Tables.part(spark, sfDir)
      .write.mode("overwrite").parquet(s"$repDir/part.parquet")
    Tables.nation(spark, sfDir)
      .write.mode("overwrite").parquet(s"$repDir/nation.parquet")
    // events replicate 10× too (the engagement state folds them since
    // r11): same ts spread, distinct ids/users
    val ev = Tables.events(spark, sfDir)
    (0 until 10).map(k => ev
        .withColumn("event_id", col("event_id") + lit(k * 10000000L))
        .withColumn("user_id", col("user_id") + lit(k * 10000000L)))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$repDir/events.parquet")
    profile(spark, "x10", repDir, s"$base/run10x")
    spark.stop()
  }
}
