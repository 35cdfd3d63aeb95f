package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, date_format, expr, lit, when}

import graft.{GraftSession, Pipeline}
import graft.etl.Analog
import graft.io.Tables

/** r13 verdict ask #1 instrument: the incremental wall gauges
  * (build / fold / nightly / rebuild / asof), measured standalone in
  * the exact Bench.measureIncr sequence, with a fixed CPU canary
  * timed before and after each phase — so a wall that lands high can
  * be attributed to the box (canary moved too) or to the code
  * (canary flat). Run 2-3 times on an idle box; the r14-start Bench
  * run showed the SAME task swinging 1.5-2.2× within one idle run
  * (rebuild 20.2 s mid-run vs 9.2 s replay 25 min later), so single
  * samples are meaningless on this box.
  *
  * Usage: `runMain graft.dev.ProfileIncrWalls /root/testdata/sf0.1`
  */
object ProfileIncrWalls {

  private def timed(body: => Unit): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark: SparkSession = GraftSession.local()
    import spark.implicits._

    def canary(): Double = {
      val xs = (1 to 3).map(_ => timed(
        spark.range(0L, 64000000L, 1L, 32)
          .selectExpr("sum(id % 1000003) as s").collect(): Unit)).sorted
      xs(1)
    }
    // warmup
    spark.read.parquet(s"$sfDir/orders.parquet")
      .groupBy("o_orderstatus").count().count()

    val months = (Analog.curated(spark, sfDir)
        .select(date_format(col("booking_date"), "yyyy-MM").as("m"))
        .distinct().as[String].collect() ++
      Analog.apartmentsConverted(spark, sfDir)
        .select(date_format(col("listing_created_on"), "yyyy-MM").as("m"))
        .distinct().as[String].collect()).toSet.toSeq.sorted
    val tailN = math.min(5, months.size - 1)

    val root = s"${sys.props("java.io.tmpdir")}/graft_incr_walls"
    (1 to 2).foreach { pass =>
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(root))
      println(f"[incrwalls] pass $pass canary_pre=${canary()}%.3f")
      val buildWall = timed {
        months.dropRight(tailN).grouped(24).foreach { w =>
          Pipeline.runIncrementalWindow(spark, sfDir, root, w)
        }
      }
      println(f"[incrwalls] pass $pass build_wall=$buildWall%.2f " +
        f"canary=${canary()}%.3f")
      val folds = months.takeRight(tailN).map { m =>
        timed(Pipeline.runIncrementalWindow(spark, sfDir, root, Seq(m)))
      }
      println(f"[incrwalls] pass $pass folds=${folds.map(f => f"$f%.2f")
        .mkString(",")} canary=${canary()}%.3f")
      val nightlyWall = {
        val lateMonth = months(months.size / 2)
        val bMonth = date_format(expr(
          s"try_to_date(booking_date, '${graft.etl.Curate.RawDateFormat}')"),
          "yyyy-MM")
        val lateSynth = Analog.bookingsRaw(spark, sfDir)
          .filter(bMonth === lateMonth && col("booking_id") % 97 === 0)
          .withColumn("booking_id", col("booking_id") + 10000000L)
        val attrMove = Analog.attributesRaw(spark, sfDir)
          .withColumn("cityname",
            when(col("id") % 13 === 5, lit("ATLANTIS"))
              .otherwise(col("cityname")))
        val rateFix = Seq(("EUR", 1.2)).toDF("currency", "usd_rate")
        timed(Pipeline.runNightly(spark, sfDir, root,
          Pipeline.NightlyDeltas(
            attributeUpdates = Some(attrMove),
            rateUpdates = Some(rateFix),
            lateBookings = Some(lateSynth))))
      }
      println(f"[incrwalls] pass $pass nightly_wall=$nightlyWall%.2f " +
        f"canary=${canary()}%.3f")
      val rebuildWall = timed(
        Pipeline.run(spark, sfDir, s"${root}_rebuild"))
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(s"${root}_rebuild"))
      val asofWall = {
        val entries = Pipeline.ledgerEntries(spark, root)
        val anchor = entries(math.max(0,
          entries.size - Pipeline.UndoKeep))._1
        timed(Pipeline.goldAsOf(spark, sfDir = sfDir, outDir = root,
          label = anchor)("top_performing_listing").count(): Unit)
      }
      println(f"[incrwalls] pass $pass rebuild_wall=$rebuildWall%.2f " +
        f"asof_wall=$asofWall%.2f canary=${canary()}%.3f")
    }
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root))
    spark.stop()
  }
}
