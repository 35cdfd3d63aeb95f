package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.etl.{Analog, Present}
import graft.io.Tables

/** X1 orchestration (SURVEY §2.9): the reference's two-state Step
  * Function (CurateDataJob → PresenationSummaryJob,
  * `scripts/aws/step_functions.json:3-19`) becomes same-session
  * sequencing — curate, persist the Silver table, then run the Gold
  * metrics off the persisted copy (so present reads columnar
  * partition-pruned parquet, exactly like the reference reads the
  * curated DB table).
  *
  * The curated table is written partitioned by booking month: the
  * Gold queries all group by month/week, so partition pruning makes
  * incremental-month reprocessing a metadata operation at scale.
  *
  * Config via env (X3) — no hardcoded credentials (the reference
  * hardcodes its DB password, `curated_tranformation.py:89`).
  */
object Pipeline {

  case class Outputs(curated: DataFrame, metrics: Map[String, DataFrame])

  /** X2: per-stage structured logging (replaces the reference's Glue
    * try/except logging, `curate_data_etl_job.py:84-112`). */
  private def stage[A](name: String)(body: => A): A = {
    val t0 = System.nanoTime()
    try {
      val r = body
      println(f"[pipeline] $name ok in ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    } catch {
      case e: Throwable =>
        println(s"[pipeline] $name FAILED: ${e.getMessage}")
        throw e
    }
  }

  def run(spark: SparkSession, sfDir: String, outDir: String,
          failOnViolations: Boolean = true): Outputs = {
    // ---- Data-quality gate on the raw layer (readme.md:65 TODO) ----
    // Fail fast by default: under ANSI mode (Spark 4) the flagged rows
    // would otherwise crash mid-curate (to_date throws on malformed
    // dates) — an uncontrolled failure instead of a gate decision.
    stage("validate.bookings") {
      val report = etl.Validate.run(
        Analog.bookingsRaw(spark, sfDir), etl.Validate.bookingsChecks)
      if (!report.clean) {
        println(s"[pipeline] quality violations: ${report.failed}")
        if (failOnViolations) throw new IllegalStateException(
          s"raw bookings failed quality gate: ${report.failed}")
      }
      report
    }

    // ---- Curate job (Bronze → Silver) ----
    val curated = Analog.curated(spark, sfDir)
      .withColumn("booking_month",
        org.apache.spark.sql.functions.date_format(
          org.apache.spark.sql.functions.col("booking_date"), "yyyy-MM"))
    stage("curate.write") {
      Tables.writeParquet(curated, s"$outDir/curated.apartment_bookings",
        partitionBy = Seq("booking_month"))
    }

    // ---- Present job (Silver → Gold) off the persisted table ----
    val silver = spark.read.parquet(s"$outDir/curated.apartment_bookings")
    val aptConv = Analog.apartmentsConverted(spark, sfDir)
    val metrics = Map(
      "average_listing_price"  -> Present.weeklyAvgListingPrice(aptConv),
      "occupancy_rate"         -> Present.monthlyOccupancy(silver),
      "most_popular_location"  -> Present.weeklyPopularCities(silver),
      "top_performing_listing" -> Present.weeklyTopListings(silver),
      "bookings_per_user"      -> Present.bookingsPerUser(silver),
      "avg_booking_duration"   -> Present.monthlyAvgDuration(silver),
      "repeat_customer_rate"   -> Present.monthlyRepeatRate(silver))
    metrics.foreach { case (name, df) =>
      stage(s"present.$name") {
        Tables.writeParquet(df, s"$outDir/presentation.$name")
      }
    }
    Outputs(silver, metrics)
  }

  /** Incremental reprocessing: recompute the Gold rows keyed by ONE
    * month, reading only the Silver partitions that can contribute —
    * the `booking_month` predicate is a partition filter, so cost
    * tracks the month, not table history.
    *
    * Only metrics whose rows are exactly reproducible from a bounded
    * partition window are offered: avg_booking_duration groups by
    * booking month (≡ the partition key — one partition suffices);
    * occupancy_rate groups by CHECKIN month, and checkins in month M
    * come from bookings in M-1 or M (stay offsets ≤ 9 days in the
    * analog), so it reads both partitions and keeps the M row. Both
    * outputs are row-identical to the full `run` for the same keys.
    * All-history metrics (bookings_per_user, repeat_customer_rate)
    * are NOT incrementally recomputable from a month window and are
    * deliberately absent. */
  def monthMetrics(spark: SparkSession, outDir: String,
                   month: String): Map[String, DataFrame] = {
    import org.apache.spark.sql.functions.{col, lit, date_format, add_months, to_date, concat}
    val silver = spark.read.parquet(s"$outDir/curated.apartment_bookings")
    val own = silver.filter(col("booking_month") === month)
    val prevMonth = java.time.YearMonth.parse(month).minusMonths(1).toString
    val window2 = silver.filter(col("booking_month").isin(prevMonth, month))
    Map(
      "avg_booking_duration" -> Present.monthlyAvgDuration(own),
      "occupancy_rate" -> Present.monthlyOccupancy(window2)
        .filter(col("month_start") === to_date(lit(s"$month-01"))))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(1).getOrElse(
      sys.env.getOrElse("GRAFT_OUT_DIR", "/tmp/graft_pipeline"))
    val spark = GraftSession.local()
    val out = run(spark, sfDir, outDir)
    println(s"curated rows: ${out.curated.count()}")
    out.metrics.toSeq.sortBy(_._1).foreach { case (n, df) =>
      println(s"$n rows: ${spark.read.parquet(s"$outDir/presentation.$n").count()}")
    }
    spark.stop()
  }
}
