package graft.dev

import org.apache.spark.sql.functions.{col, date_format}

import graft.etl.Analog
import graft.io.Tables

/** VERDICT r6 "What's wrong" #1: amortized q09_top_listings regressed
  * 2.14 → 5.25 s while its self-contained run is 0.93 s over the same
  * logical data. Reproduce Bench's amortized mode, count the files the
  * month-partitioned Silver write produces, and time each Gold query
  * over it — small-file explosion vs plan change.
  */
object ProfileAmortized {
  private def timed(body: => Unit): Double = {
    val t0 = System.nanoTime()
    body
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.read.parquet(s"$dir/orders.parquet")
      .groupBy("o_orderstatus").count().count()

    val silverDir =
      s"${sys.props("java.io.tmpdir")}/graft_profile_silver_${ProcessHandle.current().pid()}"
    val build = timed {
      Tables.writeParquet(
        Analog.curated(spark, dir).withColumn("booking_month",
          date_format(col("booking_date"), "yyyy-MM")),
        silverDir, partitionBy = Seq("booking_month"))
    }
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(silverDir))
      .filter(p => p.toString.endsWith(".parquet")).count()
    val dirs = new java.io.File(silverDir).listFiles()
      .count(_.getName.startsWith("booking_month="))
    println(f"[silver] build $build%.3f s, $dirs month dirs, $files parquet files")

    for (name <- Seq("q08_popular_cities", "q09_top_listings")) {
      val fn = graft.SparkEntry.curatedQueries(name)
      val times = (1 to 5).map { i =>
        val t = timed(
          fn(spark, spark.read.parquet(silverDir).drop("booking_month")).count())
        println(f"[$name] run $i: $t%.3f s")
        t
      }
      println(f"[$name] median ${times.sorted.apply(2)}%.3f")
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(silverDir))
    spark.stop()
  }
}
