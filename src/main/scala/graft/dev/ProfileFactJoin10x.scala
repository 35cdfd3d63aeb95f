package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.{Curate, Present}
import graft.io.Tables

/** r7 verdict item 6: fact-fact join (the q14 lineitem⋈orders shape)
  * at 10× sf0.1 WITH A PLANTED HOT KEY, proving SCALING.md "Joins"'s
  * claim that AQE skew-splitting handles fact-fact skew without any
  * hand salting.
  *
  * Setup: both facts replicated 10× with offset orderkeys (6M
  * lineitem × 1.5M orders); skew planted by pointing 500k extra
  * lineitem rows at ONE orderkey. Broadcast is disabled so the join
  * is the sort-merge exchange it would be at warehouse scale, and
  * the AQE skew thresholds are scaled to the local data size
  * (8 MiB advisory/threshold vs the 256 MiB default — at 100 TB the
  * DEFAULTS bind; locally the data must be allowed to look big).
  * Reported: wall time with skew-split on vs off, plus the
  * `skew=true` plan marker and the AQEShuffleRead line. */
object ProfileFactJoin10x {

  private def rep10(df: DataFrame, keyCol: String): DataFrame =
    (0 until 10).map { k =>
      df.withColumn(keyCol, col(keyCol) + lit(k * 100000000L))
    }.reduce(_ unionByName _)

  private def q14shape(li: DataFrame, o: DataFrame): DataFrame =
    li.filter(col("l_shipdate") >= lit("1996-01-01").cast("date"))
      .join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(Present.weekOf(col("o_orderdate")).as("week_start"),
        col("o_orderstatus"))
      .agg(count(lit(1)).as("n_items"),
        Present.decSum(Curate.money(
          col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("revenue"))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")

    val li0 = rep10(Tables.lineitem(spark, sfDir), "l_orderkey")
    val o0 = rep10(Tables.orders(spark, sfDir), "o_orderkey")
    // hot key: 5M extra lines on one surviving order — >5x the
    // median shuffle partition, so the default skewedPartitionFactor
    // detects it
    val hotKey = o0.select(min("o_orderkey")).head().getLong(0)
    // hot rows must not be constant: skew detection reads the
    // COMPRESSED map-output sizes, and 5M identical rows deflate to
    // nothing — vary every numeric with a multiplicative hash
    val mix = pmod(col("id") * lit(2654435761L), lit(1000003L))
    val hot = spark.range(5000000).select(
      lit(hotKey).as("l_orderkey"),
      mix.as("l_partkey"),
      (mix % 50 + 1).cast("double").as("l_quantity"),
      (mix.cast("double") / 100.0).as("l_extendedprice"),
      ((mix % 11).cast("double") / 100.0).as("l_discount"),
      ((mix % 9).cast("double") / 100.0).as("l_tax"),
      lit("N").as("l_returnflag"),
      lit("O").as("l_linestatus"),
      lit(java.sql.Date.valueOf("1997-03-14")).as("l_shipdate"))
    val li = li0.select(hot.columns.map(col): _*).unionByName(hot)
      .localCheckpoint(true) // pin the input so only the join is timed
    val o = o0.localCheckpoint(true)

    def run(label: String, skewOn: Boolean): Unit = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled",
        skewOn.toString)
      val reps = 3
      var plan = ""
      val ts = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        val df = q14shape(li, o)
        // collect() drives df's OWN QueryExecution (count() would
        // build a separate one whose AQE plan we could not inspect);
        // the result is a small weekly aggregate
        df.collect()
        plan = df.queryExecution.executedPlan.toString
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[factjoin10x] $label median=${ts(reps / 2)}%.1f s " +
        s"runs=${ts.map(t => f"$t%.1f").mkString(",")}")
      plan.linesIterator
        .filter(l => l.contains("SortMergeJoin") ||
          l.contains("AQEShuffleRead"))
        .foreach(l => println("[factjoin10x]   " + l.trim.take(160)))
    }
    println(s"[factjoin10x] li=${li.count()} orders=${o.count()} hotKey=$hotKey")
    run("skew_split_on", skewOn = true)
    run("skew_split_off", skewOn = false)
    spark.stop()
  }
}
