package graft.dev

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Runtime bloom-filter join reduction at sf0.1 — the non-partition
  * -key companion to ProfileDpp10x: when a shuffle join's dim side
  * carries a selective filter, Catalyst builds a bloom filter of the
  * surviving join keys and injects `might_contain` on the FACT side
  * BEFORE its exchange, so non-matching fact rows never shuffle.
  * DPP prunes what is READ (partition grain); the bloom filter
  * prunes what MOVES (row grain, any key).
  *
  * Locally two thresholds must move (forced here for the A/B; the
  * engine leaves the defaults alone — they bind correctly at scale):
  * broadcast joins disabled (bloom injection targets shuffle joins)
  * and
  * `runtime.bloomFilter.applicationSideScanSizeThreshold` lowered
  * from its 10 GB default (sf0.1's fact is far smaller; at the
  * 100 TB design point the DEFAULT binds and no tuning is needed).
  * Reported: median wall on/off and the fact-side exchange's shuffle
  * record count — the number the filter exists to shrink. */
object ProfileBloomFilter10x {

  private def medianOf(xs: Seq[Double]): Double =
    xs.sorted.apply((xs.size - 1) / 2)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")

    def query(): DataFrame = {
      val li = Tables.lineitem(spark, sfDir)
      val o = Tables.orders(spark, sfDir)
        .filter(col("o_custkey") % 500 === 0) // ~0.2% of orders
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
    }

    def shuffleRecords(df: DataFrame): Long = {
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def recs(p: SparkPlan): Long = {
        val own = p.metrics.get("shuffleRecordsWritten")
          .map(_.value).getOrElse(0L)
        own + (p match {
          case a: AdaptiveSparkPlanExec => recs(a.executedPlan)
          case q: QueryStageExec => recs(q.plan)
          case other => other.children.map(recs).sum +
            other.subqueries.map(recs).sum
        })
      }
      recs(df.queryExecution.executedPlan)
    }

    def run(enabled: Boolean): (Double, Long, Boolean) = {
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.enabled", enabled.toString)
      val df = query()
      val t0 = System.nanoTime()
      df.collect()
      val t = (System.nanoTime() - t0) / 1e9
      (t, shuffleRecords(df),
        df.queryExecution.executedPlan.toString.contains("might_contain"))
    }

    run(true); run(false) // warmup both paths
    val on = (1 to 5).map(_ => run(true))
    val off = (1 to 5).map(_ => run(false))
    println(s"[bloom10x] injected=${on.head._3} (off path: ${off.head._3})")
    println(s"[bloom10x] shuffle_records on=${on.head._2} off=${off.head._2}")
    println(f"[bloom10x] wall on=${medianOf(on.map(_._1))}%.3f s " +
      f"off=${medianOf(off.map(_._1))}%.3f s " +
      s"(on=${on.map(x => f"${x._1}%.2f").mkString(",")} " +
      s"off=${off.map(x => f"${x._1}%.2f").mkString(",")})")
    spark.stop()
  }
}
