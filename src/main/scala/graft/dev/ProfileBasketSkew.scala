package graft.dev

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.io.Tables
import graft.ops.Analytics

/** r7 verdict item 5: measure [[Analytics.basketLift]]'s maxBasket
  * guard against a PLANTED pathological basket — one synthetic order
  * with 10⁴ distinct items unioned onto the real sf0.1 lineitem
  * (TPC-H baskets are ≤ 7 lines). Uncapped, that one order expands
  * to C(10⁴,2) ≈ 5·10⁷ pair rows on a single shuffle key; with the
  * default cap (4096) it contributes zero pairs. Median-of-3 per
  * variant, interleaved. Results land in PLANS.md. */
object ProfileBasketSkew {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey")
    val planted = spark.range(10000).select(
      lit(999999999L).as("l_orderkey"),
      (col("id") + 10000000L).as("l_partkey"))
    val skewed = li.unionByName(planted)

    val items: Seq[(String, () => Long)] = Seq(
      "clean_capped" -> (() => Analytics.basketLift(li).count()),
      "planted_capped" -> (() => Analytics.basketLift(skewed).count()),
      "planted_uncapped" -> (() =>
        Analytics.basketLift(skewed, maxBasket = Int.MaxValue).count()),
    )
    items.foreach(_._2()) // warmup
    val reps = 3
    val samples = (1 to reps).map { _ =>
      items.map { case (_, f) =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }
    }
    items.map(_._1).zipWithIndex.foreach { case (name, i) =>
      val ts = samples.map(_(i)).sorted
      println(f"[basketskew] $name median=${ts(reps / 2)}%.2f s " +
        s"runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
