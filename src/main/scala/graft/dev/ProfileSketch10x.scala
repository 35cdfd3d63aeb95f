package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.io.Tables
import graft.ops.{Analytics, TextOps}

/** 10×-scale contrast of the r8 sketch-tier operators against their
  * exact global-sort twins: rfm vs rfmSketch on 10× orders (1.5M
  * rows, ~1M customers — every custkey replica distinct, so the
  * three ntile windows sort ~1M (custkey, metric) rows on one
  * partition each), and perplexityBucketSample vs its sketch on the
  * replicated 50k-doc corpus. Interleaved median-of-3; results land
  * in PLANS.md. */
object ProfileSketch10x {

  private def orders10(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    (0 until 10).map { k =>
      o.select((col("o_orderkey") + lit(k * 100000000L)).as("o_orderkey"),
        (col("o_custkey") + lit(k * 10000000L)).as("o_custkey"),
        col("o_orderdate"), col("o_totalprice"))
    }.reduce(_ unionByName _)
  }

  private def docs10(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir).select("doc_id", "text")
    (0 until 10).map { k =>
      d.select((col("doc_id") + lit(k * 5000L)).as("doc_id"),
        array_join(transform(TextOps.tokens(col("text")),
          t => concat(t, lit("x" + k))), " ").as("text"))
    }.reduce(_ unionByName _)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // arg 2: customer replication factor (default 10; pass 100 for
    // the crossover measurement — ~10M distinct customers)
    val reps100 = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = GraftSession.local()
    val o = (if (reps100 <= 10) orders10(spark, sfDir)
    else (0 until reps100 / 10).map { j =>
      orders10(spark, sfDir).select(
        (col("o_orderkey") + lit(j * 10000000000L)).as("o_orderkey"),
        (col("o_custkey") + lit(j * 1000000000L)).as("o_custkey"),
        col("o_orderdate"), col("o_totalprice"))
    }.reduce(_ unionByName _)).localCheckpoint(true)
    val d = docs10(spark, sfDir).localCheckpoint(true)
    println(s"[sketch10x] orders=${o.count()} docs=${d.count()}")

    val items: Seq[(String, () => Long)] = Seq(
      "rfm_ntile" -> (() => Analytics.rfm(o).count()),
      "rfm_sketch" -> (() => Analytics.rfmSketch(o).count()),
      "ppl_ntile" -> (() => TextOps.perplexityBucketSample(d).count()),
      "ppl_sketch" -> (() =>
        TextOps.perplexityBucketSampleSketch(d).count()),
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
      println(f"[sketch10x] $name median=${ts(reps / 2)}%.2f s " +
        s"runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
