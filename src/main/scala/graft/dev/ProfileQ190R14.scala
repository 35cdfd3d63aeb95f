package graft.dev

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.io.Tables

/** r14: where do q190's ~4.6 s go? Times the stored CC build, the
  * incremental fold, and the final orderBy separately (3 reps each). */
object ProfileQ190R14 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local()
    def t(name: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[p190] $name runs=${ts.map(x => f"$x%.2f").mkString(",")}")
    }
    val k = Tables.orders(spark, dir).select(col("o_orderkey").as("k"))
    val intra = k.select(col("k").as("src"),
      (col("k") - col("k") % 8 + (col("k") * 5 + 3) % 8).as("dst"))
    val links = k.filter(col("k") % 100 === 0)
      .select(col("k").as("src"), (col("k") + 8).as("dst"))
    // warm
    graft.ops.Components.connectedComponents(intra).count()
    t("stored_cc") {
      graft.ops.Components.connectedComponents(intra).count(): Unit
    }
    val stored = graft.ops.Components.connectedComponents(intra)
      .localCheckpoint(true)
    t("incr_fold") {
      graft.ops.Components.incrementalComponents(stored, links)
        .count(): Unit
    }
    t("incr_fold_ordered") {
      graft.ops.Components.incrementalComponents(stored, links)
        .orderBy("id").count(): Unit
    }
    t("full_query") {
      val st = graft.ops.Components.connectedComponents(intra)
      graft.ops.Components.incrementalComponents(st, links)
        .orderBy("id").count(): Unit
    }
    spark.stop()
  }
}
