package graft.dev

import org.apache.spark.sql.functions.col

import graft.io.Tables
import graft.ops.Components

/** r8 verdict ask #6: q190's artifact number (3.79 s) pays a FULL
  * connected-components build inside the query so the oracle can
  * prove stored ⊕ delta ≡ recompute — this records the fold-only
  * cost next to it. The stored labeling is materialized
  * (localCheckpoint) before timing, so the median times exactly
  * `incrementalComponents(storedLabels, deltaEdges)`: one depth-1
  * contraction over label-edges ∪ new edges. */
object ProfileQ190Fold {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local()
    val k = Tables.orders(spark, sfDir).select(col("o_orderkey").as("k"))
    val intra = k.select(col("k").as("src"),
      (col("k") - col("k") % 8 + (col("k") * 5 + 3) % 8).as("dst"))
    val links = k.filter(col("k") % 100 === 0)
      .select(col("k").as("src"), (col("k") + 8).as("dst"))
      .localCheckpoint(true)
    val t0 = System.nanoTime()
    val stored = Components.connectedComponents(intra).localCheckpoint(true)
    println(f"[q190fold] full CC build (one-time): ${(System.nanoTime() - t0) / 1e9}%.2f s, " +
      s"labels=${stored.count()} delta_edges=${links.count()}")

    val ts = (1 to 5).map { _ =>
      val t = System.nanoTime()
      Components.incrementalComponents(stored, links).count()
      (System.nanoTime() - t) / 1e9
    }.sorted
    println(f"[q190fold] fold_only median=${ts(2)}%.2f s " +
      s"runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}
