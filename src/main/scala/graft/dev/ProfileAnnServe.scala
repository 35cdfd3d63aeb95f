package graft.dev

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.io.Tables
import graft.ops.Similarity

/** The serving-index amortization story with numbers: on a 10×
  * replicated embedding corpus (20k vectors), compare the
  * self-contained fit-and-scan ANN (what a bulk job runs) against
  * query-from-stored-index (what a serving layer runs after one
  * build). Interleaved median-of-3. */
object ProfileAnnServe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val emb0 = Tables.embeddings(spark, sfDir)
    val emb = (0 until 10).map { k =>
      emb0.select((col("vec_id") + lit(k * 100000L)).as("vec_id"),
        col("embedding"), col("label"))
    }.reduce(_ unionByName _).localCheckpoint(true)
    println(s"[annserve] corpus=${emb.count()}")
    val queries = emb.filter(col("vec_id") < 50)

    val ivfDir = java.nio.file.Files
      .createTempDirectory("graft_ivf_serve").toString
    val pqDir = java.nio.file.Files
      .createTempDirectory("graft_pq_serve").toString
    def timed(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[annserve] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    timed("ivf_build_once")(
      { Similarity.buildIvfIndex(emb, ivfDir, 32, 2); 1L })
    timed("pq_build_once")(
      { Similarity.buildPqIndex(emb, pqDir, 8, 16, 2); 1L })

    val items: Seq[(String, () => Long)] = Seq(
      "ivf_fit_and_scan" -> (() => Similarity.ivfKmeansTopK(emb,
        queries, 5, numCentroids = 32, iters = 2, nProbe = 16).count()),
      "ivf_from_index" -> (() => Similarity.ivfFromIndex(spark, ivfDir,
        queries, 5, nProbe = 16).count()),
      "pq_fit_and_scan" -> (() => Similarity.pqTopK(emb, queries, 5,
        m = 8, codesPerSub = 16, iters = 2, rerank = 400).count()),
      "pq_from_index" -> (() => Similarity.pqFromIndex(spark, pqDir,
        queries, 5, rerank = 400).count()),
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
      println(f"[annserve] $name median=${ts(reps / 2)}%.2f s " +
        s"runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
