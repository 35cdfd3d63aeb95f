package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.io.Tables
import graft.ops.{Cluster, Pca, TextOps}

/** 10×-scale measurement of the r6 embedding/retrieval ops — kmeans,
  * SemDeDup, PCA, BM25 — to confirm the stated cost models (iters ×
  * scan for kmeans/PCA, Σ n_c² cell-local pairs for SemDeDup with k
  * scaled to hold cell size constant, one stats scan + narrow scoring
  * for BM25) stay linear when N grows 10×. Corpus: sf0.1's 2000
  * embeddings replicated 10× (20k vectors) with a deterministic
  * per-copy rotation of one component (keeps copies from being exact
  * dups so kmeans geometry stays non-degenerate); the 5000 documents
  * replicated 10× (50k docs) as in [[ProfileScale10x]]. Results land
  * in PLANS.md.
  */
object ProfileCluster10x {

  private def timed[T](label: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    println(f"[cluster10x] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    r
  }

  private def bigVectors(spark: SparkSession): DataFrame = {
    val base = Tables.embeddings(spark, "/root/testdata/sf0.1")
      .select("vec_id", "embedding")
    (0 until 10).map { c =>
      base.select((col("vec_id") + lit(c * 5000L)).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === lit(c % 64), x * lit(-1.0f) + lit(0.25f))
            .otherwise(x)).as("embedding"))
    }.reduce(_ unionByName _)
  }

  private def bigDocs(spark: SparkSession): DataFrame = {
    val sf01 = Tables.documents(spark, "/root/testdata/sf0.1")
      .select("doc_id", "text")
    (0 until 10).map { k =>
      sf01.select((col("doc_id") + lit(k * 5000L)).as("doc_id"),
        col("text"))
    }.reduce(_ unionByName _)
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val vecs = bigVectors(spark).localCheckpoint()
    val docs = bigDocs(spark).localCheckpoint()
    println(s"[cluster10x] vectors: ${vecs.count()}, docs: ${docs.count()}")

    timed("kmeans k=8 iters=3, 20k vectors") {
      Cluster.kmeans(vecs, k = 8, iters = 3).count()
    }
    timed("kmeans k=80 iters=3, 20k vectors") {
      Cluster.kmeans(vecs, k = 80, iters = 3).count()
    }
    // cell size held ~constant vs the bench corpus: k scales with N
    val surv = timed("semDedup k=80 iters=2 thr=0.9, 20k vectors") {
      Cluster.semDedup(vecs, 0.9, k = 80, iters = 2).count()
    }
    println(s"[cluster10x] semDedup survivors: $surv / 20000")
    timed("pca powerIteration iters=3, 20k vectors") {
      Pca.powerIteration(vecs, iters = 3).count()
    }
    timed("bm25 top-20, 50k docs") {
      TextOps.bm25Search(docs, Seq("vector", "merge", "slow"), 20).count()
    }
    spark.stop()
  }
}
