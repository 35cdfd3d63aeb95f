package graft.dev

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.io.Tables
import graft.ops.Similarity

/** Hamming+rerank cost/recall curve at sf0.1 — the one bench probe
  * under 0.9 recall@5 (0.816 at rerank=200). A 64-dim corpus packs
  * to a single 64-bit word, so Hamming resolution is coarse and the
  * exact-cosine rerank budget is the only recall lever; this sweep
  * finds the knee. */
object ProfileHammingRerank {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val emb = Tables.embeddings(spark, args.headOption
      .getOrElse("/root/testdata/sf0.1"))
    val queries = emb.filter(col("vec_id") < 50)
    val truth = Similarity.bruteForceTopK(emb, queries, 5)
    truth.cache().count()
    Seq(200, 300, 400, 600, 800).foreach { rr =>
      val t0 = System.nanoTime()
      val r = Similarity.recallAtK(truth,
        Similarity.hammingTopK(emb, queries, 5, rerank = rr))
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[hamming] rerank=$rr recall@5=$r%.3f time=$dt%.2f s")
    }
    spark.stop()
  }
}
