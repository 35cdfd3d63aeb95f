package graft.dev
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.ops.Similarity
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.1")
    val queries = emb.filter(col("vec_id") < 50)
    val truth = Similarity.bruteForceTopK(emb, queries, 5)
    for (r <- Seq(200, 300, 400, 500)) {
      val rec = Similarity.recallAtK(truth,
        Similarity.pqTopK(emb, queries, 5, m = 8, codesPerSub = 16,
          iters = 2, rerank = r))
      println(s"PQPROBE rerank=$r recall=$rec")
    }
    spark.stop()
  }
}
