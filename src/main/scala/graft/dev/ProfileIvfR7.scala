package graft.dev
import org.apache.spark.sql.functions._

/** r7: q36 IVF recall sweep at sf0.1 with candidate accounting —
  * what probe budget buys recall >= 0.9 on this corpus, and how far
  * from brute force is it? */
object ProfileIvfR7 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    import spark.implicits._
    val emb = graft.io.Tables.embeddings(spark, "/root/testdata/sf0.1")
    val n = emb.count()
    val queries = emb.filter($"vec_id" < 50)
    def neighbors(df: org.apache.spark.sql.DataFrame) =
      df.select($"query_id", $"corpus_id").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, ps) => q -> ps.map(_._2).toSet }
    val truth = neighbors(graft.ops.Similarity.bruteForceTopK(emb, queries, 5))
    def recall(a: Map[Long, Set[Long]]) =
      truth.map { case (q, t) => a.getOrElse(q, Set.empty).intersect(t).size }.sum.toDouble /
        truth.values.map(_.size).sum
    for (cents <- Seq(32, 64); probe <- Seq(8, 12, 16, 20, 24))
      if (probe < cents) {
        val t0 = System.nanoTime()
        val r = recall(neighbors(
          graft.ops.Similarity.ivfTopK(emb, queries, 5, cents, probe)))
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[ivf] n=$n cents=$cents probe=$probe frac=${probe.toDouble/cents}%.2f recall=$r%.3f wall=$secs%.2f s")
      }
    for (probe <- Seq(4, 8, 12, 16)) {
      val t0 = System.nanoTime()
      val r = recall(neighbors(
        graft.ops.Similarity.ivfKmeansTopK(emb, queries, 5, 32, 2, probe)))
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[ivfk] n=$n cents=32 probe=$probe frac=${probe / 32.0}%.2f recall=$r%.3f wall=$secs%.2f s")
    }
    spark.stop()
  }
}
