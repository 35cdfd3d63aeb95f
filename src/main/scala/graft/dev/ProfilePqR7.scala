package graft.dev
import org.apache.spark.sql.functions._

/** r7: PQ/ADC recall sweep — what (m, codesPerSub, rerank) buys
  * recall@5 ≥ 0.9 on the real embeddings, and at what compressed-scan
  * cost? rerank is the honest production knob (ADC orders candidates,
  * the exact tail fixes them); m·log2(codes) bits/vector is the index
  * size. */
object ProfilePqR7 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    import spark.implicits._
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val emb = graft.io.Tables.embeddings(spark, sf)
    val n = emb.count()
    val queries = emb.filter($"vec_id" < 50)
    def neighbors(df: org.apache.spark.sql.DataFrame) =
      df.select($"query_id", $"corpus_id").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, ps) => q -> ps.map(_._2).toSet }
    val truth = neighbors(graft.ops.Similarity.bruteForceTopK(emb, queries, 5))
    def recall(a: Map[Long, Set[Long]]) =
      truth.map { case (q, t) =>
        a.getOrElse(q, Set.empty).intersect(t).size }.sum.toDouble /
        truth.values.map(_.size).sum
    for ((m, codes) <- Seq((8, 16), (16, 8), (16, 16));
         rerank <- Seq(100, 200, 400)) {
      val t0 = System.nanoTime()
      val r = recall(neighbors(graft.ops.Similarity.pqTopK(
        emb, queries, 5, m = m, codesPerSub = codes, iters = 2,
        rerank = rerank)))
      val secs = (System.nanoTime() - t0) / 1e9
      val bits = m * (math.log(codes) / math.log(2)).round
      println(f"[pq] n=$n m=$m codes=$codes rerank=$rerank " +
        f"bits/vec=$bits recall=$r%.3f wall=$secs%.2f s")
    }
    spark.stop()
  }
}
