package graft.dev
import org.apache.spark.sql.functions._
object ProfileRecall {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    import spark.implicits._
    val emb = graft.io.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter($"vec_id" < 20)
    def neighbors(df: org.apache.spark.sql.DataFrame) =
      df.select($"query_id", $"corpus_id").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, ps) => q -> ps.map(_._2).toSet }
    val truth = neighbors(graft.ops.Similarity.bruteForceTopK(emb, queries, 5))
    def recall(a: Map[Long, Set[Long]]) = {
      truth.map { case (q, t) => a.getOrElse(q, Set.empty).intersect(t).size }.sum.toDouble /
        truth.values.map(_.size).sum
    }
    for (planes <- Seq(4, 6, 8); tables <- Seq(4, 8, 16)) {
      val r = recall(neighbors(graft.ops.Similarity.lshTopK(emb, queries, 5, planes, tables)))
      println(s"[recall] lsh planes=$planes tables=$tables recall=$r")
    }
    for (cents <- Seq(16, 32); probe <- Seq(4, 8, 16)) {
      val r = recall(neighbors(graft.ops.Similarity.ivfTopK(emb, queries, 5, cents, probe)))
      println(s"[recall] ivf centroids=$cents nProbe=$probe recall=$r")
    }
    spark.stop()
  }
}
