package graft.dev

import org.apache.spark.sql.functions._

/** Stage split for q138 triplet mining at θ=0.4: candidate
  * generation vs exact verify vs the argmax groupBy — which stage
  * owns the 15-25 s and how many rows each produces. */
object ProfileQ138 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = graft.io.Tables.documents(spark, dir)
      .select("doc_id", "text")
    def timed(tag: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[q138] $tag rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (_ <- 1 to 2) {
      timed("candidates")(
        graft.ops.Dedup.jaccardCandidates(docs, 0.4).count())
      timed("join+verify")(
        graft.ops.Dedup.exactJaccardJoin(docs, 0.4).count())
      timed("triplets")(
        graft.ops.Dedup.tripletMine(docs).count())
    }
    spark.stop()
  }
}
