package graft.dev
import org.apache.spark.sql.functions._

/** r7: cost + yield of the exact Jaccard join at band-mining
  * thresholds — is the lossless prefix filter affordable when the
  * threshold drops from dedup (0.8) to hard-negative band (0.3-0.5)
  * territory, and do natural band pairs exist on this corpus? */
object ProfileTripletR7 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    val docs = graft.io.Tables.documents(spark,
      args.headOption.getOrElse("/root/testdata/sf0.01"))
      .select("doc_id", "text")
    for (tau <- Seq(0.6, 0.5, 0.4, 0.3)) {
      val t0 = System.nanoTime()
      val pairs = graft.ops.Dedup.exactJaccardJoin(docs, tau)
        .select("jaccard").collect().map(_.getDouble(0))
      val secs = (System.nanoTime() - t0) / 1e9
      val band = pairs.count(j => j < 0.6)
      println(f"[tri] tau=$tau pairs=${pairs.length} band(<0.6)=$band wall=$secs%.2f s")
    }
    spark.stop()
  }
}
