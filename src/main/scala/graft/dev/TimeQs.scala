package graft.dev
object TimeQs {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    val qs = args.headOption.map(_.split(',').toSeq)
      .getOrElse(Seq("q138_triplet_mine"))
    for (q <- qs) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, sys.env.getOrElse("SF_DIR", "/root/testdata/sf0.1")).count()
      println(f"TIMEQ $q ${(System.nanoTime()-t0)/1e9}%.2f s rows=$n")
    }
    spark.stop()
  }
}
