package graft.dev
object TimeQs {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    for (q <- args.headOption.map(_.split(',').toSeq).getOrElse(Nil)) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.1").count()
      println(f"TIMEQ $q ${(System.nanoTime()-t0)/1e9}%.2f s rows=$n")
    }
    spark.stop()
  }
}
