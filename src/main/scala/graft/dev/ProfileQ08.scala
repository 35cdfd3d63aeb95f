package graft.dev

/** VERDICT r3 flagged q08_popular_cities at +18% vs r2 (1.66→1.96 s,
  * single-shot) — re-measure with n repetitions to separate machine
  * noise from a real plan regression. */
object ProfileQ08 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // same warmup as Bench
    spark.read.parquet(s"$dir/orders.parquet")
      .groupBy("o_orderstatus").count().count()
    val times = (1 to 7).map { i =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("q08_popular_cities")(spark, dir).count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[q08] run $i: $t%.3f s")
      t
    }
    val sorted = times.sorted
    println(f"[q08] median ${sorted(3)}%.3f  min ${sorted.head}%.3f  max ${sorted.last}%.3f")
    spark.stop()
  }
}
