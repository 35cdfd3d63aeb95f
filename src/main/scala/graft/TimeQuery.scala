package graft

/** Local iteration helper: median-of-3 wall time for named queries,
  * measured exactly like Bench (count() materialization). Usage:
  *   runMain graft.TimeQuery <sfDir> <name-prefix>[,<prefix>...]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val (sfDir, prefixes) = (args(0), args(1).split(',').toSeq)
    val spark = GraftSession.local()
    try spark.read.parquet(s"$sfDir/orders.parquet")
      .groupBy("o_orderstatus").count().count()
    catch { case _: Throwable => }
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(kv => prefixes.exists(kv._1.startsWith))
      .foreach { case (name, fn) =>
        val times = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }.sorted
        println(f"[time] $name median=${times(1)}%.3f s " +
          f"(${times.map(t => f"$t%.3f").mkString(", ")})")
      }
    spark.stop()
  }
}
