package graft.dev

import graft.{GraftSession, SparkEntry}

/** Time individual SparkEntry queries: runMain graft.dev.QTime
  * <sfDir> <reps> <queryName...> — median-of-reps per query, after
  * one warmup of the first query's table. */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = GraftSession.local()
    names.foreach { n =>
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[qtime] $n median=${ts(reps / 2)}%.2f s runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
