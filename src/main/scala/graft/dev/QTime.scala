package graft.dev

import graft.{GraftSession, SparkEntry}

/** Time individual SparkEntry queries: runMain graft.dev.QTime
  * <sfDir> <reps> <queryName...>. Each query gets ONE untimed warmup
  * execution (absorbs session/codegen/page-cache cost — the 7×
  * first-run swings Bench documents), then `reps` timed runs; the
  * reported value is the true median (mean of the middle two for
  * even reps). */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = GraftSession.local()
    names.foreach { n =>
      SparkEntry.queries(n)(spark, sfDir).count() // warmup, untimed
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val median =
        if (reps % 2 == 1) ts(reps / 2)
        else (ts(reps / 2 - 1) + ts(reps / 2)) / 2.0
      println(f"[qtime] $n median=$median%.2f s runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
