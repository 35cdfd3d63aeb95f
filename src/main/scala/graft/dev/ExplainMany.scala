package graft.dev

import graft.{GraftSession, SparkEntry}

/** Write formatted physical plans for a list of queries to files:
  * runMain graft.dev.ExplainMany <outDir> <suffix> <sfDir> <name...>
  * (name = "top40" expands to the r14 optimization worklist).
  * Produces <outDir>/<name>_<suffix>.txt — the r14 plan evidence. */
object ExplainMany {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val sfDir = args(2)
    val names = args.drop(3).toSeq
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val spark = GraftSession.local()
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        // queryExecution.explainString: the same text explain("formatted")
        // prints, captured instead of dumped to stdout
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"),
          txt.getBytes("UTF-8"))
        println(s"[explain] wrote $n")
      } catch { case e: Throwable =>
        System.err.println(s"[explain] $n failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
