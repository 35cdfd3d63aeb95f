package graft.dev

import graft.{GraftSession, SparkEntry}

/** Print one query's formatted physical plan:
  * runMain graft.dev.ExplainOne <name> [sfDir] */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.local()
    SparkEntry.queries(args(0))(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
