package graft

/** Local smoke runner for the driver's entry check: runs
  * SparkEntry.entry on sf0.001 and prints the row count. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"ENTRY_ROWS=$n")
    spark.stop()
  }
}
