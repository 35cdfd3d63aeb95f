package graft.dev
object ExplainDedup {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    val d = graft.etl.Curate.dedup(graft.etl.Analog.bookingsRaw(spark, "/root/testdata/sf0.1"))
    d.explain("formatted")
    spark.stop()
  }
}
