package graft.dev
import org.apache.spark.sql.functions._
object ProfileCurated {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    val dir = "/root/testdata/sf0.1"
    def time[A](label: String)(f: => A): Unit = {
      val t0 = System.nanoTime(); f
      println(s"[prof] $label: ${(System.nanoTime()-t0)/1e9}s")
    }
    // warm
    spark.read.parquet(s"$dir/orders.parquet").count()
    time("bookingsRaw scan+derive")(graft.etl.Analog.bookingsRaw(spark, dir).count())
    time("dedup(bookingsRaw)")(graft.etl.Curate.dedup(graft.etl.Analog.bookingsRaw(spark, dir)).count())
    time("full curated")(graft.etl.Analog.curated(spark, dir).count())
    time("full curated + orderBy (q05 shape)")(graft.etl.Analog.curated(spark, dir).orderBy("booking_id").count())
    spark.stop()
  }
}
