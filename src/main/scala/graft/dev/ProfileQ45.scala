package graft.dev
import org.apache.spark.sql.functions._
object ProfileQ45 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    val dir = "/root/testdata/sf0.1"
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(s"[prof] $label: ${(System.nanoTime()-t0)/1e9}s"); r
    }
    val cur = graft.etl.Analog.curated(spark, dir)
      .filter(col("cityname").isNotNull && col("total_price_usd").isNotNull)
    time("curated only")(cur.write.mode("overwrite").parquet("/tmp/prof_cur"))
    val cached = spark.read.parquet("/tmp/prof_cur")
    time("topk over materialized curated") {
      cached.groupBy("cityname")
        .agg(graft.functions.TopKAggregate.topk_by_value(
          col("total_price_usd"), col("booking_id").cast("long"), 3).as("top"))
        .select(col("cityname"), posexplode(col("top")))
        .count()
    }
    time("window-rank over materialized curated") {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("cityname")
        .orderBy(col("total_price_usd").desc, col("booking_id"))
      cached.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3).count()
    }
    spark.stop()
  }
}
