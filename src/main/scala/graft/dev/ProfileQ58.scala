package graft.dev
import org.apache.spark.sql.functions._
/** Probe: rounds + per-stage cost of q58's connected components. */
object ProfileQ58 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.read.parquet(s"$dir/orders.parquet").count()
    val t0 = System.nanoTime()
    val n = graft.SparkEntry.queries("q58_components")(spark, dir).count()
    println(f"[q58] first: ${(System.nanoTime()-t0)/1e9}%.2f s, rows $n")
    val t1 = System.nanoTime()
    graft.SparkEntry.queries("q58_components")(spark, dir).count()
    println(f"[q58] warm:  ${(System.nanoTime()-t1)/1e9}%.2f s")
    spark.stop()
  }
}
