package graft.dev

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.io.Tables
import graft.ops.TextOps

/** Exploratory harness for the decontamination operator: overlap
  * distribution of the corpus against an every-40th-doc eval split,
  * across shingle lengths — used to pick q67's n and threshold. */
object ProfileDecon {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val docs = Tables.documents(spark, dir)
    val eval = docs.filter(col("doc_id") % 40 === 0)
    for (n <- Seq(3, 5, 8)) {
      val rep = TextOps.decontaminate(docs, eval, n = n, threshold = 0.5)
      println(s"== n=$n ==")
      rep.groupBy(floor(col("overlap") * 10).as("decile"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("decile").show(12, truncate = false)
      println("contaminated@0.5: " + rep.filter(col("contaminated")).count())
      rep.filter(col("overlap") >= 0.5).orderBy(col("overlap").desc)
        .show(10, truncate = false)
    }
    spark.stop()
  }
}
