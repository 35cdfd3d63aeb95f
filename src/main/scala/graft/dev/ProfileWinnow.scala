package graft.dev

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.io.Tables
import graft.ops.TextOps

/** Stage-by-stage timing of the q125 winnowing pipeline at a given
  * sf dir (arg 0) — which stage owns the wall time? */
object ProfileWinnow {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val salted = docs.unionByName(docs.filter(col("doc_id") % 20 === 0)
      .select((col("doc_id") + 400000).as("doc_id"),
        concat_ws(" ", lit("intro"),
          array_join(slice(TextOps.tokens(col("text")), 1, 40), " "))
          .as("text")))
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[winnow] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
      r
    }
    t("corpus rows")(salted.count())
    val fps = TextOps.winnowFingerprints(salted, k = 8, w = 4)
    t("fingerprint rows")(fps.count())
    val rare = fps.groupBy(col("fp")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= 20).select("fp")
    t("rare fps")(rare.count())
    val keyed = fps.join(rare, "fp")
    t("keyed rows")(keyed.count())
    t("candidate pairs")(TextOps.winnowCandidates(salted, k = 8, w = 4,
      dfCap = 20).count())
    spark.stop()
  }
}
