package graft.dev

import org.apache.spark.sql.functions._

/** Probe: stage costs of q76's bigram LM scoring. */
object ProfileQ76 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = graft.io.Tables.documents(spark, dir)
    docs.count()
    def t(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[q76] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    val toks = graft.ops.TextOps.tokens(col("text"))
    // the shipped zip_with form; swap in
    //   transform(sequence(lit(1), size(toks)-1), i =>
    //     concat(element_at(toks, i), lit(" "), element_at(toks, i+1)))
    // to reproduce the O(n²) CollapseProject re-tokenization (explode
    // alone 4.9 s vs 0.5 s at sf0.1)
    val bigrams = when(size(toks) < 2, array().cast("array<string>"))
      .otherwise(zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => concat(a, lit(" "), b)))
    val exploded = docs.select(col("doc_id"),
      posexplode(bigrams).as(Seq("pos", "bigram")))
    t("explode only")(exploded.count())
    val bc = exploded.groupBy(col("bigram")).agg(count(lit(1)).as("c_bigram"))
    t("bigram counts")(bc.count())
    val prefix = element_at(split(col("bigram"), " ", 2), 1)
    val model = bc.withColumn("prefix", prefix)
      .withColumn("c_prefix", sum(col("c_bigram")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("prefix")))
      .select(col("bigram"),
        (col("c_bigram").cast("double") / col("c_prefix")).as("p"))
    t("model")(model.count())
    val joined = exploded.join(broadcast(model), "bigram")
    t("joined")(joined.count())
    t("full")(graft.ops.TextOps.bigramLmScore(docs).count())
    t("full warm")(graft.ops.TextOps.bigramLmScore(docs).count())
    spark.stop()
  }
}
