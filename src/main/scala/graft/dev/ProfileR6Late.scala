package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.io.Tables
import graft.ops.{Dedup, Split, TextOps}

/** 10×-scale (≈ sf1, 50k docs) measurement of the late-r6 operators
  * whose scale behavior is otherwise extrapolated: span scrub
  * (tumbling-block group-by-text), containment dedup (prefix-filter
  * candidate volume), perplexity buckets (global ntile), normalized
  * dedup, token mixture, and the leakage-safe split's cluster
  * pipeline. Same replicated-corpus scheme as [[ProfileScale10x]].
  * Results land in PLANS.md.
  */
object ProfileR6Late {

  private def timed(label: String)(body: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = body
    println(f"[r6late10x] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s ($n rows)")
  }

  private def bigCorpus(spark: SparkSession): DataFrame = {
    val sf01 = Tables.documents(spark, "/root/testdata/sf0.1")
      .select("doc_id", "text", "source")
    (0 until 10).map { k =>
      sf01.select((col("doc_id") + lit(k * 5000L)).as("doc_id"),
        array_join(transform(TextOps.tokens(col("text")),
          t => concat(t, lit("x" + k))), " ").as("text"),
        col("source"))
    }.reduce(_ unionByName _)
  }

  def main(args: Array[String]): Unit = {
    // optional arg: substring filter over op labels (local iteration)
    val only: String => Boolean =
      args.headOption.map(p => (s: String) => s.contains(p))
        .getOrElse(_ => true)
    val spark = GraftSession.local()
    val docs = bigCorpus(spark).cache()
    println(s"[r6late10x] corpus: ${docs.count()} docs")

    def run(label: String)(body: => Long): Unit =
      if (only(label)) timed(label)(body)

    run("spanScrub k=8")(TextOps.spanScrub(docs).count())
    run("containmentDedup θ=0.8")(
      Dedup.containmentDedup(docs, threshold = 0.8).count())
    run("pplBuckets")(TextOps.perplexityBucketSample(docs).count())
    run("normalizedDedup")(TextOps.normalizedExactDedup(docs).count())
    run("tokenMixture")(TextOps.mixtureSampleTokens(docs,
      Seq("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.2, "src3" -> 0.1),
      tokenBudget = 300000).count())
    run("leakageSafeSplit")(Split.leakageSafeSplit(docs,
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).count())
    run("exactJaccardJoin θ=0.8")(
      Dedup.exactJaccardJoin(docs, threshold = 0.8).count())
    run("corpusDiff")({
      import graft.ops.{Diff, TextOps => T}
      val old = docs.filter(col("doc_id") % 13 =!= 0)
        .select(col("doc_id"),
          md5(T.normalizeText(col("text"))).as("norm_key"))
      val latest = docs.filter(col("doc_id") % 17 =!= 0)
        .select(col("doc_id"),
          md5(T.normalizeText(concat(col("text"), lit(" e"))))
            .as("norm_key"))
      Diff.changes(old, latest, Seq("doc_id")).count()
    })

    spark.stop()
  }
}
