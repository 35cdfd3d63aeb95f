package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.io.Tables
import graft.ops.{Dedup, TextOps}

/** VERDICT r6 item 4: the containment family's honest 10× profile
  * (PLANS.md "r6-late additions") measured only the adversarial
  * worst case — a uniform tiny vocabulary where every shingle is
  * common and the prefix filter prunes least. The claim "Zipfian
  * real corpora prune far harder" was argued, not measured. This
  * measures it: the same 50k-doc scale with (a) the worst-case
  * replicated corpus and (b) a deterministic Zipf(1.1) synthetic
  * corpus (bounded-Pareto inverse CDF over a 10k-word vocabulary,
  * hash-derived — no RNG), reporting prefix-candidate pair counts
  * and wall time for both. */
object ProfileContainmentZipf {

  private def timed(label: String)(body: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = body
    println(f"[zipf10x] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s ($n rows)")
  }

  /** Worst case: the ProfileR6Late corpus — sf0.1 documents (tiny
    * uniform vocabulary) replicated 10× with per-replica token
    * suffixes. */
  private def worstCorpus(spark: SparkSession): DataFrame = {
    val sf01 = Tables.documents(spark, "/root/testdata/sf0.1")
      .select("doc_id", "text")
    (0 until 10).map { k =>
      sf01.select((col("doc_id") + lit(k * 5000L)).as("doc_id"),
        array_join(transform(TextOps.tokens(col("text")),
          t => concat(t, lit("x" + k))), " ").as("text"))
    }.reduce(_ unionByName _)
  }

  /** Typical case: 50k docs × 50 tokens over a 10k-word Zipf(1.1)
    * vocabulary (bounded-Pareto inverse CDF: rank =
    * (1 − u·(1 − V^(1−s)))^(1/(1−s)), u hash-uniform in [0,1)), PLUS
    * 2.5k planted contained docs (the first 20 tokens of every 20th
    * doc as a new doc — C = 1.0 into its source), so the candidate
    * count shows the filter tracking the TRUE dup mass rather than
    * a vacuous zero. */
  private def zipfCorpus(spark: SparkSession): DataFrame = {
    val vPow = math.pow(10000.0, -0.1) // V^(1-s), s = 1.1
    val base = spark.range(50000).select(col("id").as("doc_id"),
      array_join(transform(sequence(lit(0), lit(49)), j => {
        val u = pmod(xxhash64(col("id"), j), lit(1048576L))
          .cast("double") / lit(1048576.0)
        val rank = pow(lit(1.0) - u * lit(1.0 - vPow), lit(-10.0))
        concat(lit("w"), floor(rank).cast("long"))
      }), " ").as("text"))
    base.unionByName(base.filter(col("doc_id") % 20 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"),
        array_join(slice(TextOps.tokens(col("text")), 1, 20), " ")
          .as("text")))
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    for ((name, corpus) <- Seq("worst-uniform" -> worstCorpus(spark),
                               "zipf-1.1" -> zipfCorpus(spark))) {
      val docs = corpus.cache()
      println(s"[zipf10x] $name corpus: ${docs.count()} docs")
      val vocab = docs
        .select(explode(TextOps.tokens(col("text"))).as("t"))
        .agg(countDistinct(col("t"))).head().getLong(0)
      println(s"[zipf10x] $name distinct tokens: $vocab")
      timed(s"$name candidates θ=0.8")(
        Dedup.containmentCandidates(docs, threshold = 0.8).count())
      timed(s"$name containmentDedup θ=0.8")(
        Dedup.containmentDedup(docs, threshold = 0.8).count())
      docs.unpersist()
    }
    spark.stop()
  }
}
