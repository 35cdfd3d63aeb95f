package graft.dev

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.io.Tables
import graft.ops.TextOps

/** Scale evidence for the r7-late additions (PLANS.md "r7-late"):
  * q156's candidate-volume claim (bounded by Σ df of the chosen rare
  * terms, not Q × corpus) and q157's block-index bucket occupancy
  * (the star-cap margin). Run: runMain graft.dev.ProfileR7New [sfDir]
  */
object ProfileR7New {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local()

    val d = Tables.documents(spark, sfDir).select("doc_id", "text")
    val corp = d.unionByName(d.filter(col("doc_id") % 25 === 0)
      .select((col("doc_id") + 10000).as("doc_id"), col("text")))
    val nDocs = corp.count()

    // --- q156: candidate volume = scored (qid, doc) pairs pre-top-k
    val toksC = TextOps.tokens(col("text"))
    val base = corp.select(col("doc_id"), toksC.as("toks"))
    val postings = base
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfs = postings.groupBy("term").agg(count(lit(1)).as("df"))
    val qterms = corp.filter(col("doc_id") < 20)
      .select(col("doc_id").as("qid"),
        explode(array_distinct(TextOps.tokens(col("text")))).as("term"))
      .join(dfs, "term")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("qid")
          .orderBy(col("df").asc, col("term").asc)))
      .filter(col("rn") <= 5)
    val cand = postings.join(qterms.select("qid", "term"), "term")
      .select("qid", "doc_id").distinct()
    val nCand = cand.count()
    val nQ = 20.0
    println(f"[q156] corpus=$nDocs candidates=$nCand " +
      f"(${nCand / nQ}%.1f/query, ${nCand * 100.0 / (nQ * nDocs)}%.2f%% " +
      "of Q x corpus)")
    val dfChosen = qterms.agg(sum("df")).head().getLong(0)
    println(s"[q156] sum df(chosen terms)=$dfChosen (upper bound incl. " +
      "within-query overlap)")

    // --- q157: block-index bucket occupancy for blockhash signatures
    val sig = graft.ops.Multimodal.asBinaryAssets(corp)
      .select(col("asset_id"),
        graft.functions.BinaryExpressions.block_hash64(col("payload"))
          .as("simhash"))
    val blocks = sig.select(col("asset_id"), explode(array(
        (0 until 4).map(b => struct(lit(b).as("bid"),
          shiftright(col("simhash"), b * 16).bitwiseAND(0xFFFFL)
            .as("block"))): _*)).as("e"))
      .select(col("e.bid"), col("e.block"))
    val occ = blocks.groupBy("bid", "block").agg(count(lit(1)).as("n"))
      .agg(max("n").as("max_bucket"),
        sum(when(col("n") >= 50, 1).otherwise(0)).as("n_capped"))
      .head()
    println(s"[q157] assets=$nDocs max_bucket=${occ.getLong(0)} " +
      s"buckets_at_cap=${occ.getLong(1)} (maxBucket=50)")

    val t0 = System.nanoTime()
    graft.SparkEntry.queries("q156_bm25_negatives")(spark, sfDir).count()
    val t1 = System.nanoTime()
    graft.SparkEntry.queries("q157_blockhash_dedup")(spark, sfDir).count()
    val t2 = System.nanoTime()
    println(f"[time] q156=${(t1 - t0) / 1e9}%.2f s  q157=${(t2 - t1) / 1e9}%.2f s")

    // --- q156 on a REALISTIC vocabulary: the harness corpus's ~40-word
    // vocabulary is the rare-term prune's adversarial input (every
    // term's df ≈ N, so candidates ≈ Q × corpus — measured above); a
    // Zipf(1.1) 10k-word vocabulary (the ProfileContainmentZipf
    // synthesis) is the typical shape the Σ df(chosen) cost model is
    // designed for.
    val vPow = math.pow(10000.0, -0.1) // V^(1-s), s = 1.1
    val zipf = spark.range(20000).select(col("id").as("doc_id"),
      array_join(transform(sequence(lit(0), lit(49)), j => {
        val u = pmod(xxhash64(col("id"), j), lit(1048576L))
          .cast("double") / lit(1048576.0)
        val rank = pow(lit(1.0) - u * lit(1.0 - vPow), lit(-10.0))
        concat(lit("w"), floor(rank).cast("long"))
      }), " ").as("text"))
    val zBase = zipf.select(col("doc_id"),
      explode(array_distinct(TextOps.tokens(col("text")))).as("term"))
    val zDfs = zBase.groupBy("term").agg(count(lit(1)).as("df"))
    val zQterms = zBase.filter(col("doc_id") < 20)
      .join(zDfs, "term")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
          .orderBy(col("df").asc, col("term").asc)))
      .filter(col("rn") <= 5)
      .select(col("doc_id").as("qid"), col("term"), col("df"))
    val zCand = zBase.select(col("doc_id"), col("term"))
      .join(zQterms.select("qid", "term"), "term")
      .select("qid", "doc_id").distinct()
    val zN = zCand.count()
    val zDf = zQterms.agg(sum("df")).head().getLong(0)
    println(f"[q156-zipf] corpus=20000 candidates=$zN " +
      f"(${zN / 20.0}%.1f/query, ${zN * 100.0 / (20.0 * 20000)}%.2f%% " +
      f"of Q x corpus; sum df(chosen)=$zDf)")
    spark.stop()
  }
}
