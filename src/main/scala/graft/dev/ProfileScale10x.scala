package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.io.Tables
import graft.ops.{Components, Dedup, TextOps}

/** 10×-scale (≈ sf1) measurement of the dedup stack's scale claims —
  * the only claims previously extrapolated rather than measured:
  * O(log n) connected-components round growth, LSH bucket-size
  * distribution / star-cap behavior, and end-to-end pipeline cost at
  * 10× the bench corpus.
  *
  * Corpus: sf0.1's 5000 documents replicated 10× with a per-copy
  * token suffix — copies share no shingles across replicas (each
  * replica is an independent shard with sf0.1's natural dup
  * structure), so dup DENSITY stays realistic while N and the
  * distinct-token universe scale 10×. Results land in PLANS.md.
  */
object ProfileScale10x {

  private def timed[T](label: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    println(f"[scale10x] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    r
  }

  private def bigCorpus(spark: SparkSession): DataFrame = {
    val sf01 = Tables.documents(spark, "/root/testdata/sf0.1")
      .select("doc_id", "text")
    (0 until 10).map { k =>
      sf01.select((col("doc_id") + lit(k * 5000L)).as("doc_id"),
        array_join(transform(TextOps.tokens(col("text")),
          t => concat(t, lit("x" + k))), " ").as("text"))
    }.reduce(_ unionByName _)
  }

  private def q58Edges(spark: SparkSession, n: Long): DataFrame = {
    val k = spark.range(1, n + 1).select(col("id").as("k"))
    val intra = k.select(col("k").as("src"),
      (col("k") - col("k") % 8 + (col("k") * 5 + 3) % 8).as("dst"))
    val links = k.filter(col("k") % 100 === 0)
      .select(col("k").as("src"), (col("k") + 8).as("dst"))
    intra.unionByName(links)
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val big = bigCorpus(spark).localCheckpoint()
    println(s"[scale10x] corpus rows: ${big.count()}")

    // LSH bucket-size distribution + star-cap trigger count at 10×
    import graft.functions.TextExpressions._
    val buckets = big.select(col("doc_id"),
        posexplode(minhash_bands(TextOps.tokens(col("text")), 64, 16,
          Dedup.ShingleLen)))
      .groupBy("pos", "col").count()
    val hist = buckets.select(
      when(col("count") === 1, "1")
        .when(col("count") <= 5, "2-5")
        .when(col("count") <= Dedup.maxBucket, "6-50")
        .otherwise(">50 (star-capped)").as("size_class"))
      .groupBy("size_class").count().orderBy("size_class")
    timed("bucket histogram")(hist.show(truncate = false))
    buckets.agg(max("count").as("max_bucket"),
      avg("count").as("mean_bucket")).show(truncate = false)

    // q25 shape at 10×
    val survivors = timed("minHashDedup 50k docs") {
      Dedup.minHashDedup(big).count()
    }
    println(s"[scale10x] q25-shape survivors: $survivors / 50000")

    // q66 shape at 10×: LSH candidates -> exact verify -> CC dedup
    val clusterSurvivors = timed("cluster dedup (LSH->verify->CC) 50k docs") {
      val verified = Dedup.jaccardVerify(
          Dedup.minHashCandidates(big), big,
          shingleLen = Dedup.ShingleLen)
        .filter(col("jaccard") >= 0.8)
      Components.componentDedup(big.select("doc_id"), verified,
        srcCol = "id_a", dstCol = "id_b").count()
    }
    println(s"[scale10x] q66-shape survivors: $clusterSurvivors / 50000")

    // q58 shape: component round growth 150k -> 1.5M nodes
    for (n <- Seq(150000L, 1500000L)) {
      timed(s"connectedComponents n=$n") {
        Components.connectedComponents(q58Edges(spark, n)).count()
      }
    }

    // r6 ops at 10× ------------------------------------------------
    // q72 shape: bloom-prefiltered exact dedup — 50k-doc corpus,
    // 10k-doc shard (half exact dups, half novel). The number that
    // matters at scale is prefilter selectivity: how many shard docs
    // reach the verify join at all.
    {
      val shard = big.filter(col("doc_id") % 10 < 1)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
        .unionByName(big.filter(col("doc_id") % 10 === 1)
          .select((col("doc_id") + 2000000L).as("doc_id"),
            concat(col("text"), lit(" novel"),
              col("doc_id").cast("string")).as("text")))
      val bloom = timed("bloom build (50k docs)") {
        val b = graft.ops.Bloom.build(big, col("text")).localCheckpoint()
        b.count(); b
      }
      val cand = timed("bloom probe (10k shard)") {
        graft.ops.Bloom.mightContain(shard, col("text"), bloom, "doc_id")
          .filter(col("might_contain")).count()
      }
      println(s"[scale10x] bloom candidates: $cand / 10000 shard docs " +
        "(5000 true dups)")
      val kept = timed("bloomDedup end-to-end") {
        graft.ops.Bloom.dedupAgainstCorpus(big, shard).count()
      }
      println(s"[scale10x] bloom-dedup survivors: $kept / 10000")
    }

    // q76 shape: bigram LM scoring at 50k docs (linear-scan claim)
    val scored = timed("bigramLmScore 50k docs") {
      TextOps.bigramLmScore(big).count()
    }
    println(s"[scale10x] lm-scored docs: $scored")

    // q74 shape: TF-IDF top-k at 50k docs
    val terms = timed("tfIdfTopTerms 50k docs") {
      TextOps.tfIdfTopTerms(big, k = 3).count()
    }
    println(s"[scale10x] tfidf rows: $terms")
    spark.stop()
  }
}
