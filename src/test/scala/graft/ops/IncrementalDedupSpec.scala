package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Incremental dedup against a persisted LSH index: the theorem
  * (shard-incremental ≡ full-corpus batch dedup when shard ids sit
  * above index ids), the index-canonical drop rule, and the bucket
  * cap on the stored bands. */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private def tmpIndex(): String =
    java.nio.file.Files.createTempDirectory("graft-lsh-idx").toString

  test("shard-incremental ≡ full-corpus minHashDedup on real testdata") {
    // index the first half of the corpus, arrive the second half as a
    // shard (ids strictly above every indexed id — the theorem's
    // precondition); the corpus carries natural near-dups on both
    // sides of the split and across it
    val real = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")
    val cut = 250L
    val old = real.filter($"doc_id" < cut)
    val shard = real.filter($"doc_id" >= cut)
    val idx = tmpIndex()
    Dedup.buildLshIndex(old, idx)
    val incremental = Dedup.dedupAgainstIndex(shard, idx)
      .as[Long].collect().toSeq
    val full = Dedup.minHashDedup(real).as[Long].collect().toSeq
      .filter(_ >= cut)
    assert(incremental == full,
      s"incremental=${incremental.size} vs full-batch=${full.size}")
    assert(incremental.size < shard.count(),
      "the shard must contain real near-dups for a non-vacuous check")
  }

  test("index is canonical: a shard doc matching a HIGHER indexed id is dropped") {
    val old = Seq((10L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    // shard id 3 < indexed id 10: batch would drop 10; incremental
    // never drops indexed docs, so the SHARD doc goes
    val shard = Seq(
      (3L, "the quick brown fox jumps over the lazy dog"),
      (4L, "completely different content about spark engines")
    ).toDF("doc_id", "text")
    val idx = tmpIndex()
    Dedup.buildLshIndex(old, idx)
    val kept = Dedup.dedupAgainstIndex(shard, idx).as[Long].collect().toSeq
    assert(kept == Seq(4L))
  }

  test("within-shard pairs still follow the batch drop rule") {
    val old = Seq((0L, "indexed text that matches nothing else at all"))
      .toDF("doc_id", "text")
    val shard = Seq(
      (5L, "the quick brown fox jumps over the lazy dog"),
      (6L, "the quick brown fox jumps over the lazy dog"),  // dup of 5
      (7L, "some other completely unrelated shard document")
    ).toDF("doc_id", "text")
    val idx = tmpIndex()
    Dedup.buildLshIndex(old, idx)
    val kept = Dedup.dedupAgainstIndex(shard, idx).as[Long].collect().toSeq
    assert(kept == Seq(5L, 7L))
  }

  test("stored band buckets are capped at maxBucket smallest ids") {
    // 60 identical docs flood every band bucket; the stored index
    // keeps the 50 smallest ids per bucket
    val flood = (0L until 60L).map(i => (i, "w1 w2 w3 w4 w5 w6"))
      .toDF("doc_id", "text")
    val idx = tmpIndex()
    Dedup.buildLshIndex(flood, idx)
    val sizes = spark.read.parquet(s"$idx/bands")
      .groupBy("band_id", "band_hash").count()
      .agg(max("count"), min("count")).head()
    assert(sizes.getLong(0) == Dedup.maxBucket.toLong)
    assert(sizes.getLong(1) == Dedup.maxBucket.toLong)
    // and the capped bucket still dedups a matching shard doc (the
    // canonical ids survive the cap)
    val shard = Seq((1000L, "w1 w2 w3 w4 w5 w6"))
      .toDF("doc_id", "text")
    assert(Dedup.dedupAgainstIndex(shard, idx).count() == 0)
  }

  test("flooded buckets: incremental survivors ⊆ batch survivors (one-sided bound)") {
    // under bucket flooding the documented relation weakens from
    // equality to containment — the stored 50 smallest ids include the
    // bucket min (the only id batch star pairs reach), so the index
    // path derives a SUPERSET of batch's candidate pairs and, with
    // exact verification, drops at least as much. Plant a 58-doc
    // identical flood (> maxBucket) beside real corpus docs and check
    // both directions explicitly.
    val real = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text").filter($"doc_id" < 200)
    val floodTxt = "alpha beta gamma delta epsilon zeta eta theta"
    val flood = ((10000L until 10053L) ++ (20000L until 20005L))
      .map(i => (i, floodTxt)).toDF("doc_id", "text")
    val old = real.filter($"doc_id" < 100)
      .unionByName(flood.filter($"doc_id" < 20000L))
    val shard = real.filter($"doc_id" >= 100)
      .unionByName(flood.filter($"doc_id" >= 20000L))
    val combined = old.unionByName(shard)
    // non-vacuous: the combined corpus really floods a band bucket
    val maxBucketSize = Dedup.lshBands(
        combined.select($"doc_id",
          Dedup.minHashSignature($"text").as("minhash")), 16, 4)
      .groupBy("band_id", "band_hash").count()
      .agg(max("count")).head().getLong(0)
    assert(maxBucketSize > Dedup.maxBucket,
      s"flood failed to overflow a bucket (max=$maxBucketSize)")
    val idx = tmpIndex()
    Dedup.buildLshIndex(old, idx)
    val incremental = Dedup.dedupAgainstIndex(shard, idx)
      .as[Long].collect().toSet
    val shardIds = shard.select($"doc_id").as[Long].collect().toSet
    val batch = Dedup.minHashDedup(combined).as[Long].collect().toSet
      .intersect(shardIds)
    assert(incremental.subsetOf(batch),
      s"index path kept ${incremental -- batch} that batch dropped")
    // every flood shard doc dies in both paths (the canonical min id
    // survives the cap), and real-doc behavior matches batch exactly
    assert(!incremental.exists(_ >= 20000L))
    assert(incremental == batch.filter(_ < 20000L),
      "real-corpus shard docs must match batch exactly outside the flood")
  }
}
