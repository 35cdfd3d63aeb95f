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
}
