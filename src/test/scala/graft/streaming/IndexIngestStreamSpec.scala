package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.ops.TextOps
import IndexIngestStream.Doc

class IndexIngestStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streamed shards + compaction ≡ one full-corpus scan") {
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")
    val half1 = docs.filter($"doc_id" % 2 === 0)
    val half2 = docs.filter($"doc_id" % 2 === 1)
      .as[Doc].collect().toSeq

    val base = Files.createTempDirectory("graft_idx_stream").toString
    TextOps.buildInvertedIndex(half1, s"$base/base")

    val input = MemoryStream[Doc]
    val q = IndexIngestStream.start(input.toDS(), s"$base/shards",
      Files.createTempDirectory("graft_idx_ckpt").toString)
    try {
      // two micro-batches — each must land in its own shard
      val (b1, b2) = half2.splitAt(half2.size / 2)
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    IndexIngestStream.compact(spark, Some(s"$base/base"),
      s"$base/shards", s"$base/serving")

    val terms = Seq("data", "vector", "spark")
    val fromIndex = TextOps.bm25FromIndex(spark, s"$base/serving",
        terms, k = 10).collect().toSeq
    val fromScan = TextOps.bm25Search(docs, terms, k = 10)
      .collect().toSeq
    assert(fromIndex.nonEmpty && fromIndex == fromScan)

    // both micro-batches produced their own shard directory
    val shardDirs = new java.io.File(s"$base/shards").listFiles()
      .filter(_.getName.startsWith("batch_")).map(_.getName).sorted
    assert(shardDirs.length == 2)

    // compaction with no shards is a loud error, not an empty index
    val ex = intercept[IllegalArgumentException] {
      IndexIngestStream.compact(spark, Some(s"$base/base"),
        s"$base/empty_shards", s"$base/serving2")
    }
    assert(ex.getMessage.contains("no shards"))
  }
}
