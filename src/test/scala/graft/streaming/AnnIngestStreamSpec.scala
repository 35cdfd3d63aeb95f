package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.ops.Similarity
import AnnIngestStream.Vec

class AnnIngestStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streamed ingest ≡ batch append: nProbe=all answers brute force") {
    implicit val sqlCtx = spark.sqlContext
    val emb = graft.io.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val half1 = emb.filter($"vec_id" % 2 === 0)
    val half2 = emb.filter($"vec_id" % 2 === 1)
      .select($"vec_id", $"embedding").as[Vec].collect().toSeq

    val dir = Files.createTempDirectory("graft_ann_stream").toString
    Similarity.buildIvfIndex(half1, dir, numCentroids = 8, iters = 2)

    val input = MemoryStream[Vec]
    val q = AnnIngestStream.start(input.toDS(), dir,
      Files.createTempDirectory("graft_ann_ckpt").toString)
    try {
      // two micro-batches — the quantizer must hold across batches
      val (b1, b2) = half2.splitAt(half2.size / 2)
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    val queries = emb.filter($"vec_id" < 20)
    val res = Similarity.ivfFromIndex(spark, dir, queries, 5, nProbe = 8)
      .as[(Long, Int, Long, Double)].collect().toSeq
    val brute = Similarity.bruteForceTopK(emb, queries, 5)
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(res.nonEmpty && res == brute)
  }
}
