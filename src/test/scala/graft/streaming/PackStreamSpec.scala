package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import PackStream.Doc

class PackStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(i: Long) =
    new Timestamp(Timestamp.valueOf("2024-01-01 10:00:00").getTime + i * 1000)

  // ids 0..9, token counts 4,6,2,5,1,3,2,1,7,2 — text with n one-char
  // words so the batch op's tokenizer counts exactly n
  private val toks = Seq(4, 6, 2, 5, 1, 3, 2, 1, 7, 2)
  private def text(n: Int) = Seq.fill(n)("w").mkString(" ")
  private def streamDocs = toks.zipWithIndex.map { case (n, i) =>
    Doc(i.toLong, ts(i.toLong), if (i % 2 == 0) "en" else "de", n.toLong)
  }
  private def batchDocs = toks.zipWithIndex.map { case (n, i) =>
    (i.toLong, if (i % 2 == 0) "en" else "de", text(n))
  }.toDF("doc_id", "lang", "text")

  test("streaming bins replayed in id order equal the batch bins") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = PackStream.assignBins(input.toDS(), budget = 6L, shards = 2)
      .writeStream.format("memory").queryName("pack")
      .outputMode(OutputMode.Append).start()
    try {
      // two separate micro-batches: state must carry the running
      // totals across them
      val (first, second) = streamDocs.splitAt(4)
      input.addData(first: _*); q.processAllAvailable()
      input.addData(second: _*); q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT lang, shard, bin, count(*) AS n_docs, sum(n_tok) AS n_tokens, " +
          "min(doc_id) AS first_doc, max(doc_id) AS last_doc " +
          "FROM pack GROUP BY 1,2,3 ORDER BY 1,2,3")
        .collect().map(_.toSeq).toSeq
      val batch = graft.ops.TextOps.packSequences(
          batchDocs, budget = 6L, shards = 2)
        .collect().map(_.toSeq).toSeq
      assert(streamed == batch,
        s"stream $streamed must equal batch $batch")
      // sanity: multiple bins actually exist (non-vacuous)
      assert(streamed.map(_(2).asInstanceOf[Long]).max >= 1L)
    } finally q.stop()
  }

  test("state is one counter per key, bins grow monotonically per key") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = PackStream.assignBins(input.toDS(), budget = 3L, shards = 1)
      .writeStream.format("memory").queryName("pack2")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(Doc(1, ts(1), "en", 2), Doc(2, ts(2), "en", 2))
      q.processAllAvailable()
      input.addData(Doc(3, ts(3), "en", 2))
      q.processAllAvailable()
      val bins = spark.sql(
        "SELECT doc_id, bin FROM pack2 ORDER BY doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      // cum(excl) = 0,2,4 -> bins 0,0,1 with budget 3
      assert(bins == Seq((1L, 0L), (2L, 0L), (3L, 1L)))
    } finally q.stop()
  }
}
