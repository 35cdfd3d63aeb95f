package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import CurateStream.Doc

/** VERDICT r6 item 7: the COMPOSED stream (gate → near-dup → split)
  * end-to-end, proved ≡ the batch chain on the same micro-batched
  * input: batch rules (gopherRulesUnsorted) + batch LSH candidate
  * drop (minHashCandidates, drop the higher id of every band-sharing
  * pair — the stream stage is the candidate stage; exact verify is a
  * downstream join in both worlds) + the batch hash-split column. */
class CurateStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // crafted to PASS the default Gopher rules (≥20 tokens, mean word
  // length ≥ 4.0, ≥2 stopwords, distinct ratio ≥ 0.35)
  private val base = "the quicker brownish foxes jumped over the " +
    "lazier doggy while the cats sleeping on the warmer mats nearby " +
    "the doors"
  private val other = "spark catalyst rules rewrite logical plans " +
    "into physical ones while the tungsten engine generates java " +
    "bytecode for the whole stage at once"

  private val docs = Seq(
    Doc(1L, ts("2024-01-01 10:00:00"), base),
    Doc(2L, ts("2024-01-01 10:01:00"), base.replace("lazier", "sleepy")),
    Doc(3L, ts("2024-01-01 10:02:00"), other),
    Doc(4L, ts("2024-01-01 10:03:00"), "a b c"), // < 20 tokens: reject
    Doc(5L, ts("2024-01-01 10:04:00"), base))    // exact dup of 1

  test("composed stream ≡ batch rules + LSH candidate drop + hash split") {
    implicit val sqlCtx = spark.sqlContext

    // ---- batch twin on the identical corpus
    val df = docs.toDF().select($"doc_id", $"text")
    val rules = graft.ops.TextOps.gopherRulesUnsorted(df)
      .select($"doc_id", $"passes")
    val passing = df.join(rules.filter($"passes").select("doc_id"), "doc_id")
    val dropped = graft.ops.Dedup.minHashCandidates(passing)
      .select($"id_b".as("doc_id")).distinct()
    val split = passing.select($"doc_id",
      graft.ops.Split.splitColumn(
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
        idCol = "doc_id").as("split"))
    val batchDecisions = df.select($"doc_id")
      .join(rules, "doc_id")
      .join(dropped.withColumn("__dup", lit(1)), Seq("doc_id"), "left")
      .join(split, Seq("doc_id"), "left")
      .select($"doc_id",
        when(!$"passes", "rejected_rule")
          .when($"__dup".isNotNull, "near_dup")
          .otherwise("kept").as("decision"),
        when($"passes" && $"__dup".isNull, $"split").as("split"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))

    // ---- the composed stream, fed in id order across 3 micro-batches
    val input = MemoryStream[Doc]
    val q = CurateStream.curated(input.toDS())
      .writeStream.format("memory").queryName("curate_stream")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(docs.head)
      q.processAllAvailable()
      input.addData(docs(1), docs(2), docs(3))
      q.processAllAvailable()
      input.addData(docs(4))
      q.processAllAvailable()
      val streamDecisions = CurateStream.decisions(
          spark.table("curate_stream"))
        .select($"doc_id", $"decision", $"split")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      assert(streamDecisions.toSeq == batchDecisions.toSeq,
        s"stream ${streamDecisions.toSeq} != batch ${batchDecisions.toSeq}")
      // the corpus exercises every decision branch
      val kinds = streamDecisions.map(_._2).toSet
      assert(kinds == Set("kept", "near_dup", "rejected_rule"))
    } finally q.stop()
  }

  test("decisions rollup is exact per micro-batch (foreachBatch shape)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val collected = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String)]
    val q = CurateStream.curated(input.toDS())
      .writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[_], _: Long) =>
        CurateStream.decisions(batch.toDF()).collect()
          .foreach(r => collected += ((r.getLong(0), r.getString(1))))
        ()
      }.start()
    try {
      input.addData(docs.head)
      q.processAllAvailable()
      input.addData(docs(1), docs(2), docs(3), docs(4))
      q.processAllAvailable()
      assert(collected.sorted.toSeq == Seq(
        1L -> "kept", 2L -> "near_dup", 3L -> "kept",
        4L -> "rejected_rule", 5L -> "near_dup"))
    } finally q.stop()
  }
}
