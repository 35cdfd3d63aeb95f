package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import NearDupStream.Doc

class NearDupStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val base = "the quick brown fox jumps over the lazy dog " +
    "while the cat sleeps on the warm mat near the door"

  test("near-dups of an earlier doc emit candidate pairs; unrelated docs don't") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = NearDupStream.candidatePairs(input.toDS())
      .writeStream.format("memory").queryName("neardup")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(Doc(1L, ts("2024-01-01 10:00:00"), base))
      q.processAllAvailable()
      input.addData(
        // near-dup: one word changed
        Doc(2L, ts("2024-01-01 10:01:00"),
          base.replace("lazy", "sleepy")),
        // unrelated text
        Doc(3L, ts("2024-01-01 10:02:00"),
          "completely different content about spark catalyst " +
            "optimizer rules and tungsten code generation engines"))
      q.processAllAvailable()
      val pairs = spark.sql(
        "SELECT DISTINCT doc_id, canon_id FROM neardup")
        .as[(Long, Long)].collect().toSet
      assert(pairs.contains((2L, 1L)), s"expected (2,1) in $pairs")
      assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
        s"unrelated doc 3 must not pair: $pairs")
    } finally q.stop()
  }

  test("stream candidates agree with the batch LSH candidates") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      Doc(1L, ts("2024-01-01 10:00:00"), base),
      Doc(2L, ts("2024-01-01 10:01:00"), base.replace("dog", "wolf")),
      Doc(3L, ts("2024-01-01 10:02:00"),
        "unrelated words entirely: alpha beta gamma delta epsilon " +
          "zeta eta theta iota kappa lambda mu nu xi omicron pi rho"))
    val batchPairs = graft.ops.Dedup.minHashCandidates(
        docs.toDF().select($"doc_id", $"text"))
      .as[(Long, Long)].collect()
      .map { case (a, b) => (b, a) }.toSet  // batch emits id_a < id_b

    val input = MemoryStream[Doc]
    val q = NearDupStream.candidatePairs(input.toDS())
      .writeStream.format("memory").queryName("neardup_batch_twin")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(docs.head)
      q.processAllAvailable()
      input.addData(docs.tail: _*)
      q.processAllAvailable()
      val streamPairs = spark.sql(
        "SELECT DISTINCT doc_id, canon_id FROM neardup_batch_twin")
        .as[(Long, Long)].collect().toSet
      assert(streamPairs == batchPairs,
        s"stream $streamPairs != batch $batchPairs")
    } finally q.stop()
  }
}
