package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import DedupStream.{Admitted, Doc}

class DedupStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("duplicates die across and within micro-batches; min id is canonical") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = DedupStream.admitted(input.toDS())
      .writeStream.format("memory").queryName("dedup_admit")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: two copies of A (min id 1 wins), one B
      input.addData(
        Doc(2L, ts("2024-01-01 10:00:01"), "text A"),
        Doc(1L, ts("2024-01-01 10:00:00"), "text A"),
        Doc(3L, ts("2024-01-01 10:00:02"), "text B"))
      q.processAllAvailable()
      // batch 2: later copy of A dies against held state; new C admits
      input.addData(
        Doc(4L, ts("2024-01-01 10:01:00"), "text A"),
        Doc(5L, ts("2024-01-01 10:01:01"), "text C"))
      q.processAllAvailable()
      val admitted = spark.sql("SELECT doc_id FROM dedup_admit")
        .as[Long].collect().toSet
      assert(admitted == Set(1L, 3L, 5L))
    } finally q.stop()
  }

  test("id-ordered replay of real testdata ≡ batch exactByHash") {
    implicit val sqlCtx = spark.sqlContext
    // salt exact dups onto the corpus (it has none naturally)
    val docs = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val salted = (docs ++ docs.filter(_._1 % 7 == 0)
        .map { case (id, t) => (id + 100000L, t) })
      .sortBy(_._1)
      .map { case (id, t) =>
        Doc(id, ts("2024-01-01 10:00:00"), t) }
    val batchKept = graft.ops.Dedup.exactByHash(
        salted.map(d => (d.doc_id, d.text)).toDF("doc_id", "text"))
      .select($"doc_id").as[Long].collect().toSet

    val input = MemoryStream[Doc]
    val q = DedupStream.admitted(input.toDS())
      .writeStream.format("memory").queryName("dedup_replay")
      .outputMode(OutputMode.Append).start()
    try {
      // feed in three id-ordered chunks (arrival order = id order,
      // the precondition under which stream ≡ batch)
      salted.grouped(200).foreach { chunk =>
        input.addData(chunk: _*)
        q.processAllAvailable()
      }
      val streamKept = spark.sql("SELECT doc_id FROM dedup_replay")
        .as[Long].collect().toSet
      assert(streamKept == batchKept)
      assert(streamKept.size < salted.size,
        "salt must create real duplicates")
    } finally q.stop()
  }
}
