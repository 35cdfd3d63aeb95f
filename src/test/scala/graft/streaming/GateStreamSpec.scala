package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

class GateStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streaming gate ≡ batch gate on the real corpus, across batches") {
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val input = MemoryStream[(Long, String)]
    val q = GateStream.gated(input.toDF()
        .toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("gate_out")
      .outputMode(OutputMode.Append).start()
    try {
      val (b1, b2) = docs.splitAt(docs.size / 2)
      input.addData(b1)
      q.processAllAvailable()
      input.addData(b2)
      q.processAllAvailable()
      val streamed = spark.sql("SELECT * FROM gate_out")
        .as[(Long, Boolean, Option[String], String, String)]
        .collect().toSet
      val batch = GateStream.gated(
          graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
            .select($"doc_id", $"text"))
        .as[(Long, Boolean, Option[String], String, String)]
        .collect().toSet
      assert(streamed == batch)
      assert(streamed.size == docs.size)
      // the gate is total: every record gets a verdict and a split
      assert(streamed.forall(r => Set("train", "val", "test")(r._5)))
    } finally q.stop()
  }

  test("gate plan is stateless: no aggregation, no join, no sort") {
    val plan = GateStream.gated(
        graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
          .select($"doc_id", $"text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
    assert(!plan.contains("Join"))
    assert(!plan.contains("Aggregate"))
  }
}
