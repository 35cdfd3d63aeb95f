package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.SparkSpec
import graft.ops.Incremental

case class Sale(month: String, amount: BigDecimal, qty: Long)

class GoldStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streamed shards + compaction ≡ one-shot Gold, shard per batch") {
    implicit val sqlCtx = spark.sqlContext
    val sales = (1 to 300).map { i =>
      Sale(f"2024-${i % 12 + 1}%02d",
        BigDecimal((i * 37) % 500) / 100, (i % 9).toLong)
    }
    def dec(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("amount", col("amount").cast(DecimalType(18, 2)))

    val base = Files.createTempDirectory("graft_gold_stream").toString
    // stored base Gold over the first third
    val (hist, live) = sales.splitAt(100)
    Incremental.partialAggregate(dec(hist.toDF()), Seq("month"),
      sumCols = Seq("amount", "qty"), minCols = Seq("amount"),
      maxCols = Seq("amount"))
      .write.parquet(s"$base/gold_base")

    val input = MemoryStream[Sale]
    val q = GoldStream.start(dec(input.toDF()), s"$base/shards",
      Files.createTempDirectory("graft_gold_ckpt").toString,
      keys = Seq("month"), sumCols = Seq("amount", "qty"),
      minCols = Seq("amount"), maxCols = Seq("amount"))
    try {
      val (b1, b2) = live.splitAt(77)
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    GoldStream.compact(spark, Some(s"$base/gold_base"),
      s"$base/shards", s"$base/serving",
      keys = Seq("month"), sumCols = Seq("amount", "qty"),
      minCols = Seq("amount"), maxCols = Seq("amount"))

    val served = spark.read.parquet(s"$base/serving")
      .orderBy("month").collect().map(_.toSeq.map(String.valueOf)).toSeq
    val oneShot = Incremental.partialAggregate(dec(sales.toDF()),
        Seq("month"), sumCols = Seq("amount", "qty"),
        minCols = Seq("amount"), maxCols = Seq("amount"))
      .orderBy("month").collect().map(_.toSeq.map(String.valueOf)).toSeq
    assert(served == oneShot)

    // one shard per non-empty micro-batch, idempotent under re-merge
    val shardDirs = new java.io.File(s"$base/shards").listFiles()
      .filter(_.getName.startsWith("batch_")).map(_.getName).sorted
    assert(shardDirs.length == 2)
    val ex = intercept[IllegalArgumentException] {
      GoldStream.compact(spark, None, s"$base/none", s"$base/s2",
        keys = Seq("month"), sumCols = Seq("amount"))
    }
    assert(ex.getMessage.contains("no shards"))
  }
}
