package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.ops.Components

class ComponentStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streamed edge shards + compaction ≡ full-batch components") {
    implicit val sqlCtx = spark.sqlContext
    // day-0 base graph: {1,2,3}, {10,11}
    val day0 = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    // streamed edges: bridge the base components, a new component,
    // and a REPLAYED duplicate of a base edge (idempotence)
    val live = Seq((3L, 10L), (70L, 71L), (1L, 2L), (11L, 12L))

    val base = Files.createTempDirectory("graft_cc_stream").toString
    Components.connectedComponents(day0.toDF("src", "dst"))
      .write.parquet(s"$base/labels_v0")

    val input = MemoryStream[(Long, Long)]
    val q = ComponentStream.start(input.toDF().toDF("src", "dst"),
      s"$base/shards",
      Files.createTempDirectory("graft_cc_ckpt").toString)
    try {
      val (b1, b2) = live.splitAt(2)
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    ComponentStream.compact(spark, Some(s"$base/labels_v0"),
      s"$base/shards", s"$base/labels_v1")

    def lbl(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long)].collect().sorted.toSeq
    val served = lbl(spark.read.parquet(s"$base/labels_v1"))
    val full = lbl(Components.connectedComponents(
      (day0 ++ live).toDF("src", "dst")))
    assert(served == full)
    assert(served.contains((11L, 1L)) && served.contains((12L, 1L)))
    assert(served.contains((71L, 70L)))

    // one shard per micro-batch; compaction without a base works too
    val dirs = new java.io.File(s"$base/shards").listFiles()
      .filter(_.getName.startsWith("batch_"))
    assert(dirs.length == 2)
    ComponentStream.compact(spark, None, s"$base/shards", s"$base/solo")
    assert(lbl(spark.read.parquet(s"$base/solo")) ==
      lbl(Components.connectedComponents(live.toDF("src", "dst"))))
    val ex = intercept[IllegalArgumentException] {
      ComponentStream.compact(spark, None, s"$base/none", s"$base/x")
    }
    assert(ex.getMessage.contains("no shards"))
  }
}
