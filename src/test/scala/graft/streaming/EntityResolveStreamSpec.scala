package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.io.Tables
import graft.ops.Entity

case class EntityRec(rid: Long, name: String, src: String)

class EntityResolveStreamSpec extends SparkSpec {
  import spark.implicits._

  test("stream-fed compaction ≡ batch entityResolve on split real testdata") {
    implicit val sqlCtx = spark.sqlContext
    // q146's registry over REAL testdata: every part name plus its
    // planted single-deletion dirty twin
    val all = Entity.dirtyRegistry(
        Tables.part(spark, "/root/testdata/sf0.001"))
      .as[EntityRec].collect().toSeq
    assert(all.size >= 200, s"got ${all.size}")

    val base = Files.createTempDirectory("graft_er_stream").toString
    // stored base state over the first slice (pre-stream history) —
    // catalog rows and feed rows interleave across the split, so
    // planted twins genuinely straddle batches
    val (hist, live) = all.sortBy(_.rid % 7).splitAt(all.size / 3)
    Entity.namePartial(spark.createDataset(hist).toDF())
      .write.parquet(s"$base/names_base")

    val input = MemoryStream[EntityRec]
    val q = EntityResolveStream.start(input.toDF(), s"$base/shards",
      Files.createTempDirectory("graft_er_ckpt").toString)
    try {
      val (b1, b2) = live.splitAt(live.size / 2)
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    assert(new java.io.File(s"$base/shards").listFiles()
      .count(_.getName.startsWith("batch_")) == 2)

    EntityResolveStream.compact(spark, Some(s"$base/names_base"),
      s"$base/shards", s"$base/serving")

    val records = spark.createDataset(all).toDF()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("rid").collect()
        .map(_.toSeq.map(String.valueOf).mkString("|")).toSeq
    val served = rows(EntityResolveStream.resolve(spark, s"$base/serving",
      records))
    val oneShot = rows(Entity.entityResolve(records))
    assert(served == oneShot)
    assert(served.size == all.size) // every-row-out contract survives

    // compacted names state is RE-MERGEABLE and idempotent on nid:
    // merging it with itself keeps every nid (cnt doubles — the one
    // additive column, which is why retried batches must overwrite)
    val st = spark.read.parquet(s"$base/serving/names")
    val twice = Entity.mergeNamePartials(Seq(st, st))
      .select("name", "nid").orderBy("nid").collect().toSeq
    assert(twice == st.select("name", "nid").orderBy("nid")
      .collect().toSeq)

    val ex = intercept[IllegalArgumentException] {
      EntityResolveStream.compact(spark, None, s"$base/none", s"$base/s2")
    }
    assert(ex.getMessage.contains("no shards"))
  }
}
