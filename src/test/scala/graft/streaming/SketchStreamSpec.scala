package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.ops.Sketch
import SketchStream.Ev

class SketchStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("registerAndRho replays the batch md5 register/rho derivation") {
    val vals = Seq("1", "42", "999999", "hello")
    val batch = vals.toDF("v")
      .select(col("v"),
        conv(substring(md5(col("v")), 1, 2), 16, 10).cast("int")
          .as("register"))
    val rhoDf = vals.toDF("v").select(col("v"), md5(col("v")).as("h"))
    // batch rho via the same private path hllSketch uses: recompute
    // through hllSketch on a 1-group frame
    val sk = Sketch.hllSketch(
        vals.zipWithIndex.map { case (v, _) => ("g", v) }
          .toDF("g", "value"),
        Seq("g"), "value")
      .collect().map(r => r.getInt(0) -> r.getInt(2)).toMap
    val streamSide = vals.map(SketchStream.registerAndRho)
    val batchRegs = batch.collect().map(_.getInt(1)).toSeq
    assert(streamSide.map(_._1) === batchRegs)
    // every stream (reg, rho) must be <= the batch sketch's max for
    // that register, and registers with a unique value must be equal
    streamSide.foreach { case (reg, rho) =>
      assert(sk.contains(reg) && rho <= sk(reg))
    }
    assert(rhoDf.count() === vals.length)
  }

  test("stream estimate == batch hllDistinct estimate, across multi-batch feeds") {
    implicit val sqlCtx = spark.sqlContext
    val evDf = graft.io.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_type"), col("user_id"))
      .collect().map(r => (r.getString(0), r.getLong(1)))

    val batchOut = Sketch.hllDistinct(
        evDf.toSeq.toDF("event_type", "user_id"),
        Seq("event_type"), "user_id")
      .collect()
      .map(r => r.getString(0) ->
        (r.getAs[Double]("hll_estimate"), r.getAs[Long]("n_zero_registers")))
      .toMap

    val input = MemoryStream[Ev]
    val q = SketchStream.distinctCounts(input.toDS())
      .writeStream.format("memory").queryName("hll_stream")
      .outputMode(OutputMode.Update).start()
    try {
      // three arrival chunks with advancing event time — the final
      // update per group must equal the batch sketch of the union
      val chunks = evDf.zipWithIndex.groupBy(_._2 % 3).toSeq.sortBy(_._1)
      var minute = 0
      chunks.foreach { case (_, rows) =>
        input.addData(rows.map { case ((et, uid), _) =>
          Ev(et, ts(f"2024-01-01 10:$minute%02d:00"), uid) }.toSeq: _*)
        q.processAllAvailable()
        minute += 1
      }
      // memory sink in Update mode appends each update; keep the last
      // row per group
      val last = spark.sql(
          "SELECT event_type, hll_estimate, n_zero_registers FROM hll_stream")
        .collect().zipWithIndex
        .groupBy(_._1.getString(0))
        .map { case (et, rows) => et -> rows.maxBy(_._2)._1 }
      assert(last.keySet === batchOut.keySet)
      last.foreach { case (et, r) =>
        assert(r.getDouble(1) === batchOut(et)._1,
          s"$et estimate diverged from batch")
        assert(r.getInt(2).toLong === batchOut(et)._2,
          s"$et zero-register count diverged from batch")
      }
    } finally q.stop()
  }

  test("heavyHitters: final stream top-k == batch cmsHeavyHitters on the same corpus") {
    implicit val sqlCtx = spark.sqlContext
    // sparse vocabulary in the 4x256 sketch -> estimates exact, so
    // stream (est-ranked) and batch (exact-ranked) orders coincide
    val words = Seq.fill(9)("alpha") ++ Seq.fill(7)("beta") ++
      Seq.fill(4)("gamma") ++ Seq.fill(2)("delta") ++ Seq("eps")
    val batchOut = Sketch.cmsHeavyHitters(
        Seq((1L, words.mkString(" "))).toDF("doc_id", "text"), k = 3)
      .collect()
      .map(r => r.getAs[String]("tok") -> r.getAs[Long]("cms_estimate"))
      .toMap

    val input = MemoryStream[SketchStream.Tok]
    val q = SketchStream.heavyHitters(input.toDS(), k = 3)
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode(OutputMode.Update).start()
    try {
      // feed the same multiset in two arrival chunks
      val (c1, c2) = words.splitAt(words.length / 2)
      input.addData(c1.map(w =>
        SketchStream.Tok("g", ts("2024-01-01 10:00:00"), w)): _*)
      q.processAllAvailable()
      input.addData(c2.map(w =>
        SketchStream.Tok("g", ts("2024-01-01 10:01:00"), w)): _*)
      q.processAllAvailable()
      val rows = spark.sql(
          "SELECT rank, tok, cms_estimate FROM cms_stream")
        .collect().zipWithIndex
      // last emission = rows with the highest index per rank
      val last = rows.groupBy(_._1.getInt(0))
        .map { case (_, rs) => rs.maxBy(_._2)._1 }
        .map(r => r.getString(1) -> r.getLong(2)).toMap
      assert(last === batchOut)
      assert(last === Map("alpha" -> 9L, "beta" -> 7L, "gamma" -> 4L))
    } finally q.stop()
  }

  test("heavyHitters: candidate list is bounded at k and re-ranks across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SketchStream.Tok]
    val q = SketchStream.heavyHitters(input.toDS(), k = 2)
      .writeStream.format("memory").queryName("cms_bounded")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(
        SketchStream.Tok("g", ts("2024-01-01 10:00:00"), "x"),
        SketchStream.Tok("g", ts("2024-01-01 10:00:00"), "x"),
        SketchStream.Tok("g", ts("2024-01-01 10:00:00"), "y"))
      q.processAllAvailable()
      // z floods in batch 2 and must displace y from the top-2
      input.addData((1 to 5).map(_ =>
        SketchStream.Tok("g", ts("2024-01-01 10:00:30"), "z")): _*)
      q.processAllAvailable()
      val rows = spark.sql("SELECT rank, tok FROM cms_bounded")
        .collect().zipWithIndex
      val last = rows.groupBy(_._1.getInt(0))
        .map { case (_, rs) => rs.maxBy(_._2)._1.getString(1) }.toSet
      assert(last === Set("z", "x"))
      // every emission respects the k bound
      assert(rows.map(_._1.getInt(0)).forall(r => r >= 1 && r <= 2))
    } finally q.stop()
  }

  test("state is duplicate-proof: one value flooded never moves the estimate") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = SketchStream.distinctCounts(input.toDS())
      .writeStream.format("memory").queryName("hll_flood")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(Ev("c", ts("2024-01-01 10:00:00"), 7L))
      q.processAllAvailable()
      input.addData((1 to 500).map(_ =>
        Ev("c", ts("2024-01-01 10:00:30"), 7L)): _*)
      q.processAllAvailable()
      val ests = spark.sql("SELECT hll_estimate FROM hll_flood")
        .as[Double].collect().toSeq
      assert(ests.distinct.size === 1, "duplicates changed the sketch")
    } finally q.stop()
  }
}
