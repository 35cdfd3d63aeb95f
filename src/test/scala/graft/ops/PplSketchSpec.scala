package graft.ops

import graft.SparkSpec

/** [[TextOps.perplexityBucketSampleSketch]] vs the exact ntile cut —
  * the RfmSketchSpec argument applied to the quality family's global
  * sort: every bucket flip sits within one histogram-bucket width of
  * the exact ntile boundary band and never skips a bucket. */
class PplSketchSpec extends SparkSpec {
  import spark.implicits._

  private val docs =
    graft.io.Tables.documents(spark, "/root/testdata/sf0.001")

  test("sketch buckets agree with ntile within one bucket width") {
    val buckets = 256
    val exact = TextOps.perplexityBucketSample(docs)
      .select("doc_id", "lm_score", "bucket")
      .as[(Long, Double, Long)].collect().toSeq
    val sk = TextOps.perplexityBucketSampleSketch(docs, buckets = buckets)
      .select("doc_id", "bucket")
      .as[(Long, Long)].collect().toMap
    assert(exact.nonEmpty && exact.size == sk.size)
    val scores = exact.map(_._2)
    val w = (scores.max - scores.min) / buckets
    // descending axis: bucket b holds LARGER scores than b+1
    val byBucket = exact.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    var flips = 0
    exact.foreach { case (id, v, eb) =>
      val sb = sk(id)
      if (sb != eb) {
        flips += 1
        assert(math.abs(sb - eb) == 1,
          s"doc $id skipped a bucket (exact=$eb sketch=$sb)")
        val lowB = math.min(eb, sb)
        val hiB = math.max(eb, sb)
        val boundaryLo = byBucket(hiB).max min byBucket(lowB).min
        val boundaryHi = byBucket(hiB).max max byBucket(lowB).min
        assert(v >= boundaryLo - w && v <= boundaryHi + w,
          s"doc $id score $v outside boundary band " +
            s"[$boundaryLo, $boundaryHi] ± $w")
      }
    }
    info(s"$flips/${exact.size} boundary flips (w=$w)")
  }

  test("sketch path plans NO single-partition exchange (the point)") {
    val skPlan = TextOps.perplexityBucketSampleSketch(docs)
      .queryExecution.executedPlan.toString
    assert(!skPlan.contains("SinglePartition"),
      s"sketch path contains a global sort:\n$skPlan")
    val exPlan = TextOps.perplexityBucketSample(docs)
      .queryExecution.executedPlan.toString
    assert(exPlan.contains("SinglePartition")) // the ntile contrast
  }

  test("keep counts follow floor(frac·n_b + 0.5) per sketch bucket") {
    val got = TextOps.perplexityBucketSampleSketch(docs)
      .select("bucket", "kept").as[(Long, Boolean)].collect().toSeq
    val fracs = Map(1L -> 1.0, 2L -> 0.5, 3L -> 0.0)
    got.groupBy(_._1).foreach { case (b, rows) =>
      val kept = rows.count(_._2)
      val want = math.floor(fracs(b) * rows.size + 0.5).toLong
      assert(kept == want, s"bucket $b kept $kept, want $want")
    }
  }

  test("constant fluency collapses to one bucket, never a forced split") {
    val same = (1L to 6L).map(i => (i, "alpha beta alpha beta"))
      .toDF("doc_id", "text")
    val got = TextOps.perplexityBucketSampleSketch(same)
      .select("bucket").distinct().as[Long].collect().toSeq
    assert(got == Seq(1L)) // ntile would split identical docs 2/2/2
  }
}
