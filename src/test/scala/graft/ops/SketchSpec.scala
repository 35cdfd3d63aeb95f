package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("cmsHeavyHitters: estimates are one-sided (never below exact)") {
    val d = docs(
      "a a a b b c d e f g h i j k l m n o p q",
      "a b b c c c x y z w v u t s r q p o n m")
    val out = Sketch.cmsHeavyHitters(d, k = 30).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("cms_estimate") >= r.getAs[Long]("exact"),
        s"CMS under-estimated ${r.getAs[String]("tok")}")
      assert(r.getAs[Double]("inflation") >= 1.0)
    }
  }

  test("cmsHeavyHitters: width 1 collapses every row to the total count") {
    val d = docs("a a b", "c d")
    val out = Sketch.cmsHeavyHitters(d, k = 5, depth = 2, width = 1)
      .collect()
    // every bucket is the same cell = total token count (5)
    out.foreach(r => assert(r.getAs[Long]("cms_estimate") === 5L))
  }

  test("cmsHeavyHitters: sparse vocabulary in a wide sketch is exact") {
    // 3 tokens across 4×256 cells: collision probability is tiny but
    // not zero by luck of md5 — assert estimate == exact, which also
    // pins the hash derivation (a changed hash would collide or
    // mis-probe and break one-sidedness elsewhere)
    val d = docs("alpha alpha beta", "gamma alpha")
    val out = Sketch.cmsHeavyHitters(d, k = 3).collect()
      .map(r => r.getAs[String]("tok") ->
        (r.getAs[Long]("exact"), r.getAs[Long]("cms_estimate"))).toMap
    assert(out("alpha") === ((3L, 3L)))
    assert(out("beta") === ((1L, 1L)))
    assert(out("gamma") === ((1L, 1L)))
  }

  test("cmsBuild: cell counts sum to depth × token occurrences") {
    val d = docs("a b c", "d e")
    val toks = d.select(explode(split(col("text"), " ")).as("tok"))
    val cells = Sketch.cmsBuild(toks, depth = 4, width = 16)
    assert(cells.agg(sum("cnt")).head.getLong(0) === 4L * 5)
    // row ids cover 0..3
    assert(cells.select("row").distinct().count() === 4)
  }

  test("lengthBuckets: hand-computed buckets, waste, and truncation") {
    val d = docs(
      Seq.fill(10)("w").mkString(" "),   // len 10 → bucket 16
      Seq.fill(20)("w").mkString(" "),   // len 20 → bucket 32
      Seq.fill(100)("w").mkString(" "),  // len 100 → bucket 128
      Seq.fill(200)("w").mkString(" "))  // len 200 → bucket 128, 72 dropped
    val out = TextOps.lengthBuckets(d).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(out.keySet === Set(16, 32, 128))
    assert(out(16).getAs[Long]("n_docs") === 1)
    assert(out(16).getAs[Long]("real_tokens") === 10)
    assert(out(16).getAs[Long]("padded_tokens") === 16)
    assert(math.abs(out(16).getAs[Double]("waste") - 0.375) < 1e-12)
    assert(out(32).getAs[Long]("real_tokens") === 20)
    // 128 bucket: real = 100 + min(200,128) = 228, padded = 256
    assert(out(128).getAs[Long]("n_docs") === 2)
    assert(out(128).getAs[Long]("real_tokens") === 228)
    assert(out(128).getAs[Long]("padded_tokens") === 256)
    assert(out(128).getAs[Long]("tokens_truncated") === 72)
  }

  test("lengthBuckets: rejects unsorted caps") {
    val d = docs("a b")
    intercept[IllegalArgumentException] {
      TextOps.lengthBuckets(d, caps = Seq(32, 16))
    }
  }

  test("cmsMerge: shard sketches sum to the union-corpus sketch") {
    val a = docs("a a b c", "d e a")
    val b = docs("b b c f", "a g")
    def toks(d: org.apache.spark.sql.DataFrame) =
      d.select(explode(split(col("text"), " ")).as("tok"))
    val merged = Sketch.cmsMerge(Seq(
        Sketch.cmsBuild(toks(a), 4, 64), Sketch.cmsBuild(toks(b), 4, 64)))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val full = Sketch.cmsBuild(toks(a.unionByName(b)), 4, 64)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged === full)
  }

  private def events(rows: (String, Long)*) =
    rows.toSeq.toDF("event_type", "user_id")

  test("hllSketch: registers bounded, rho in range, duplicates don't move the sketch") {
    val e = events(("c", 1L), ("c", 2L), ("c", 2L), ("v", 1L), ("v", 9L))
    val sk = Sketch.hllSketch(e, Seq("event_type"), "user_id").collect()
    assert(sk.forall(r => r.getAs[Int]("register") >= 0 &&
      r.getAs[Int]("register") < 256))
    assert(sk.forall(r => r.getAs[Int]("rho_max") >= 1 &&
      r.getAs[Int]("rho_max") <= 33))
    val dup = Sketch.hllSketch(e.unionByName(e), Seq("event_type"), "user_id")
      .collect()
    assert(sk.map(_.toSeq).toSet === dup.map(_.toSeq).toSet,
      "HLL is insensitive to multiplicity")
  }

  test("hllMerge: register-max of shard sketches equals the union sketch") {
    val a = events(("c", 1L), ("c", 2L), ("v", 3L))
    val b = events(("c", 2L), ("c", 9L), ("w", 4L))
    val merged = Sketch.hllMerge(
        Seq(Sketch.hllSketch(a, Seq("event_type"), "user_id"),
          Sketch.hllSketch(b, Seq("event_type"), "user_id")),
        Seq("event_type")).collect().map(_.toSeq).toSet
    val full = Sketch.hllSketch(a.unionByName(b), Seq("event_type"), "user_id")
      .collect().map(_.toSeq).toSet
    assert(merged === full)
  }

  test("hllDistinct: estimate within the 256-register error bound on real data") {
    val ev = graft.io.Tables.events(spark, "/root/testdata/sf0.001")
    val out = Sketch.hllDistinct(ev, Seq("event_type"), "user_id").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      // 1.04/sqrt(256) = 6.5% std error; 4 sigma = 26%
      assert(r.getAs[Double]("rel_error") < 0.26,
        s"${r.getAs[String]("event_type")}: rel_error ${r.getAs[Double]("rel_error")}")
      assert(r.getAs[Long]("n_zero_registers") >= 0)
    }
  }

  test("histSketch/histMerge: clamping, counts, and the merge law") {
    val a = Seq(-5.0, 0.0, 3.0, 9.99).toDF("x")   // -5 clamps to bucket 0
    val b = Seq(10.0, 25.0, 99.0).toDF("x")       // 25, 99 clamp to top
    val ha = Sketch.histSketch(a, "x", 0.0, 20.0, 2)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(ha === Map(0 -> 4L))                   // all of a in [0,10)
    val merged = Sketch.histMerge(Seq(
        Sketch.histSketch(a, "x", 0.0, 20.0, 2),
        Sketch.histSketch(b, "x", 0.0, 20.0, 2)))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val full = Sketch.histSketch(a.unionByName(b), "x", 0.0, 20.0, 2)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(merged === full)
    assert(full === Map(0 -> 4L, 1 -> 3L))
  }

  test("histQuantiles: hand-computed estimate and the one-bucket bound") {
    // 10 values 1..10, [0, 10) in 5 buckets of width 2
    val d = (1 to 10).map(_.toDouble).toDF("x")
    val out = Sketch.histQuantiles(d, "x", 0.0, 10.0, 5,
        qs = Seq(0.5, 1.0)).collect()
      .map(r => r.getDouble(0) -> r).toMap
    // q=0.5: rank 5, bucket 2 holds {4,5} cum 5, cum_prev 3
    //   est = 0 + 2*(2 + (5-3)/2) = 6.0; exact value = 5.0
    assert(out(0.5).getAs[Double]("hist_estimate") === 6.0)
    assert(out(0.5).getAs[Double]("exact_value") === 5.0)
    assert(out(0.5).getAs[Double]("abs_error") === 1.0)
    // q=1.0: rank 10, top bucket {10} clamped in — bucket 4 holds
    //   {8,9,10}: est = 2*(4 + 3/3) = 10.0, exact 10.0
    assert(out(1.0).getAs[Double]("hist_estimate") === 10.0)
    out.values.foreach(r =>
      assert(r.getAs[Double]("abs_error") <= r.getAs[Double]("bound")))
  }

  test("histQuantiles: bound holds on real data at every quantile") {
    val docs = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Sketch.histQuantiles(docs, "n_chars", 0.0, 1024.0, 128,
      qs = Seq(0.25, 0.5, 0.9, 0.99)).collect()
    assert(out.length === 4)
    out.foreach { r =>
      assert(r.getAs[Double]("abs_error") <= r.getAs[Double]("bound"),
        s"q=${r.getDouble(0)}")
    }
  }

  test("kmvDistinct: exact below k, bounded error above") {
    // below k: 3 distinct users -> estimate == exact == 3
    val small = events(("c", 1L), ("c", 2L), ("c", 3L), ("c", 1L))
    val s = Sketch.kmvDistinct(small, Seq("event_type"), "user_id").collect()
    assert(s.head.getAs[Double]("kmv_estimate") === 3.0)
    assert(s.head.getAs[Double]("rel_error") === 0.0)

    val ev = graft.io.Tables.events(spark, "/root/testdata/sf0.001")
    val out = Sketch.kmvDistinct(ev, Seq("event_type"), "user_id").collect()
    out.foreach { r =>
      // 1/sqrt(k-2) = 12.7% std at k=64; 4 sigma headroom
      assert(r.getAs[Double]("rel_error") < 0.51,
        s"${r.getAs[String]("event_type")}: rel_error ${r.getAs[Double]("rel_error")}")
    }
  }
}
