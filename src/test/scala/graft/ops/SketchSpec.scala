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
}
