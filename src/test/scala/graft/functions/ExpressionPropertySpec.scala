package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property tests pinning the native expressions to independent Scala
  * models — guards the codegen'd loops against drift from the
  * semantics their composable twins define. */
class ExpressionPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("SortedIntersectCount == set-intersection size on distinct sorted sets") {
    val gen = Gen.listOfN(80, Gen.zip(
      Gen.listOf(Gen.choose(0, 30).map(i => s"w$i")),
      Gen.listOf(Gen.choose(0, 30).map(i => s"w$i"))))
    sample(gen, 7L).zipWithIndex.map { case ((a, b), i) =>
      (i.toLong, a.distinct.sorted, b.distinct.sorted,
        (a.toSet & b.toSet).size.toLong)
    }.toDF("id", "a", "b", "expected")
      .select(
        TextExpressions.sorted_intersect_count($"a", $"b").as("got"),
        $"expected")
      .collect()
      .foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("SortedDistinctShingles == array_sort(array_distinct(shingles))") {
    import org.apache.spark.sql.functions._
    // random word lists INCLUDING shorter-than-n docs and repeats,
    // plus the real sf0.001 corpus — the composable chain is the
    // semantic model the codegen'd pass must match byte-for-byte
    val gen = Gen.listOfN(60,
      Gen.listOf(Gen.choose(0, 12).map(i => s"w$i")).map(_.take(30)))
    val crafted = sample(gen, 11L).zipWithIndex
      .map { case (ws, i) =>
        (i.toLong, if (ws.isEmpty) "w0" else ws.mkString(" "))
      }.toDF("doc_id", "text")
    val real = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")
    // an EMPTY token array (no current caller produces one — tokens()
    // of "" is [""] — but byte-identity must not depend on that) must
    // match the model's [""], not crash
    val empty = Seq(Tuple1(Seq.empty[String])).toDF("toks")
      .select(TextExpressions.sorted_distinct_shingles($"toks", 3).as("got"))
      .head().getSeq[String](0)
    assert(empty == Seq(""))
    for (df <- Seq(crafted, real); n <- Seq(3, 5)) {
      val toks = graft.ops.TextOps.tokens($"text")
      val mism = df.select(
          TextExpressions.sorted_distinct_shingles(toks, n).as("got"),
          array_sort(array_distinct(
            graft.ops.TextOps.shingles($"text", n))).as("want"))
        .filter(not($"got" <=> $"want")).count()
      assert(mism == 0, s"n=$n: $mism rows diverge from the model")
    }
  }

  test("shingles_multiset == composable shingles() byte-for-byte (order + duplicates)") {
    import org.apache.spark.sql.functions._
    val gen = Gen.listOfN(60,
      Gen.listOf(Gen.choose(0, 12).map(i => s"w$i")).map(_.take(30)))
    val crafted = sample(gen, 17L).zipWithIndex
      .map { case (ws, i) =>
        (i.toLong, if (ws.isEmpty) "w0" else ws.mkString(" "))
      }.toDF("doc_id", "text")
    val real = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")
    val empty = Seq(Tuple1(Seq.empty[String])).toDF("toks")
      .select(TextExpressions.shingles_multiset($"toks", 2).as("got"))
      .head().getSeq[String](0)
    assert(empty == Seq(""))
    for (df <- Seq(crafted, real); n <- Seq(1, 2, 3, 5)) {
      val toks = graft.ops.TextOps.tokens($"text")
      val mism = df.select(
          TextExpressions.shingles_multiset(toks, n).as("got"),
          graft.ops.TextOps.shingles($"text", n).as("want"))
        .filter(not($"got" <=> $"want")).count()
      assert(mism == 0, s"n=$n: $mism rows diverge from the model")
    }
  }

  test("DotProduct == Scala fold on random double vectors") {
    val gen = Gen.listOfN(50, Gen.zip(
      Gen.listOfN(16, Gen.chooseNum(-100.0, 100.0)),
      Gen.listOfN(16, Gen.chooseNum(-100.0, 100.0))))
    sample(gen, 8L).map { case (a, b) =>
      (a, b, a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y })
    }.toDF("a", "b", "expected")
      .select(VectorExpressions.dot_product($"a", $"b").as("got"),
        $"expected")
      .collect()
      .foreach(r => assert(r.getDouble(0) == r.getDouble(1)))  // bit-exact
  }

  test("MinHashFromHashes == Scala affine-min model") {
    val k = 16
    val aP = DeterministicHash.minhashA(k)
    val bP = DeterministicHash.minhashB(k)
    val mask = (1L << 31) - 1
    val gen = Gen.listOfN(30, Gen.listOf(Gen.chooseNum(Long.MinValue, Long.MaxValue)))
    sample(gen, 9L).map { hs =>
      val expected = (0 until k).map { i =>
        if (hs.isEmpty) Long.MaxValue
        else hs.map(h =>
          (aP(i) * (h & mask) + bP(i)) % DeterministicHash.MinhashP).min
      }
      (hs, expected)
    }.toDF("hs", "expected")
      .select(TextExpressions.minhash_from_hashes($"hs", k).as("got"),
        $"expected")
      .collect()
      .foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("LongArrayPairs: all pairs when small, star pairs to min beyond cap") {
    val df = Seq(
      (1L, Seq(3L, 1L, 2L)),            // small -> all 3 pairs
      (2L, Seq(9L, 5L, 7L, 6L, 8L)))    // > cap(3) -> 4 star pairs
      .toDF("id", "ids")
      .select($"id",
        TextExpressions.long_array_pairs($"ids", 3).as("pairs"))
    val m = df.collect().map(r => r.getLong(0) ->
      r.getSeq[org.apache.spark.sql.Row](1)
        .map(p => (p.getLong(0), p.getLong(1)))).toMap
    assert(m(1L).toSet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(m(2L).toSet == Set((5L, 6L), (5L, 7L), (5L, 8L), (5L, 9L)))
  }

  test("SignLshBuckets and IvfProbes: deterministic, in-range outputs") {
    val gen = Gen.listOfN(40, Gen.listOfN(8, Gen.chooseNum(-1.0, 1.0)))
    val vecs = sample(gen, 10L).zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val out1 = vecs.select(
      VectorExpressions.sign_lsh_buckets($"v", 6, 3).as("b"),
      VectorExpressions.ivf_probes($"v", 16, 4).as("p")).collect()
    val out2 = vecs.select(
      VectorExpressions.sign_lsh_buckets($"v", 6, 3).as("b"),
      VectorExpressions.ivf_probes($"v", 16, 4).as("p")).collect()
    out1.zip(out2).foreach { case (r1, r2) =>
      assert(r1.getSeq[Long](0) == r2.getSeq[Long](0))
      assert(r1.getSeq[Int](1) == r2.getSeq[Int](1))
      assert(r1.getSeq[Long](0).forall(b => b >= 0 && b < (1L << 6)))
      val probes = r1.getSeq[Int](1)
      assert(probes.distinct.size == 4 && probes.forall(p => p >= 0 && p < 16))
    }
  }
}
