package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalPcaSpec extends SparkSpec {
  import spark.implicits._

  test("bm25Search ranks matching docs, respects k, rarer term wins") {
    val docs = Seq(
      (1L, "spark spark spark join join filter filter filter filter"),
      (2L, "spark join things and other words here now today maybe"),
      (3L, "nothing relevant in this document at all whatsoever here"),
      (4L, "rareword appears here exactly once with other padding text"),
      (5L, "spark once among many many many other padding words here")
    ).toDF("doc_id", "text")
    val out = TextOps.bm25Search(docs, Seq("spark", "rareword"), k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(out.length == 3) // doc 3 matches nothing; k caps the rest
    assert(out.map(_._1).toSet.subsetOf(Set(1L, 2L, 4L, 5L)))
    // ranks are 1..3 in order, scores non-increasing
    assert(out.map(_._2).toSeq == Seq(1, 2, 3))
    assert(out.sliding(2).forall(p => p(0)._3 >= p(1)._3))
    // rareword (df=1) outscores spark (df=3): doc 4 beats doc 5
    val score = out.map(r => r._1 -> r._3).toMap
    assert(score.getOrElse(4L, 0.0) > score.getOrElse(5L, Double.MaxValue)
      || !score.contains(5L))
  }

  test("pca powerIteration recovers a planted dominant direction") {
    // variance 16 along axis 3, variance ~1 along axis 10
    val rows = (0 until 40).map { i =>
      val main = (i % 9) - 4.0 // -4..4
      val minor = (i % 3) - 1.0
      val v = Array.fill(64)(0.0f)
      v(3) = (4.0 * main).toFloat
      v(10) = minor.toFloat
      (i.toLong, v.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val out = Pca.powerIteration(df, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // projection matches the CENTERED planted axis-3 coordinate
    // (mean of v(3) over the 40 rows is exactly -1.0), up to the
    // converged sign and a small axis-10 leakage (cov(main, minor)
    // tilts w by ~0.03)
    val cent = rows.map { case (id, v) => id -> (v(3).toDouble + 1.0) }
      .toMap
    val sign = math.signum(out(0L)) * math.signum(cent(0L))
    rows.foreach { case (id, _) =>
      assert(math.abs(out(id) - sign * cent(id)) < 0.2,
        s"id=$id proj=${out(id)} want ~${sign * cent(id)}")
    }
    // deterministic
    val again = Pca.powerIteration(df, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out == again)
  }

  test("standardize: unit variance, zero mean, stats cover full corpus") {
    val rows = (0 until 20).map { i =>
      val v = Array.fill(64)(0.0f)
      v(0) = (i % 5).toFloat          // varying dim
      v(1) = 7.0f                     // constant dim -> std 0
      (i.toLong, v.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val out = Pca.standardize(df, outputIds = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out.size == 10 * 64) // bounded output, all dims
    // dim 0: z-scores of i%5 against the FULL 20-row stats
    val xs = (0 until 20).map(i => (i % 5).toDouble)
    val mean = xs.sum / xs.length
    val std = math.sqrt(xs.map(x => x * x).sum / xs.length - mean * mean)
    (0 until 10).foreach { i =>
      val want = ((i % 5).toDouble - mean) / std
      assert(math.abs(out((i.toLong, 0L)) - want) < 1e-5)
    }
    // constant dims (std 0) standardize to the explicit 0.0
    assert(out((0L, 1L)) == 0.0)
    assert(out((0L, 5L)) == 0.0)
    // deterministic across reruns
    val again = Pca.standardize(df, outputIds = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out == again)
  }

  test("bm25FromIndex is bit-identical to bm25Search, pushes the " +
    "term filter to the postings scan") {
    val docs = Seq(
      (1L, "spark spark spark join join filter filter filter filter"),
      (2L, "spark join things and other words here now today maybe"),
      (3L, "nothing relevant in this document at all whatsoever here"),
      (4L, "rareword appears here exactly once with other padding text"),
      (5L, "spark once among many many many other padding words here")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_test_idx").toString
    TextOps.buildInvertedIndex(docs, dir)
    val terms = Seq("spark", "rareword")
    val fromIndex = TextOps.bm25FromIndex(spark, dir, terms, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val fromScan = TextOps.bm25Search(docs, terms, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(fromIndex.toSeq == fromScan.toSeq) // bit-identical scores
    // the isin filter reaches the postings parquet scan
    val plan = TextOps.bm25FromIndex(spark, dir, terms, k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(term"))
  }

  test("rrfFuse: both-list docs outrank single-list, exact rrf math") {
    val a = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("doc_id", "rank")
    val b = Seq((2L, 1), (4L, 2)).toDF("doc_id", "rank")
    val out = Similarity.rrfFuse(a, b, k = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    // doc 2 appears in both lists -> highest rrf
    assert(out.head._1 == 2L && out.head._2 == 1)
    assert(out.head._3 == 1.0 / 62.0 + 1.0 / 61.0)
    // doc 1 (rank 1 in a only) beats doc 4 (rank 2 in b only)
    val order = out.map(_._1).toSeq
    assert(order == Seq(2L, 1L, 4L, 3L))
    // singles get exactly one reciprocal term
    val rrf = out.map(r => r._1 -> r._3).toMap
    assert(rrf(1L) == 1.0 / 61.0 && rrf(4L) == 1.0 / 62.0)
  }

  // --- passageSearch ------------------------------------------------

  test("passageSearch pools each doc to its best passage") {
    val filler = (1 to 60).map(i => s"f$i").mkString(" ")
    val docs = Seq(
      // terms concentrated in the SECOND chunk window of a long doc
      (1L, filler + " spark spark join " + (1 to 30).map(i => s"g$i").mkString(" ")),
      // short doc, terms diluted with padding
      (2L, "spark join " + (1 to 40).map(i => s"p$i").mkString(" ")),
      // no match
      (3L, "nothing here at all")
    ).toDF("doc_id", "text")
    val got = TextOps.passageSearch(docs, Seq("spark", "join"), k = 5,
        maxTokens = 32, stride = 24)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getDouble(3)))
    // doc 3 absent; docs 1 and 2 each appear exactly once
    assert(got.map(_._1).toSeq.sorted == Seq(1L, 2L))
    assert(got.map(_._2).toSeq == Seq(1, 2))
    assert(got.sliding(2).forall(p => p(0)._4 >= p(1)._4))
    // doc 1's best passage is a LATER chunk (terms live past token 60)
    assert(got.find(_._1 == 1L).get._3 >= 2)
    // doc 2's best passage is its first chunk
    assert(got.find(_._1 == 2L).get._3 == 0)
  }

  // --- mergeInvertedIndexes -----------------------------------------

  test("merged shard indexes answer identically to one full index") {
    val docs = Seq(
      (1L, "spark join filter spark"),
      (2L, "spark and other words here"),
      (3L, "join join join padding text"),
      (4L, "nothing relevant here at all"),
      (5L, "spark join appears twice spark join")
    ).toDF("doc_id", "text")
    val base = java.nio.file.Files
      .createTempDirectory("graft_merge_spec").toString
    TextOps.buildInvertedIndex(docs.filter($"doc_id" % 2 === 0),
      s"$base/even")
    TextOps.buildInvertedIndex(docs.filter($"doc_id" % 2 === 1),
      s"$base/odd")
    TextOps.buildInvertedIndex(docs, s"$base/full")
    TextOps.mergeInvertedIndexes(spark,
      Seq(s"$base/even", s"$base/odd"), s"$base/merged")
    val q = Seq("spark", "join")
    val merged = TextOps.bm25FromIndex(spark, s"$base/merged", q, k = 5)
      .collect().toSeq
    val full = TextOps.bm25FromIndex(spark, s"$base/full", q, k = 5)
      .collect().toSeq
    val scan = TextOps.bm25Search(docs, q, k = 5).collect().toSeq
    assert(merged == full)
    assert(merged == scan)
    // merged stats are the summed shard stats
    val st = spark.read.parquet(s"$base/merged/stats").collect().head
    assert(st.getDouble(0) == 5.0)
    // overlapping shards (a doc indexed twice) are rejected, not
    // silently double-counted into every BM25 score
    val ex = intercept[IllegalArgumentException] {
      TextOps.mergeInvertedIndexes(spark,
        Seq(s"$base/even", s"$base/full"), s"$base/bad")
    }
    assert(ex.getMessage.contains("overlap"))
    // merging over an input in place would delete it mid-read
    val ex2 = intercept[IllegalArgumentException] {
      TextOps.mergeInvertedIndexes(spark,
        Seq(s"$base/even", s"$base/odd"), s"$base/even")
    }
    assert(ex2.getMessage.contains("input"))
  }

  // --- driftReport --------------------------------------------------

  test("driftReport: zero drift on identical snapshots, exact shift") {
    // exact binary fractions -> quantization is lossless
    val a = Seq(
      (1L, Array(0.5f, 2.0f, 7.0f)), (2L, Array(1.5f, 4.0f, 7.0f)))
      .toDF("vec_id", "embedding")
    val same = Pca.driftReport(a, a).collect()
      .map(r => (r.getLong(0), r.getDouble(3), r.getDouble(6)))
    // no shift; var_ratio 1 where var > 0, flagged 0 on constant dim
    assert(same.toSeq == Seq((0L, 0.0, 1.0), (1L, 0.0, 1.0),
      (2L, 0.0, 0.0)))
    // planted +1.0 mean shift in dim 0, x4 variance in dim 1
    val b = Seq(
      (1L, Array(1.5f, 1.0f, 7.0f)), (2L, Array(2.5f, 5.0f, 7.0f)))
      .toDF("vec_id", "embedding")
    val drift = Pca.driftReport(a, b).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(3), r.getDouble(6))))
      .toMap
    assert(drift(0L) == ((1.0, 1.0)))
    assert(drift(1L)._1 == 0.0 && drift(1L)._2 == 4.0)
  }

  // --- randomProject ----------------------------------------------

  private def jlSign(i: Long, j: Long): Long =
    1L - 2L * (((i * 2654435761L + j * 40503L) % 9973L) % 2L)

  test("randomProject matches the exact fixed-point formula") {
    val vecs = Seq(
      (1L, Array(0.5f, -1.25f, 2.0f, 0.125f)),
      (2L, Array(1.0f, 1.0f, 1.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val got = Pca.randomProject(vecs, outDim = 4)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val raw = Map(
      1L -> Array(0.5, -1.25, 2.0, 0.125),
      2L -> Array(1.0, 1.0, 1.0, 1.0))
    for (id <- Seq(1L, 2L); j <- 0L until 4L) {
      val s = raw(id).zipWithIndex.map { case (x, i) =>
        math.floor(x * 1048576.0 + 0.5).toLong * jlSign(i.toLong, j)
      }.sum
      assert(got((id, j)) == s.toDouble / 1048576.0 / 2.0,
        s"id=$id j=$j")
    }
  }

  test("randomProject sign matrix is mixed, not a parity checkerboard") {
    // under the degenerate (i+j) parity, sign(:, j) == sign(:, j+2)
    // for every j and all 16 output dims collapse to ±dim0
    val cols = (0L until 16L).map(j =>
      (0L until 64L).map(i => jlSign(i, j)))
    assert(cols.distinct.size > 2)
    // and the matched-filter property JL rests on: columns are not
    // globally anti/correlated
    val corr = for (a <- 0 until 16; b <- a + 1 until 16) yield
      math.abs((0 until 64).map(i => cols(a)(i) * cols(b)(i)).sum)
    assert(corr.max < 64)
  }

  test("randomProject is deterministic and respects the id bound") {
    val vecs = (0L until 20L).map(i =>
      (i, Array.tabulate(8)(d => ((i * 13 + d * 7) % 5 - 2).toFloat)))
      .toDF("vec_id", "embedding")
    val a = Pca.randomProject(vecs, outDim = 4, outputIds = 10)
      .as[(Long, Long, Double)].collect().toSeq
    val b = Pca.randomProject(vecs, outDim = 4, outputIds = 10)
      .as[(Long, Long, Double)].collect().toSeq
    assert(a == b)
    assert(a.map(_._1).distinct == (0L until 10L))
    assert(a.size == 40)
  }

  test("embeddingAudit flags each corruption mode independently") {
    val good = Array.tabulate(4)(i => (i + 1).toFloat) // norm √30
    val rows = Seq(
      (1L, good),
      (2L, Array.fill(4)(0.0f)),                 // zero vector
      (3L, Array(1.0f, 2.0f)),                   // wrong dim
      (4L, Array(Float.NaN, 1.0f, 1.0f, 1.0f)),  // NaN poison
      (5L, Array(1e-9f, 0.0f, 0.0f, 0.0f)),      // effectively zero
      (6L, Array(Float.PositiveInfinity, 1.0f, 1.0f, 1.0f)), // +Inf
      (7L, Array(Float.NegativeInfinity, 1.0f, 1.0f, 1.0f))  // -Inf
    ).toDF("vec_id", "embedding")
    val got = Pca.embeddingAudit(rows, expectedDim = 4)
      .as[(Long, Long, Double, Boolean, Boolean, Boolean, Boolean,
        Boolean)]
      .collect().toSeq
    val m = got.map(r => r._1 -> r).toMap
    assert(m(1L) ==
      ((1L, 4L, math.sqrt(30.0), true, false, false, false, true)))
    assert(m(2L)._5 && !m(2L)._6 && !m(2L)._8) // zero, not nan, not ok
    assert(!m(3L)._4 && !m(3L)._8)             // dim 2 rejected
    assert(m(4L)._6 && !m(4L)._8)              // nan flagged
    assert(m(4L)._3.isNaN)                     // norm is honestly NaN
    assert(!m(4L)._5)                          // NaN ≠ zero vector
    assert(!m(4L)._7)                          // NaN alone is not Inf
    assert(m(5L)._5 && !m(5L)._8)              // sub-epsilon norm
    // the r7-ADVICE hole: Inf poison has has_nan=false, is_zero=false,
    // dim_ok=true — only has_inf blocks the release gate
    Seq(6L, 7L).foreach { id =>
      assert(m(id)._7 && !m(id)._8)            // inf flagged, not ok
      assert(!m(id)._6 && !m(id)._5 && m(id)._4)
      assert(m(id)._3.isPosInfinity)           // norm overflows to +Inf
    }
  }
}
