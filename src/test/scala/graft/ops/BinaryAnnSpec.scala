package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Sign-bit binary quantization, Hamming ANN, and per-group centroid
  * outlier scores. */
class BinaryAnnSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb =
    graft.io.Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("signPack sets exactly the positive dimensions' bits") {
    // 70 dims → two words; positives at dims 0, 5, 63 (word-0 sign
    // bit) and 64 (word-1 bit 0)
    val v = Array.tabulate(70)(i =>
      if (Set(0, 5, 63, 64)(i)) 1.0f else -1.0f)
    val got = Quantize.signPack(Seq((1L, v.toSeq)).toDF("vec_id", "embedding"))
      .select($"words").as[Seq[Long]].head()
    assert(got == Seq((1L | 32L) | Long.MinValue, 1L))
  }

  test("zero values are a 0 bit (strictly-positive test)") {
    val v = Array.fill(64)(0.0f)
    val got = Quantize.signPack(Seq((1L, v.toSeq)).toDF("vec_id", "embedding"))
      .select($"words").as[Seq[Long]].head()
    assert(got == Seq(0L))
  }

  test("hamming counts differing sign bits across words") {
    val df = Seq((Seq(0L, -1L), Seq(-1L, -1L))).toDF("a", "b")
    val got = df.select(Quantize.hamming($"a", $"b")).as[Long].head()
    assert(got == 64L) // word 0 differs in all 64 bits, word 1 in none
  }

  test("hammingTopK with full rerank ≡ brute-force cosine top-k") {
    val queries = emb.filter($"vec_id" < 10)
    val n = emb.count().toInt
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select("query_id", "rank", "corpus_id", "cosine_sim")
    val viaHamming = Similarity.hammingTopK(emb, queries, k = 5, rerank = n)
      .select("query_id", "rank", "corpus_id", "cosine_sim")
    assert(viaHamming.exceptAll(exact).count() == 0 &&
      exact.exceptAll(viaHamming).count() == 0)
  }

  test("hammingTopK recall vs exact: usable at default, rises with rerank") {
    // 64 sign bits are a coarse angular sketch (σ ≈ 4 bits on the
    // Hamming estimate), so the default top-50 prefilter on this
    // corpus recovers ~0.7 recall@5 — the operator's contract is the
    // rerank knob, not a fixed recall: widening the candidate cut
    // must strictly recover the misses
    val queries = emb.filter($"vec_id" < 20)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
    val atDefault = Similarity.recallAtK(exact,
      Similarity.hammingTopK(emb, queries, k = 5))
    val wide = Similarity.recallAtK(exact,
      Similarity.hammingTopK(emb, queries, k = 5, rerank = 150))
    assert(atDefault >= 0.6, s"recall@5 $atDefault below 0.6 at rerank=50")
    assert(wide >= 0.9, s"recall@5 $wide below 0.9 at rerank=150")
    assert(wide >= atDefault)
  }

  test("annRecallReport aggregates to recallAtK, covers hit-less queries") {
    val queries = emb.filter($"vec_id" < 20)
    val report = Similarity.annRecallReport(emb, queries, k = 5, rerank = 50)
    val rows = report.as[(Long, Long, Double)].collect()
    assert(rows.length == queries.count().toInt) // every query reported
    val exact = Similarity.bruteForceTopK(emb, queries, 5)
    val approx = Similarity.hammingTopK(emb, queries, 5, rerank = 50)
    val expected = Similarity.recallAtK(exact, approx)
    val mean = rows.map(_._3).sum / rows.length
    assert(math.abs(mean - expected) < 1e-9, s"$mean vs $expected")
  }

  test("centroidScores: outlier ranks first, aligned docs score 1") {
    def unit(sign: Double) =
      (0 until 64).map(i => if (i == 0) (sign * 1.0).toFloat else 0.0f)
    val docs = Seq((1L, "en"), (2L, "en"), (3L, "en"), (4L, "de"))
      .toDF("doc_id", "lang")
    val vecs = Seq((1L, unit(1)), (2L, unit(1)), (3L, unit(-1)),
      (4L, unit(1))).toDF("vec_id", "embedding")
    val got = Similarity.centroidScores(docs, vecs)
      .select($"doc_id", $"centroid_sim", $"lang_rank")
      .as[(Long, Double, Int)].collect().toSeq
    // en centroid = (1/3, 0, ...): docs 1,2 cosine 1, doc 3 cosine -1
    assert(got.find(_._1 == 3L).get._2 == -1.0)
    assert(got.find(_._1 == 3L).get._3 == 1) // strongest outlier
    assert(got.find(_._1 == 1L).get._2 == 1.0)
    assert(got.find(_._1 == 4L).get._2 == 1.0) // own-group centroid
  }

  test("centroidScores is partitioning-invariant (integer sums)") {
    val docs = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
    val a = Similarity.centroidScores(docs, emb)
    val b = Similarity.centroidScores(docs.repartition(7), emb.repartition(13))
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  // --- hardNegatives ------------------------------------------------

  test("hardNegatives excludes the near-dup band, keeps hard ones") {
    def mix(a: Double): Array[Float] = Array.tabulate(8)(d =>
      (if (d == 0) math.cos(a) else if (d == 1) math.sin(a) else 0.0)
        .toFloat)
    val corpus = Seq(
      (10L, mix(0.01)),  // cos ≈ 0.99995 to query: unlabeled positive
      (11L, mix(0.4)),   // cos ≈ 0.921: hard negative
      (12L, mix(0.9)),   // cos ≈ 0.622: easier negative
      (13L, mix(2.5))    // cos ≈ -0.80: easy negative
    ).toDF("vec_id", "embedding")
    val query = Seq((1L, mix(0.0))).toDF("vec_id", "embedding")
    val got = Similarity.hardNegatives(corpus, query, k = 2,
        ceiling = 0.95)
      .as[(Long, Int, Long, Double)].collect().toSeq
    // near-dup 10 excluded by the ceiling; hardest-first order
    assert(got.map(_._3) == Seq(11L, 12L))
    assert(got.map(_._2) == Seq(1, 2))
    assert(got.forall(_._4 < 0.95))
  }

  // --- knnClassify -------------------------------------------------

  test("knnClassify propagates the majority cluster label") {
    def v(axis: Int, eps: Double) =
      Array.tabulate(8)(d =>
        (if (d == axis) 1.0 else if (d == (axis + 1) % 8) eps else 0.0)
          .toFloat)
    // labeled seeds: 3 on axis 0 (label 7), 3 on axis 4 (label 2)
    val labeled = Seq(
      (10L, v(0, 0.01), 7), (11L, v(0, 0.02), 7), (12L, v(0, 0.03), 7),
      (20L, v(4, 0.01), 2), (21L, v(4, 0.02), 2), (22L, v(4, 0.03), 2)
    ).toDF("vec_id", "embedding", "label")
    val queries = Seq(
      (1L, v(0, 0.05), 0), (2L, v(4, 0.05), 0)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.knnClassify(labeled, queries, k = 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 7L, 3L), (2L, 2L, 3L)))
  }

  test("knnClassify breaks vote ties toward the smaller label") {
    def axis(d: Int) = Array.tabulate(8)(i =>
      (if (i == d) 1.0 else 0.0).toFloat)
    // two seeds, different labels, symmetric to the query -> 1 vote
    // each at k=2; winner must be the smaller label (3 < 5)
    val labeled = Seq(
      (10L, axis(0), 5), (11L, axis(2), 3)
    ).toDF("vec_id", "embedding", "label")
    val query = Seq((1L, Array.tabulate(8)(i =>
      (if (i == 0 || i == 2) 1.0 else 0.0).toFloat), 0))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.knnClassify(labeled, query, k = 2)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 3L, 1L)))
  }

  // --- labelErrors -------------------------------------------------

  test("labelErrors flags the planted mislabel, keeps clean points") {
    def v(axis: Int, eps: Double) =
      Array.tabulate(8)(d =>
        (if (d == axis) 1.0 else if (d == (axis + 1) % 8) eps else 0.0)
          .toFloat)
    // two tight clusters; vec 12 sits in the axis-0 cluster but
    // carries the axis-4 cluster's label (the planted error)
    val pool = Seq(
      (10L, v(0, 0.01), 7), (11L, v(0, 0.02), 7), (12L, v(0, 0.03), 2),
      (13L, v(0, 0.04), 7), (20L, v(4, 0.01), 2), (21L, v(4, 0.02), 2),
      (22L, v(4, 0.03), 2), (23L, v(4, 0.04), 2)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.labelErrors(pool, pool, k = 3)
      .as[(Long, Long, Long, Long, Long, Boolean)].collect().toSeq
    val byId = got.map(r => r._1 -> r).toMap
    assert(got.size == 8)
    // the planted error: own label 2, neighborhood votes 3×7, 0 own
    assert(byId(12L) == ((12L, 2L, 7L, 3L, 0L, true)))
    // its clean cluster-mates survive with unanimous own votes
    assert(byId(10L) == ((10L, 7L, 7L, 2L, 2L, false)))
    assert(!byId(20L)._6 && !byId(21L)._6 && !byId(23L)._6)
    // axis-4 points see only label-2 neighbors at k=3 (12 is far)
    assert(byId(21L)._4 == 3L && byId(21L)._5 == 3L)
  }
}
