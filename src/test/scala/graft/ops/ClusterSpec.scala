package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClusterSpec extends SparkSpec {
  import spark.implicits._

  // three tight groups around orthogonal axes, ids interleaved so
  // seed ids (0..2) land one per group
  private def axisVec(axis: Int, jitter: Double): Seq[Double] =
    (0 until 64).map(i =>
      if (i == axis) 1.0 else if (i == (axis + 7) % 64) jitter else 0.0)

  private lazy val vecs = {
    val rows = (0 until 30).map { i =>
      val g = i % 3
      (i.toLong, axisVec(g * 3, 0.05 * ((i / 3) % 4)).map(_.toFloat))
    }
    rows.toDF("vec_id", "embedding")
  }

  test("kmeans recovers the planted groups and is deterministic") {
    val out = Cluster.kmeans(vecs, k = 3, iters = 3).collect()
    assert(out.length == 30)
    // same planted group -> same cluster
    val byCluster = out.groupBy(_.getLong(1)).view.mapValues(
      _.map(_.getLong(0) % 3).toSet).toMap
    assert(byCluster.size == 3)
    assert(byCluster.values.forall(_.size == 1))
    // centroid_sim is a valid cosine and near 1 for tight groups
    assert(out.forall(r => r.getDouble(2) > 0.9 && r.getDouble(2) <= 1.0))
    // bit-identical on rerun (fixed seeds, fixed-point means)
    val again = Cluster.kmeans(vecs, k = 3, iters = 3).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("kmeans iters=0 assigns to the raw seed vectors") {
    val out = Cluster.kmeans(vecs, k = 3, iters = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // seeds 0,1,2 each score cosine 1 against themselves
    assert(out(0L) == 0L && out(1L) == 1L && out(2L) == 2L)
  }

  test("semDedup drops scaled near-dups within cells, keeps min id") {
    val withDups = vecs.unionByName(
      vecs.filter($"vec_id" % 5 === 0)
        .select(($"vec_id" + 1000).as("vec_id"),
          transform($"embedding", x => x * lit(1.25f)).as("embedding")))
    val surv = Cluster.semDedup(withDups, threshold = 0.999,
      k = 3, iters = 2).collect()
    val ids = surv.map(_.getLong(0)).toSet
    // the vector pattern repeats every 12 ids: 0..11 are the distinct
    // class minima and survive; 12..29 and every injected copy are
    // exact dups of a lower id in the same cell and drop
    assert(ids == (0L until 12L).toSet)
  }

  test("semDedup at an unreachable threshold keeps everything") {
    val surv = Cluster.semDedup(vecs, threshold = 1.5, k = 3, iters = 1)
    assert(surv.count() == 30)
  }

  test("ArgmaxCosine eval: ties keep lowest index, dim mismatch nulls") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import graft.functions.ArgmaxCosine
    def arr(xs: Double*) = new GenericArrayData(xs.toArray)
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val e = Literal.create(Seq(1.0, 0.0),
      ArrayType(DoubleType)) // placeholder child
    // two identical centroids -> tie -> index 0
    val tie = ArgmaxCosine(e, Array(Array(1.0, 0.0), Array(1.0, 0.0)))
    val out = tie.nullSafeEval(arr(2.0, 0.0)).asInstanceOf[ArrayData]
    assert(out.getDouble(1) == 0.0 && out.getDouble(0) == 1.0)
    // clear winner at index 1 despite ascending order
    val win = ArgmaxCosine(e, Array(Array(0.0, 1.0), Array(1.0, 0.0)))
    val out2 = win.nullSafeEval(arr(3.0, 0.1)).asInstanceOf[ArrayData]
    assert(out2.getDouble(1) == 1.0)
    // centroid dim mismatch -> null
    val bad = ArgmaxCosine(e, Array(Array(1.0, 0.0, 0.0)))
    assert(bad.nullSafeEval(arr(1.0, 0.0)) == null)
    // zero-norm vector: every sim NaN -> lowest index, NaN sim
    // (matches array_max and the oracle's NaN-sorts-first DESC order)
    val zn = ArgmaxCosine(e, Array(Array(1.0, 0.0), Array(0.0, 1.0)))
    val out3 = zn.nullSafeEval(arr(0.0, 0.0)).asInstanceOf[ArrayData]
    assert(out3.getDouble(1) == 0.0 && out3.getDouble(0).isNaN)
  }

  test("coresetSelect: one pick per orthogonal cluster, then the " +
       "closest-tie; min_dist non-increasing") {
    def v(axis: Int, eps: Double) = (0 until 8).map(d =>
      if (d == axis) 1.0f else if (d == (axis + 1) % 8) eps.toFloat
      else 0.0f)
    // four exactly-orthogonal axis pairs (support sets disjoint)
    val pool = Seq(
      (10L, v(0, 0.01)), (11L, v(0, 0.02)),
      (20L, v(2, 0.01)), (21L, v(2, 0.02)),
      (30L, v(4, 0.01)), (31L, v(4, 0.02)),
      (40L, v(6, 0.01)), (41L, v(6, 0.02))
    ).toDF("vec_id", "embedding")
    val got = Cluster.coresetSelect(pool, k = 5)
      .as[(Long, Long, Double)].collect().toSeq
    // seed = lowest id; rounds 2-4 take one representative per
    // remaining axis at distance exactly 1.0, ties -> lowest id;
    // round 5 falls into the near-dup tier
    assert(got.map(r => (r._1, r._2)) ==
      Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L), (5L, 11L)))
    assert(got.map(_._3).take(4) == Seq(0.0, 1.0, 1.0, 1.0))
    assert(got(4)._3 > 0.0 && got(4)._3 < 0.001)
    // the coverage radius never increases after the seed
    assert(got.drop(1).map(_._3).sliding(2).forall(p => p(1) <= p(0)))
    intercept[IllegalArgumentException] {
      Cluster.coresetSelect(pool, k = 9)
    }
  }

  test("balancedSample: sqrt-proportional per-cell targets, md5 order") {
    val docs = (0 until 30).map(i =>
      (i.toLong, s"doc body number $i with words")).toDF("doc_id", "text")
    val out = Cluster.balancedSample(docs, vecs, budget = 9,
      k = 3, iters = 2).collect()
    // 3 planted cells of 10 docs each -> equal sqrt weights -> 3 each
    val perCell = out.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(perCell.size == 3 && perCell.values.forall(_ == 3))
    // ranks are 1..n per cell
    out.groupBy(_.getLong(0)).values.foreach { rs =>
      assert(rs.map(_.getLong(2)).sorted.toSeq == (1L to rs.length).toSeq)
    }
  }
}
