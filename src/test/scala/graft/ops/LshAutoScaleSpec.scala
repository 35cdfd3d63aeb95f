package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Auto-scaled LSH dedup parameters: planes grow with the corpus so
  * the expected bucket population stays near the target across
  * 10³–10⁵ vectors, tables keep the analytic miss bound, and the
  * LSH-fed dedup still equals exact all-pairs dedup (the q56 oracle's
  * claim) with derived parameters. */
class LshAutoScaleSpec extends SparkSpec {

  /** Deterministic near-uniform corpus: components hash-derived in
    * [-1, 1] — no RNG, reproducible on any run. */
  private def synthetic(n: Long, dim: Int): DataFrame =
    spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(dim)),
        d => (pmod(xxhash64(col("id"), d), lit(2001L)) - 1000L)
          .cast("double") / 500.0).as("embedding"))

  test("planes scale with N; tables honor the miss bound") {
    val (p1, t1) = Similarity.lshParamsFor(1000L, 0.9)
    val (p2, t2) = Similarity.lshParamsFor(10000L, 0.9)
    val (p3, t3) = Similarity.lshParamsFor(100000L, 0.9)
    assert(p1 < p2 && p2 < p3, s"planes must grow: $p1, $p2, $p3")
    // analytic miss bound at the threshold cosine holds for each pair,
    // INCLUDING huge N where the table budget binds and planes must
    // back off (a silent table cap would quietly void the bound)
    val (p4, t4) = Similarity.lshParamsFor(100000000L, 0.9)
    for ((p, t) <- Seq((p1, t1), (p2, t2), (p3, t3), (p4, t4))) {
      val pPlane = 1.0 - math.acos(0.9) / math.Pi
      assert(t <= 64, s"table budget exceeded: $t")
      assert(math.pow(1.0 - math.pow(pPlane, p), t) <= 1e-4,
        s"miss bound violated at planes=$p tables=$t")
    }
  }

  test("expected bucket population stays near the target across 1e3-1e5") {
    import graft.functions.VectorExpressions.sign_lsh_buckets
    for (n <- Seq(1000L, 10000L, 100000L)) {
      val (planes, tables) = Similarity.lshParamsFor(n, 0.9)
      val corpus = synthetic(n, 8)
        .select(col("vec_id"),
          posexplode(sign_lsh_buckets(col("embedding"), planes, tables)))
      val stats = corpus.groupBy("pos", "col").count()
        .agg(avg("count").as("mean"), max("count").as("max")).head()
      val mean = stats.getDouble(0)
      // mean bucket ≈ N/2^planes ≤ target by construction; generous
      // slack for the non-ideal split of a hash-derived corpus
      assert(mean <= 4 * 256,
        s"n=$n planes=$planes mean bucket $mean exceeds bound")
      // buckets must actually subdivide the corpus, not degenerate
      assert(mean < n / 2.0, s"n=$n: buckets failed to split")
    }
  }

  test("auto-parameterized LSH dedup ≡ exact all-pairs dedup (q56 corpus)") {
    val base = graft.io.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("embedding"))
    val dups = base.filter(col("vec_id") % 5 === 0)
      .select((col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"), x => x * lit(1.25)).as("embedding"))
    val corpus = base.unionByName(dups)
    val auto = Similarity.cosineDedupLshAuto(corpus, 0.9)
      .collect().map(_.getLong(0)).toSeq
    val exact = Similarity.cosineDedup(corpus, 0.9)
      .collect().map(_.getLong(0)).toSeq
    assert(auto == exact)
    assert(auto.size < corpus.count(), "injected dups must be dropped")
  }
}
