package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deterministic PCA via power iteration — the dimensionality-
  * reduction / whitening stage of an embedding pipeline, as a
  * first-class oracle-replayable operator.
  *
  * Same "tiny model state, huge data" discipline as
  * [[Cluster.kmeans]]: the candidate direction w (dim doubles) lives
  * on the driver and folds into a literal codegen'd expression; each
  * Lloyd-like refinement w ← normalize(Σ_r (x̂_r·w) x̂_r) is ONE
  * narrow corpus scan plus a dim-row partial aggregate. The corpus
  * is never shuffled; at 100 TB the cost is iters × scan.
  *
  * Determinism (what makes it hash-exact vs DuckDB):
  *   - the per-dimension mean and the per-row accumulation
  *     (x̂·w)·x̂_i are quantized to `floor(v·2^20 + 0.5)` longs before
  *     summing — integer sums are order-independent, so no
  *     parallel-reduction reordering can change a bit;
  *   - dot products fold sequentially in index order (the codegen'd
  *     [[graft.functions.DotProduct]] ≡ DuckDB `list_dot_product`);
  *   - w₀ = the uniform direction (1/8 per component for dim 64 —
  *     exactly representable; no RNG) fixes the sign of the
  *     converged direction — both engines run the identical
  *     arithmetic, so no sign convention is needed. A corpus whose
  *     every principal direction is orthogonal to w₀ would zero the
  *     first step; that degenerate case THROWS rather than
  *     propagating NaN.
  */
object Pca {

  /** Fixed-point quantum (2^20) — see [[Cluster]]. */
  private val Q = 1048576.0

  /** Embedding VALIDITY audit — the first QA gate before any vector
    * lands in an index: per vector, its dimensionality, L2 norm
    * (the shared sequential-fold, oracle-replayable), and the three
    * corruption flags that actually occur in production embedding
    * pipelines — wrong dimension (a model/version mix-up), an
    * (effectively) all-zero vector (a failed encode defaulted), NaN
    * contamination, and ±Inf contamination (float overflow typically
    * yields Inf BEFORE NaN, and isnan(Inf) is false — without its
    * own flag an Inf-poisoned vector would pass every other gate;
    * r7 ADVICE). `ok` is the release gate. One narrow codegen'd
    * scan, no shuffle — at 100 TB it fuses into the read. Output:
    * (id, dim, l2_norm, dim_ok, is_zero, has_nan, has_inf, ok). */
  def embeddingAudit(vectors: DataFrame, expectedDim: Int,
                     zeroEps: Double = 1e-6,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    require(expectedDim > 0, "expectedDim must be positive")
    val e = transform(col(vecCol), _.cast("double"))
    val n = Similarity.norm(e)
    val hasNan = exists(e, x => isnan(x))
    // abs(NaN) is NaN and NaN === Inf is false, so the two flags
    // stay independent (a vector can trip both)
    val hasInf = exists(e,
      x => abs(x) === lit(Double.PositiveInfinity))
    // norm(NaN-poisoned) is NaN: comparisons are false, so the zero
    // and dim flags stay meaningful and ok routes through has_nan;
    // norm(Inf-poisoned) is +Inf → is_zero false, ok routes through
    // has_inf
    vectors.select(col(idCol),
        size(col(vecCol)).cast(LongType).as("dim"),
        n.as("l2_norm"),
        (size(col(vecCol)) === expectedDim).as("dim_ok"),
        (n < lit(zeroEps)).as("is_zero"),
        hasNan.as("has_nan"),
        hasInf.as("has_inf"))
      .withColumn("ok",
        col("dim_ok") && !col("is_zero") && !col("has_nan") &&
          !col("has_inf"))
      .orderBy(idCol)
  }

  /** Per-dimension z-score standardization — the feature-scaling
    * stage that usually precedes clustering/PCA. Moments use the
    * same fixed-point discipline as [[powerIteration]]: per-dimension
    * Σx and Σx² quantized to 2^20 longs (order-independent integer
    * sums), mean/E[x²] divided back at the end, variance clamped at
    * 0 (quantization can push a constant dimension's m2−mean²
    * marginally negative). One corpus scan + a dim-row aggregate
    * broadcast back; output exploded to (id, pos, z) scalar rows —
    * the element-wise-replayable shape (q75 discipline). `outputIds`
    * bounds the EMITTED rows; the statistics always cover the whole
    * corpus. A zero-variance dimension standardizes to z = 0
    * (explicit CASE — a constant dimension carries no signal, and
    * ANSI mode would otherwise turn the 0/0 into a runtime error). */
  def standardize(vectors: DataFrame, outputIds: Long = Long.MaxValue,
                  idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame = {
    val v = vectors.select(col(idCol),
      transform(col(vecCol), _.cast("double")).as("e"))
    val stats = v
      .select(posexplode(col("e")).as(Seq("pos", "x")))
      .select(col("pos"),
        floor(col("x") * lit(Q) + lit(0.5)).cast(LongType).as("q1"),
        floor(col("x") * col("x") * lit(Q) + lit(0.5))
          .cast(LongType).as("q2"))
      .groupBy("pos")
      .agg(sum("q1").as("s1"), sum("q2").as("s2"),
        count(lit(1)).as("n"))
      .withColumn("mean",
        col("s1").cast("double") / lit(Q) / col("n").cast("double"))
      .withColumn("m2",
        col("s2").cast("double") / lit(Q) / col("n").cast("double"))
      .withColumn("std",
        sqrt(greatest(col("m2") - col("mean") * col("mean"), lit(0.0))))
      .select("pos", "mean", "std")
    v.filter(col(idCol) < lit(outputIds))
      .select(col(idCol), posexplode(col("e")).as(Seq("pos", "x")))
      .join(broadcast(stats), "pos")
      .select(col(idCol), col("pos").cast(LongType).as("pos"),
        when(col("std") === lit(0.0), lit(0.0))
          .otherwise((col("x") - col("mean")) / col("std")).as("z"))
      .orderBy(idCol, "pos")
  }

  /** Projection of every (mean-centered) vector onto the dominant
    * principal direction after `iters` power iterations:
    * (id, pc1_proj), ordered by id. */
  def powerIteration(vectors: DataFrame, iters: Int = 3,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    require(iters >= 1, "need iters>=1")
    val v = vectors.select(col(idCol),
      transform(col(vecCol), _.cast("double")).as("e"))
    // fixed-point per-dimension mean (one aggregate job)
    val mean: Seq[Double] = v
      .select(posexplode(col("e")).as(Seq("pos", "x")))
      .select(col("pos"),
        floor(col("x") * lit(Q) + lit(0.5)).cast(LongType).as("qv"))
      .groupBy("pos").agg(sum("qv").as("sq"), count(lit(1)).as("n"))
      .collect().sortBy(_.getInt(0))
      .map(r => r.getLong(1).toDouble / Q / r.getLong(2).toDouble).toSeq
    val centered = v.select(col(idCol),
      zip_with(col("e"), typedLit(mean), (a, b) => a - b).as("e"))
    var w: Seq[Double] = Seq.fill(mean.length)(1.0 / 8.0)
    for (_ <- 1 to iters) {
      val s: Seq[Double] = centered
        .select(Similarity.dot(col("e"), typedLit(w)).as("p"), col("e"))
        .select(col("p"), posexplode(col("e")).as(Seq("pos", "x")))
        .select(col("pos"),
          floor(col("p") * col("x") * lit(Q) + lit(0.5))
            .cast(LongType).as("qv"))
        .groupBy("pos").agg(sum("qv").as("sq"))
        .collect().sortBy(_.getInt(0))
        .map(_.getLong(1).toDouble / Q).toSeq
      // same sequential-fold norm the oracle's list_dot_product runs
      val nrm = math.sqrt(s.foldLeft(0.0)((a, x) => a + x * x))
      require(nrm > 0.0,
        "power iteration collapsed: corpus variance is orthogonal " +
          "to the current direction")
      w = s.map(_ / nrm)
    }
    centered.select(col(idCol),
        Similarity.dot(col("e"), typedLit(w)).as("pc1_proj"))
      .orderBy(idCol)
  }

  /** Per-dimension distribution drift between two embedding snapshots
    * (e.g. last month's corpus vs this month's, or two ingest
    * sources) — the monitoring artifact that catches a silently
    * retrained/buggy upstream embedder before it poisons dedup and
    * retrieval. For each dimension: both snapshots' mean and
    * variance (fixed-point moments — the [[standardize]] discipline,
    * so order-independent and hash-exact), the absolute mean shift,
    * and the variance ratio (0 where the baseline dimension is
    * constant — flagged, not divided). Two scans (one per snapshot),
    * each one dim-row aggregate; no joins against the corpora. */
  def driftReport(a: DataFrame, b: DataFrame,
                  idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame = {
    def moments(df: DataFrame, m: String, v: String): DataFrame =
      df.select(transform(col(vecCol), _.cast("double")).as("e"))
        .select(posexplode(col("e")).as(Seq("pos", "x")))
        .select(col("pos"),
          floor(col("x") * lit(Q) + lit(0.5)).cast(LongType).as("q1"),
          floor(col("x") * col("x") * lit(Q) + lit(0.5))
            .cast(LongType).as("q2"))
        .groupBy("pos")
        .agg(sum("q1").as("s1"), sum("q2").as("s2"),
          count(lit(1)).as("n"))
        .select(col("pos"),
          (col("s1").cast("double") / lit(Q) / col("n").cast("double"))
            .as(m),
          greatest(
            col("s2").cast("double") / lit(Q) / col("n").cast("double")
              - (col("s1").cast("double") / lit(Q)
                 / col("n").cast("double"))
              * (col("s1").cast("double") / lit(Q)
                 / col("n").cast("double")),
            lit(0.0)).as(v))
    // FULL OUTER on pos: a dimensionality change in the upstream
    // embedder — the most blatant drift this monitor exists to catch —
    // must surface as rows with a null side (mean/var/shift/ratio all
    // null there), not silently drop the unpaired dimensions
    val ma = moments(a, "mean_a", "var_a")
    val mb = moments(b, "mean_b", "var_b")
    ma.join(mb, Seq("pos"), "full_outer")
      .select(col("pos").cast(LongType).as("pos"),
        col("mean_a"), col("mean_b"),
        abs(col("mean_b") - col("mean_a")).as("mean_shift"),
        col("var_a"), col("var_b"),
        when(col("var_a") === lit(0.0), lit(0.0))
          .otherwise(col("var_b") / col("var_a")).as("var_ratio"))
      .orderBy("pos")
  }

  /** Johnson–Lindenstrauss random projection with a DETERMINISTIC
    * sign matrix (Achlioptas 2003: ±1 entries preserve pairwise
    * distances in expectation like Gaussian ones) — the cheap
    * dimensionality-reduction stage when even one PCA pass over the
    * corpus is too expensive. sign(i,j) = 1−2·(((i·2654435761 +
    * j·40503) mod 9973) mod 2): pure integer arithmetic both engines
    * replay, no RNG, no stored matrix — the "matrix" is an
    * expression. The odd-prime inner modulus is what mixes: a direct
    * mod 2 of the linear form would collapse to the (i+j) parity
    * checkerboard (both multipliers are odd), making every output
    * dimension a copy of the first up to sign.
    *
    * proj_j = (Σ_i sign(i,j)·q_i) / 2^20 / √outDim with q_i =
    * floor(x_i·2^20 + 0.5): the per-element quantization makes every
    * sum an INTEGER sum (order-independent), and `outDim` is required
    * to be a perfect square so √outDim is an exact integer and the
    * final scale is one exact IEEE division. The whole operator is a single narrow
    * projection — zero shuffles, zero joins; at 100 TB it
    * whole-stage-codegens into the scan. Output exploded to
    * (id, j, value) scalar rows (q75/q93 discipline); `outputIds`
    * bounds emitted rows only. */
  def randomProject(vectors: DataFrame, outDim: Int = 16,
                    outputIds: Long = Long.MaxValue,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    val root = math.sqrt(outDim.toDouble)
    require(outDim > 0 && root == math.rint(root) &&
      (root * root == outDim.toDouble),
      "outDim must be a perfect square so the JL scale is exact")
    val q = transform(col(vecCol),
      x => floor(x.cast("double") * lit(Q) + lit(0.5)).cast(LongType))
    val proj = transform(sequence(lit(0), lit(outDim - 1)), j =>
      aggregate(
        zip_with(q, sequence(lit(0), size(col(vecCol)) - 1),
          (qi, i) => qi * (lit(1L) - lit(2L) *
            pmod(pmod(i.cast(LongType) * lit(2654435761L) +
              j.cast(LongType) * lit(40503L), lit(9973L)), lit(2L)))),
        lit(0L), (acc, t) => acc + t))
    vectors.filter(col(idCol) < lit(outputIds))
      .select(col(idCol), posexplode(proj).as(Seq("j", "s")))
      .select(col(idCol), col("j").cast(LongType).as("j"),
        (col("s").cast("double") / lit(Q) / lit(root)).as("value"))
      .orderBy(idCol, "j")
  }
}
