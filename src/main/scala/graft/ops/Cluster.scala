package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deterministic spherical k-means and SemDeDup-style cell-scoped
  * embedding dedup.
  *
  * K-means is the canonical "model state is tiny, data is huge"
  * algorithm: the centroids (k × dim doubles) live on the driver and
  * fold into ONE literal codegen'd expression per iteration, so the
  * assignment step is a zero-shuffle narrow map over the corpus —
  * exactly how Spark MLlib's own KMeans treats its centers. The only
  * exchange per iteration is the (cluster, pos) partial-aggregated
  * centroid sum — k·dim rows out of any corpus size. At 100 TB:
  * iters × (1 corpus scan + one k·dim-row aggregate); the corpus is
  * never shuffled, never collected.
  *
  * Determinism (what makes the whole thing DuckDB-replayable):
  *   - seeds = the k lowest-id vectors (no RNG);
  *   - assignment = argmax cosine, ties to the lowest cluster id
  *     (`array_max` over (sim, -cluster) structs — lexicographic);
  *   - new centroid = fixed-point mean: components quantized to
  *     `floor(x·2^20 + 0.5)` longs, summed EXACTLY (integer sums are
  *     order-independent, double sums are not), divided back at the
  *     end — the same trick as [[Similarity.centroidScores]];
  *   - empty cluster keeps its previous centroid.
  *
  * [[semDedup]] is the SemDeDup recipe (Abbas et al. 2023,
  * arXiv:2303.09540): cluster the corpus, then near-dup dedup runs
  * WITHIN cells only — the all-pairs O(N²) of
  * [[Similarity.cosineDedup]] becomes Σ n_c², and the pair join is
  * cluster-co-located (one shuffle on the cell id). Reference scope:
  * the reference pipeline has no embedding ops at all
  * (`spark-job/apps/` covers relational ETL only) — this is part of
  * the training-data extension surface.
  */
object Cluster {

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** Fixed-point quantum for the centroid mean (2^20 — exact as a
    * double, and coarse enough that corpus-scale integer sums stay
    * far below 2^53). */
  private val Q = 1048576.0

  /** Assignment under literal centroids: argmax cosine, ties to the
    * lowest cluster id. Centroids are a driver-side constant folded
    * into the codegen'd [[graft.functions.ArgmaxCosine]] loop — no
    * join, no shuffle, and expression size flat in k (the previous
    * `array_max` over k struct columns degraded 5× by k=80;
    * ProfileCluster10x). Arithmetic and tie order are identical, so
    * the DuckDB oracles are unchanged. */
  private def withAssignment(v: DataFrame,
                             cents: Seq[(Long, Seq[Double])]): DataFrame = {
    val sorted = cents.sortBy(_._1)
    val best = graft.functions.VectorExpressions.argmax_cosine(
      col("e"), sorted.map(_._2.toArray).toArray)
    v.withColumn("__best", best)
      .withColumn("centroid_sim", col("__best").getItem(0))
      .withColumn("cluster", element_at(typedLit(sorted.map(_._1)),
        col("__best").getItem(1).cast("int") + lit(1)))
      .drop("__best")
  }

  /** k-center greedy CORESET selection — diversity-maximizing data
    * selection (the coverage objective behind coreset/active-learning
    * selection, Sener & Savarese 2018): start from the lowest-id
    * vector, then repeatedly take the point FARTHEST (cosine
    * distance) from everything selected so far, ties → lowest id.
    * The selected set is a 2-approximation of the optimal k-center
    * cover — the subset that "spans" the embedding space, where
    * [[balancedSample]] balances counts and [[semDedup]] removes
    * redundancy.
    *
    * Same discipline as [[kmeansFit]]: the selected set (≤ k·dim
    * doubles) is driver-held model state folded into literal
    * codegen'd expressions; each round is ONE narrow corpus scan +
    * a TakeOrdered(1) — k scans total, corpus never shuffled, never
    * collected. Determinism: the min-over-selected is an exact min
    * of deterministic cosine folds (no NaN, order-free), the argmax
    * tie-breaks by id, and the seed is fixed — so all k picks replay
    * in SQL as unrolled CTEs. Output: (sel_rank, id, min_dist) with
    * min_dist = the max-min distance at pick time (0 for the seed) —
    * the decreasing min_dist curve is the coverage-radius diagnostic
    * (pick k where it flattens). */
  def coresetSelect(vectors: DataFrame, k: Int,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, "k must be positive")
    val spark = vectors.sparkSession
    import spark.implicits._
    val v = vectors.select(col(idCol).cast("long").as("id"),
      asDouble(col(vecCol)).as("e"))
    // bounded guard: limit(k) stops the scan after k rows — a full
    // count() here would add a (k+1)-th corpus pass and break the
    // documented "k scans total" contract
    require(v.limit(k).count() == k, s"corpus smaller than k=$k")
    val seed = v.orderBy("id").limit(1).as[(Long, Seq[Double])].head()
    var selected = Vector((seed._1, seed._2, 0.0))
    for (_ <- 2 to k) {
      val dists = selected.map { case (_, s, _) =>
        lit(1.0) - Similarity.cosine(col("e"), typedLit(s)) }
      val minD = dists.reduce(least(_, _))
      val pick = v.filter(!col("id").isin(selected.map(_._1): _*))
        .select(col("id"), col("e"), minD.as("d"))
        .orderBy(col("d").desc, col("id")).limit(1)
        .as[(Long, Seq[Double], Double)].head()
      selected = selected :+ ((pick._1, pick._2, pick._3))
    }
    selected.zipWithIndex
      .map { case ((id, _, d), i) => (i + 1L, id, d) }
      .toDF("sel_rank", idCol, "min_dist")
  }

  /** The fitted centroids alone — (cluster id, centroid) sorted by
    * cluster id, the tiny driver-side model state. Public so a
    * consumer can reuse one fit across several assignment passes
    * ([[Similarity.ivfKmeansTopK]] quantizes corpus AND queries with
    * the same centroids). */
  def kmeansFit(vectors: DataFrame, k: Int, iters: Int,
                idCol: String = "vec_id",
                vecCol: String = "embedding"): Seq[(Long, Seq[Double])] = {
    require(k > 0 && iters >= 0, "need k>0, iters>=0")
    val v = vectors.select(col(idCol), asDouble(col(vecCol)).as("e"))
    // seeds: the k lowest-id vectors — deterministic, replayable
    var cents: Seq[(Long, Seq[Double])] =
      v.orderBy(col(idCol)).limit(k).collect().toSeq.map(r =>
        (r.getLong(0), r.getSeq[Double](1)))
    for (_ <- 1 to iters) {
      val means = withAssignment(v, cents)
        .select(col("cluster"), posexplode(col("e")))
        .select(col("cluster"), col("pos"),
          floor(col("col") * lit(Q) + lit(0.5)).cast(LongType).as("qv"))
        .groupBy("cluster", "pos")
        .agg(sum("qv").as("sq"), count(lit(1)).as("n"))
        .withColumn("m",
          col("sq").cast("double") / lit(Q) / col("n").cast("double"))
        .groupBy("cluster")
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("m")))),
          _.getField("m")).as("c"))
        .collect().map { r =>
          // a null cluster means ArgmaxCosine hit a vector whose
          // length differs from the centroids' — fail fast instead
          // of letting getLong unbox null to 0L and silently corrupt
          // cluster 0's centroid
          require(!r.isNullAt(0), "kmeans: embedding dimension " +
            "differs from the centroid dimension")
          r.getLong(0) -> r.getSeq[Double](1)
        }.toMap
      cents = cents.map { case (cl, old) => (cl, means.getOrElse(cl, old)) }
    }
    cents.sortBy(_._1)
  }

  /** K-means assignment with the vectors still attached —
    * (id, e, cluster, centroid_sim). [[kmeans]] and [[semDedup]]
    * share this. */
  def kmeansAssign(vectors: DataFrame, k: Int, iters: Int,
                   idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame =
    assignWith(vectors, kmeansFit(vectors, k, iters, idCol, vecCol),
      idCol, vecCol)

  /** Assignment under externally fitted centroids (one fit, many
    * assignment passes). */
  private[ops] def assignWith(vectors: DataFrame,
                              cents: Seq[(Long, Seq[Double])],
                              idCol: String = "vec_id",
                              vecCol: String = "embedding"): DataFrame =
    withAssignment(
      vectors.select(col(idCol), asDouble(col(vecCol)).as("e")), cents)

  /** Spherical k-means: (id, cluster, centroid_sim), ordered by id.
    * `cluster` is the seed vector's id. */
  def kmeans(vectors: DataFrame, k: Int, iters: Int,
             idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame =
    kmeansAssign(vectors, k, iters, idCol, vecCol)
      .select(col(idCol), col("cluster"), col("centroid_sim"))
      .orderBy(idCol)

  /** Cluster-balanced corpus sampling: k-means cells become the
    * strata of [[TextOps.temperatureSample]]'s α=0.5 mix — sampling
    * proportional to √cell-size flattens semantic-topic imbalance
    * the way per-language temperature sampling flattens language
    * imbalance (the SemDeDup-adjacent "semantic diversity" recipe).
    * One id-only join attaches cells to docs; the sampling adds one
    * stratum shuffle. Output (cluster, id, sample_rank). */
  def balancedSample(docs: DataFrame, embeddings: DataFrame,
                     budget: Int, k: Int, iters: Int,
                     idCol: String = "doc_id",
                     textCol: String = "text",
                     vecCol: String = "embedding"): DataFrame = {
    val cells = kmeansAssign(embeddings, k, iters, idCol = "vec_id",
        vecCol = vecCol)
      .select(col("vec_id").as(idCol), col("cluster"))
    TextOps.temperatureSample(docs.join(cells, idCol), budget,
      stratumCol = "cluster", textCol = textCol, idCol = idCol)
  }

  /** SemDeDup: k-means cells, then [[Similarity.cosineDedup]]'s drop
    * rule (cos ≥ threshold against a lower-id vector → dropped)
    * restricted to same-cell pairs. Survivors (id, cluster), ordered
    * by id. The pair join shuffles on the cell id only — Σ n_c²
    * candidate pairs instead of N². */
  def semDedup(vectors: DataFrame, threshold: Double,
               k: Int, iters: Int,
               idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame = {
    // materialized once: both pair-join sides AND the survivor
    // anti-join consume the assignment — un-checkpointed, the argmax
    // assignment scan is planned three times (guide §2.4)
    val assigned = kmeansAssign(vectors, k, iters, idCol, vecCol)
      .localCheckpoint(true)
    val a = assigned.select(col("cluster"), col(idCol).as("id_a"),
      col("e").as("va"))
    val b = assigned.select(col("cluster"), col(idCol).as("id_b"),
      col("e").as("vb"))
    val dup = a.join(b, "cluster")
      .filter(col("id_a") < col("id_b"))
      .filter(Similarity.cosine(col("va"), col("vb")) >= threshold)
      .select(col("id_b").as(idCol)).distinct()
    assigned.select(col(idCol), col("cluster"))
      .join(dup, Seq(idCol), "left_anti")
      .orderBy(idCol)
  }
}
