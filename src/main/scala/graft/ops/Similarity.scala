package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k (exact). Scale path: LSH via
  * random-hyperplane signs — candidates only within matching sign
  * buckets, turning the O(N·Q) cross product into bucket-local joins.
  *
  * Determinism: dot products fold the array sequentially in index
  * order (`aggregate` over `zip_with`), so results are bit-identical
  * across engines and across runs — no parallel-reduction reordering.
  */
object Similarity {

  /** Sequential-fold dot product of two double arrays (built-ins-only
    * baseline; kept for reference — the hot path uses the codegen'd
    * [[graft.functions.DotProduct]] expression, which is semantically
    * identical). */
  def dotFold(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Codegen'd dot product (native Catalyst expression). */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dot_product(a, b)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two double arrays (codegen'd). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column =
    transform(c, _.cast("double"))

  /** Brute-force exact cosine top-k: for each query vector, the k
    * nearest corpus vectors (self-match excluded). Queries are
    * broadcast — the corpus is never shuffled; at 100 TB the corpus
    * scan stays embarrassingly parallel and only (query × k) rows
    * survive the per-partition top-k before the final ranking. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"),
      asDouble(col(vecCol)).as("cv"))
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        cosine(col("qv"), col("cv")).as("cosine_sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine_sim").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "corpus_id", "cosine_sim")
      .orderBy("query_id", "rank")
  }

  /** Deterministic pseudo-random hyperplane component for (plane p,
    * dimension i): a hash mapped to [-1, 1). Reproducible across
    * sessions with zero stored state — the "model" is the hash seed. */
  private def planeComponent(p: Int, i: Column): Column =
    (hash(lit(p), i) % 1000000).cast("double") / 500000.0

  /** Sign-LSH bucket id from `numPlanes` random hyperplanes: bit p is
    * the sign of <v, plane_p>. Vectors in the same bucket are likely
    * cosine-close (probability rises with angle similarity). */
  def signBucket(vec: Column, numPlanes: Int = 12): Column = {
    val idx = sequence(lit(0), size(vec) - 1)
    val bits = (0 until numPlanes).map { p =>
      val proj = aggregate(
        zip_with(vec, idx, (x, i) => x * planeComponent(p, i)),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, shiftleft(lit(1L), p)).otherwise(0L)
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** LSH-bucketed approximate top-k: candidates restricted to equal
    * sign buckets (multi-probe across `tables` independent plane
    * sets), then exact cosine rank within candidates. Recall is
    * tunable via tables/planes; the join shuffles only
    * (bucket, table) keys — never the full cross product. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              numPlanes: Int = 10, tables: Int = 4,
              idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    import graft.functions.VectorExpressions.sign_lsh_buckets
    val c = corpus.select(col(idCol).as("corpus_id"),
      asDouble(col(vecCol)).as("cv"))
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qv"))
    // one codegen'd expression yields all table buckets per vector
    val cB = c.select(col("corpus_id"), col("cv"),
        posexplode(sign_lsh_buckets(col("cv"), numPlanes, tables)))
      .withColumnRenamed("pos", "tbl").withColumnRenamed("col", "bucket")
    val qB = q.select(col("query_id"), col("qv"),
        posexplode(sign_lsh_buckets(col("qv"), numPlanes, tables)))
      .withColumnRenamed("pos", "tbl").withColumnRenamed("col", "bucket")
    val cand = cB.join(qB, Seq("tbl", "bucket"))
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        cosine(col("qv"), col("cv")).as("cosine_sim"))
      .distinct()
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine_sim").desc, col("corpus_id"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "corpus_id", "cosine_sim")
      .orderBy("query_id", "rank")
  }

  /** Embedding-cosine near-dup dedup: vectors whose cosine similarity
    * to a lower-id vector is ≥ threshold are dropped; returns the
    * surviving canonical ids. Exact all-pairs here (oracle baseline);
    * at scale, feed candidates from [[signBucketTable]] buckets
    * instead of the cross join — same verify/survive logic. */
  def cosineDedup(vectors: DataFrame, threshold: Double,
                  idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame = {
    val v = vectors.select(col(idCol), asDouble(col(vecCol)).as("v"))
    val a = v.select(col(idCol).as("id_a"), col("v").as("va"))
    val b = v.select(col(idCol).as("id_b"), col("v").as("vb"))
    val dup = a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .filter(cosine(col("va"), col("vb")) >= threshold)
      .select(col("id_b").as(idCol)).distinct()
    v.select(col(idCol)).join(dup, Seq(idCol), "left_anti").orderBy(idCol)
  }

  /** Sign-LSH bucket for plane family `table` (independent families
    * via seed offset in the component hash). */
  def signBucketTable(vec: Column, numPlanes: Int, table: Int): Column = {
    val idx = sequence(lit(0), size(vec) - 1)
    val bits = (0 until numPlanes).map { p =>
      val proj = aggregate(
        zip_with(vec, idx,
          (x, i) => x * planeComponent(table * 1000 + p, i)),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, shiftleft(lit(1L), p)).otherwise(0L)
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }
}
