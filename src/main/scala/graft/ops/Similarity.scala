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

  /** Exact-rank tail shared by every top-k variant: rank candidates
    * per query by (cosine desc, id) and keep k. */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine_sim").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "corpus_id", "cosine_sim")
      .orderBy("query_id", "rank")
  }

  /** Cosine from a precomputed-norm pair: each vector's norm is
    * computed ONCE in its projection (sqrt(dot(x,x)) — the identical
    * IEEE arithmetic `cosine` would run) and rides the candidate join
    * as one extra double, instead of being re-derived per candidate
    * pair — the naive cosine costs 3 dot products per pair, this one
    * 1. Bit-identical results (same ops, same order, same inputs). */
  private def cosinePre(a: Column, na: Column,
                        b: Column, nb: Column): Column =
    dot(a, b) / (na * nb)

  /** Re-attach vectors to id-only candidate pairs and score them. */
  private def scoreCandidates(candIds: DataFrame, q: DataFrame,
                              c: DataFrame): DataFrame =
    candIds.join(q, "query_id").join(c, "corpus_id")
      .select(col("query_id"), col("corpus_id"),
        cosinePre(col("qv"), col("qn"), col("cv"), col("cn"))
          .as("cosine_sim"))

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
    rankTopK(c.crossJoin(broadcast(q))
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        cosine(col("qv"), col("cv")).as("cosine_sim")), k)
  }

  /** LSH-bucketed approximate top-k: candidates restricted to equal
    * sign buckets (multi-probe across `tables` independent plane
    * sets), then exact cosine rank within candidates. Recall is
    * tunable via tables/planes/probes; the join shuffles only
    * (bucket, table) keys — never the full cross product.
    *
    * `probes` > 1 turns on query-directed multi-probe (Lv et al.
    * 2007): each query additionally probes, per table, the
    * `probes − 1` buckets reached by flipping its lowest-|margin|
    * plane signs. The CORPUS side still stores exactly one bucket
    * per table — multi-probe buys the recall of ~tables×probes
    * tables at the index size and corpus-scan cost of `tables`,
    * which is the right trade at 100 TB (the corpus index dwarfs the
    * query stream; extra probe rows are query-side only). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              numPlanes: Int = 10, tables: Int = 4, probes: Int = 1,
              idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    import graft.functions.VectorExpressions.{sign_lsh_buckets, sign_lsh_probes}
    // norms computed ONCE alongside the vector projection so
    // scoreCandidates' cosinePre can resolve qn/cn (1 dot per pair
    // instead of 3)
    val c = corpus.select(col(idCol).as("corpus_id"),
      asDouble(col(vecCol)).as("cv")).withColumn("cn", norm(col("cv")))
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qv")).withColumn("qn", norm(col("qv")))
    // one codegen'd expression yields all table buckets per vector;
    // the bucket join carries IDS ONLY — shipping vectors through it
    // would shuffle tables× copies of every embedding. Vectors are
    // re-attached once per surviving distinct candidate pair.
    val cB = c.select(col("corpus_id"),
        posexplode(sign_lsh_buckets(col("cv"), numPlanes, tables)))
      .withColumnRenamed("pos", "tbl").withColumnRenamed("col", "bucket")
    // query side: probes buckets per table, table id = pos / probes
    val qB = q.select(col("query_id"),
        posexplode(sign_lsh_probes(col("qv"), numPlanes, tables, probes)))
      .select(col("query_id"), (col("pos") / probes).cast("int").as("tbl"),
        col("col").as("bucket"))
    val candIds = cB.join(qB, Seq("tbl", "bucket"))
      .filter(col("corpus_id") =!= col("query_id"))
      .select("query_id", "corpus_id").distinct()
    rankTopK(scoreCandidates(candIds, q, c), k)
  }

  /** [[lshTopK]] with `numPlanes` derived from the corpus size — the
    * [[lshParamsFor]] discipline ported to query-time ANN: planes =
    * ⌈log₂(N / targetBucket)⌉ keeps the expected bucket population at
    * `targetBucket` as the corpus grows, so the scored-candidate
    * budget stays ≈ tables·probes·targetBucket PER QUERY regardless
    * of N (fixed planes would hold an N/2^planes bucket and degrade
    * to brute force). `tables`/`probes` are the recall knobs —
    * query-side only, so raising them never touches the corpus index.
    *
    * Measured on the sf0.1 testdata corpus (N=2000, 50 queries,
    * ProfileMultiProbe): the default (targetBucket=8 → planes=8,
    * tables=8, probes=16) reaches recall@5 = 0.912 scoring 827
    * candidates/query — 2.4× below brute force even at this tiny N,
    * and the budget is N-independent: at N=10⁹ the same
    * tables·probes·targetBucket ≈ 1k candidates is 10⁻⁶ of the
    * corpus. Bench emits the recall each round, so the 0.9 gate
    * regresses visibly. */
  def lshTopKAuto(corpus: DataFrame, queries: DataFrame, k: Int,
                  targetBucket: Long = 8, tables: Int = 8,
                  probes: Int = 16, idCol: String = "vec_id",
                  vecCol: String = "embedding",
                  corpusSize: Option[Long] = None): DataFrame = {
    // planes changes the PLAN STRUCTURE (bucket bit width), so the
    // size must be known before planning — a lazy 1-row stats frame
    // cannot feed it. Pass `corpusSize` when the caller already knows
    // N (table stats, a prior count, the catalog); the count() here
    // is the fallback, not the design: at warehouse scale N comes
    // from metadata, never a scan per query batch.
    val n = math.max(1L, corpusSize.getOrElse(corpus.count()))
    val planes = math.max(1, math.ceil(
      math.log(n.toDouble / targetBucket) / math.log(2.0)).toInt)
    lshTopK(corpus, queries, k, planes, tables, probes, idCol, vecCol)
  }

  /** Oracle-gated md5 twin of [[lshTopK]] — the q123 playbook ported
    * to the sign-LSH ANN path (the last rows-only family): the SAME
    * pipeline shape (per-table sign buckets, query-directed
    * multi-probe over lowest-margin plane flips, ids-only candidate
    * join, exact cosine rerank) with every piece of randomness-free
    * arithmetic a SQL engine can replay:
    *
    *  - plane components from `md5("t|p|i")` — first 5 hex digits as
    *    a 20-bit int → n/2¹⁹ − 1 ∈ [−1, 1). Binary rationals, exactly
    *    representable; both engines compute the identical doubles.
    *    (Production [[lshTopK]] keeps SplitMix64 planes — one JIT'd
    *    hash per component instead of an md5 string digest.)
    *  - projections via the same sequential-fold [[dot]] the rerank
    *    uses (≡ DuckDB `list_dot_product`, proven order-identical by
    *    every ANN oracle since q28).
    *  - probe ranking over FIXED-POINT margins: score(flipSet) =
    *    Σ ⌊proj²·2²⁰⌋ as longs — exact integer sums, so the ranking
    *    is order-independent and engine-exact, where production's
    *    float Σ margin² would hash-diverge on summation order. Ties
    *    break on the flip mask ascending.
    *
    * Params default small (4 tables × 6 planes × 8 probes) so the
    * oracle's plane/margin CTEs stay tractable; the twin certifies
    * the ALGORITHM — bucketing, multi-probe, rerank — not production
    * recall (the Bench recall line gates that each round; fixed
    * planes also make this a fixed-bucket-count variant — the
    * N-adaptive plane count is [[lshTopKAuto]]'s job). */
  def lshTopKMd5(corpus: DataFrame, queries: DataFrame, k: Int,
                 numPlanes: Int = 6, tables: Int = 4, probes: Int = 8,
                 dim: Int = 64, idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame = {
    require(numPlanes >= 1 && numPlanes <= 62 && probes >= 1)
    def component(t: Int, p: Int, i: Int): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$t|$p|$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 5), 16)
        .toDouble / 524288.0 - 1.0
    }
    // tiny literal codebook (tables × planes × dim doubles) folded
    // into the expressions — the coreset/k-means broadcast-literal
    // discipline; zero extra scans, zero stored state
    val plane: Array[Array[Seq[Double]]] =
      Array.tabulate(tables, numPlanes)((t, p) =>
        (0 until dim).map(i => component(t, p, i)))
    // all 1- and 2-plane flip sets, ranked per query by fixed-point
    // Σ margin², ties on the mask — deterministic in any engine
    val masks: Seq[Long] =
      (0 until numPlanes).map(a => 1L << a) ++
        (for { a <- 0 until numPlanes; b <- a + 1 until numPlanes }
          yield (1L << a) | (1L << b))
    require(probes - 1 <= masks.size,
      s"probes − 1 may not exceed ${masks.size} flip sets")

    val c0 = corpus.select(col(idCol).as("corpus_id"),
      asDouble(col(vecCol)).as("cv")).withColumn("cn", norm(col("cv")))
    val q0 = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qv")).withColumn("qn", norm(col("qv")))

    def projCols(v: Column): Seq[Column] =
      for { t <- 0 until tables; p <- 0 until numPlanes }
        yield dot(v, typedlit(plane(t)(p))).as(s"__pr_${t}_$p")
    def bucketOf(t: Int): Column =
      (0 until numPlanes).map(p =>
        when(col(s"__pr_${t}_$p") > 0, lit(1L << p)).otherwise(lit(0L)))
        .reduce(_ + _)

    val cB = c0.select(col("corpus_id") +: projCols(col("cv")): _*)
      .select(col("corpus_id"), posexplode(
        array((0 until tables).map(bucketOf): _*)))
      .withColumnRenamed("pos", "tbl").withColumnRenamed("col", "bucket")

    val qProj = q0.select(col("query_id") +: projCols(col("qv")): _*)
    def mlong(t: Int, p: Int): Column =
      floor(col(s"__pr_${t}_$p") * col(s"__pr_${t}_$p") * lit(1048576.0))
        .cast(org.apache.spark.sql.types.LongType)
    def scoreOf(t: Int, m: Long): Column =
      (0 until numPlanes).filter(p => (m & (1L << p)) != 0L)
        .map(mlong(t, _)).reduce(_ + _)
    def probeArr(t: Int): Column = {
      val base = bucketOf(t)
      val ranked = array_sort(array(masks.map(m =>
        struct(scoreOf(t, m).as("s"), lit(m).as("m"))): _*))
      concat(array(base),
        transform(slice(ranked, 1, probes - 1),
          st => base.bitwiseXOR(st.getField("m"))))
    }
    val qB = qProj
      .select(col("query_id"), posexplode(
        array((0 until tables).map(probeArr): _*)))
      .select(col("query_id"), col("pos").as("tbl"),
        explode(col("col")).as("bucket"))

    val candIds = cB.join(qB, Seq("tbl", "bucket"))
      .filter(col("corpus_id") =!= col("query_id"))
      .select("query_id", "corpus_id").distinct()
    rankTopK(scoreCandidates(candIds, q0, c0), k)
  }

  /** IVF-style approximate top-k: a deterministic coarse quantizer
    * (hash-derived centroid codebook — no training, identical
    * everywhere) assigns each corpus vector to ONE home cell; queries
    * probe their `nProbe` nearest cells and rank exactly within the
    * candidates. Same ids-only join discipline as [[lshTopK]]. Recall
    * rises with nProbe; corpus-side cost is one int per vector. */
  /** IVF ANN with a LEARNED coarse quantizer: [[Cluster.kmeansFit]]
    * centroids define the cells — true Voronoi locality — instead of
    * [[ivfTopK]]'s data-oblivious hash-plane cells. This is the
    * textbook IVF of Faiss/SPANN: corpus vectors index under their
    * nearest centroid (ONE narrow codegen'd argmax pass — the
    * centroids are a driver literal, the corpus is never shuffled),
    * and each query probes its `nProbe` nearest cells ranked by
    * dot(q, c)/|c| (the query's own norm is a per-query constant, so
    * the cell ORDER equals full-cosine order), ties to the lower
    * cluster id. Exact cosine re-rank within the probed cells.
    *
    * Why it earns its fit cost over [[ivfTopK]]: hash-plane cells
    * split neighbors with probability ∝ their angle regardless of
    * data shape, so on THIS corpus (near-uniform synthetic
    * embeddings, the adversarial case) recall tracks the probed
    * fraction almost linearly — 0.76 at half the cells probed.
    * Learned cells concentrate true neighbors: same probed fraction,
    * measurably higher recall (ProfileIvfR7 / the BENCH recall
    * line), and on real clustered corpora the gap widens. Everything
    * (fixed-point means, argmax ties, probe ranking, re-rank) is
    * engine-replayable — the q128 oracle replays the WHOLE pipeline
    * including the k-means fit, where the hash-cell q36 can only get
    * a rows-only check.
    *
    * 100 TB shape: fit cost = iters × (corpus scan + k·dim-row
    * aggregate); index = one argmax pass; queries broadcast; the
    * candidate join shuffles only (cell, id) rows. */
  def ivfKmeansTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                    numCentroids: Int = 32, iters: Int = 2,
                    nProbe: Int = 8,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    require(nProbe >= 1 && nProbe <= numCentroids,
      s"need 1 <= nProbe <= numCentroids, got $nProbe/$numCentroids")
    val cents = Cluster.kmeansFit(corpus, numCentroids, iters,
      idCol, vecCol)
    val cCell = Cluster.assignWith(corpus, cents, idCol, vecCol)
      .select(col(idCol).as("corpus_id"), col("cluster").as("cell"))
    val c = corpus.select(col(idCol).as("corpus_id"),
      asDouble(col(vecCol)).as("cv")).withColumn("cn", norm(col("cv")))
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qv")).withColumn("qn", norm(col("qv")))
    val centArr = typedLit(cents.map(_._2))
    val clArr = typedLit(cents.map(_._1))
    // centroid norms fold on the driver in ascending component order
    // — the same sequential order list_dot_product replays
    val normArr = typedLit(cents.map(cc =>
      math.sqrt(cc._2.foldLeft(0.0)((a, x) => a + x * x))))
    val probes = q.select(col("query_id"), explode(slice(array_sort(
        transform(sequence(lit(0), lit(cents.size - 1)), i =>
          struct(
            (-(dotFold(col("qv"), element_at(centArr, i + lit(1)))
              / element_at(normArr, i + lit(1)))).as("neg"),
            element_at(clArr, i + lit(1)).as("cell")))),
        1, nProbe)).as("p"))
      .select(col("query_id"), col("p").getField("cell").as("cell"))
    val candIds = cCell.join(probes, "cell")
      .filter(col("corpus_id") =!= col("query_id"))
      .select("query_id", "corpus_id").distinct()
    rankTopK(scoreCandidates(candIds, q, c), k)
  }

  /** Persist an IVF index for [[ivfFromIndex]] — the
    * [[TextOps.buildInvertedIndex]] discipline applied to vector
    * serving: fit the learned coarse quantizer ONCE
    * ([[Cluster.kmeansFit]], deterministic), then write every corpus
    * vector (id, cv double-cast, cn precomputed norm) PARTITIONED BY
    * its cell, plus the k·dim centroid table. A query then prices as
    * a centroid ranking + a partition-PRUNED read of its nProbe
    * cells — the interactive-serving shape where re-fitting and
    * re-scanning the corpus per query ([[ivfKmeansTopK]]) is the
    * wrong plan. Doubles round-trip parquet exactly, so the index
    * path stays bit-identical to the in-memory path. */
  def buildIvfIndex(corpus: DataFrame, indexDir: String,
                    numCentroids: Int = 32, iters: Int = 2,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): Unit = {
    val cents = Cluster.kmeansFit(corpus, numCentroids, iters,
      idCol, vecCol)
    val cCell = Cluster.assignWith(corpus, cents, idCol, vecCol)
      .select(col(idCol).as("corpus_id"), col("cluster").as("cell"),
        col("e").as("cv"))
      .withColumn("cn", norm(col("cv")))
    cCell.write.mode("overwrite").partitionBy("cell")
      .parquet(s"$indexDir/cells")
    val spark = corpus.sparkSession
    import spark.implicits._
    cents.toDF("cell", "centroid")
      .write.mode("overwrite").parquet(s"$indexDir/centroids")
  }

  /** Incrementally ingest new vectors into a persisted IVF index —
    * the q99 merge-compaction story for vectors: the STORED centroids
    * quantize the new batch (no refit — cell membership of existing
    * vectors cannot shift, so old answers stay valid), and the new
    * (id, cv, cn) rows APPEND to their cell partitions. After append,
    * the index is bit-identical to one built by assigning the whole
    * union under the same centroids (IvfIndexSpec proves it) — the
    * standard IVF ingest contract; REFIT (a new quantizer) is the
    * explicitly separate, full-rebuild decision, exactly as for a
    * retrained PQ codebook. */
  def appendToIvfIndex(newVectors: DataFrame, indexDir: String,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): Unit = {
    val spark = newVectors.sparkSession
    val cents = spark.read.parquet(s"$indexDir/centroids")
      .orderBy("cell").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    Cluster.assignWith(newVectors, cents, idCol, vecCol)
      .select(col(idCol).as("corpus_id"), col("cluster").as("cell"),
        col("e").as("cv"))
      .withColumn("cn", norm(col("cv")))
      .write.mode("append").partitionBy("cell")
      .parquet(s"$indexDir/cells")
  }

  /** IVF top-k FROM the persisted index — BIT-IDENTICAL to
    * [[ivfKmeansTopK]] at the same (numCentroids, iters, nProbe)
    * (q176 hash-matches q128's oracle to prove it end-to-end, the
    * q95 ≡ q90 equivalence argument): the centroid table (k·dim
    * doubles) loads to the driver, cells rank per query by the same
    * dot/‖c‖ struct sort, and ONLY the union of probed cells is
    * read — the cell predicate reaches the scan as a
    * `PartitionFilters:` entry, so an nProbe/numCentroids fraction
    * of the index bytes is ever opened (IvfIndexSpec asserts the
    * file census). Candidate and scoring arithmetic are the shared
    * [[rankTopK]]/[[scoreCandidates]] tail over the stored
    * (cv, cn) — doubles that round-tripped parquet exactly. */
  def ivfFromIndex(spark: org.apache.spark.sql.SparkSession,
                   indexDir: String, queries: DataFrame, k: Int,
                   nProbe: Int = 8,
                   idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    val cents = spark.read.parquet(s"$indexDir/centroids")
      .orderBy("cell").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    require(nProbe >= 1 && nProbe <= cents.size,
      s"need 1 <= nProbe <= ${cents.size}, got $nProbe")
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qv")).withColumn("qn", norm(col("qv")))
    val centArr = typedLit(cents.map(_._2))
    val clArr = typedLit(cents.map(_._1))
    val normArr = typedLit(cents.map(cc =>
      math.sqrt(cc._2.foldLeft(0.0)((a, x) => a + x * x))))
    val probes = q.select(col("query_id"), explode(slice(array_sort(
        transform(sequence(lit(0), lit(cents.size - 1)), i =>
          struct(
            (-(dotFold(col("qv"), element_at(centArr, i + lit(1)))
              / element_at(normArr, i + lit(1)))).as("neg"),
            element_at(clArr, i + lit(1)).as("cell")))),
        1, nProbe)).as("p"))
      .select(col("query_id"), col("p").getField("cell").as("cell"))
    // the probed-cell union is ≤ numCentroids values (bounded
    // collect) and becomes a PARTITION filter on the index read
    val probedCells = probes.select("cell").distinct()
      .collect().map(_.getLong(0)).sorted
    val cells = spark.read.parquet(s"$indexDir/cells")
      .withColumn("cell", col("cell").cast("long"))
      .filter(col("cell").isin(probedCells: _*))
    val candIds = cells.select(col("cell"), col("corpus_id"))
      .join(probes, "cell")
      .filter(col("corpus_id") =!= col("query_id"))
      .select("query_id", "corpus_id").distinct()
    val c = cells.select(col("corpus_id"), col("cv"), col("cn"))
    rankTopK(scoreCandidates(candIds, q, c), k)
  }

  /** Product-quantization approximate top-k (Jégou et al. 2011, the
    * Faiss PQ shape, spherical variant): the vector space splits into
    * `m` subspaces; each subspace learns its own `codesPerSub`-word
    * codebook (the deterministic [[Cluster.kmeansFit]] on sliced
    * vectors — fixed-point means, lowest-id ties); every corpus
    * vector compresses to m small code indices plus one reconstructed
    * norm. Queries score the ENTIRE compressed corpus by asymmetric
    * distance (ADC): per query, an m×codes table of
    * dot(query-slice, codeword) is computed ONCE, so each
    * (query, corpus) pair costs m table lookups + m adds instead of a
    * d-component dot — then the top-`rerank` candidates per query are
    * re-ranked by EXACT cosine.
    *
    * Scale shape: the scan side reads m ints + 1 double per corpus
    * vector (m=4: ~12 bytes vs 256+ for float32 d=64 — the
    * [[hammingTopK]] compression story with a learned, data-shaped
    * codebook). The codebooks are m·codes·(d/m) doubles of driver
    * model state (the k-means discipline); only
    * (query_id, corpus_id, approx) id-width rows shuffle for the
    * group-limit, and exactly queries×rerank rows re-attach vectors.
    *
    * Determinism: codebooks replay engine-exactly (q87/q128
    * precedent); ADC sums fold left-associatively over subspaces in
    * index order; approx ties break on corpus_id; the exact tail is
    * [[rankTopK]] — so the WHOLE pipeline including all m fits is
    * oracle-replayable (q134). */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
             m: Int = 4, codesPerSub: Int = 8, iters: Int = 2,
             rerank: Int = 50, idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame = {
    require(m > 0 && codesPerSub > 0 && iters >= 0, "bad PQ params")
    require(rerank >= k, s"need rerank >= k, got $rerank < $k")
    val dim = corpus.select(size(col(vecCol)).as("d")).head.getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val sub = dim / m
    val c = corpus.select(col(idCol).as("corpus_id"),
      asDouble(col(vecCol)).as("cv")).withColumn("cn", norm(col("cv")))
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qv")).withColumn("qn", norm(col("qv")))
    val books = pqFitBooks(corpus, m, codesPerSub, iters, sub,
      idCol, vecCol)
    val enc = pqEncode(c, books, sub)
    rankTopK(scoreCandidates(
      pqCandidates(enc, q, books, codesPerSub, sub, rerank), q, c), k)
  }

  /** The m bounded driver fits on sliced vectors; codewords arrive
    * sorted by seed id, matching the oracle's tie order. The fits
    * are independent, so they SUBMIT CONCURRENTLY (driver-thread
    * Spark jobs — the documented multi-job pattern): wall-clock is
    * one fit, not m; assembly by subspace index keeps the result
    * order-deterministic regardless of completion order. */
  private def pqFitBooks(corpus: DataFrame, m: Int, codesPerSub: Int,
                         iters: Int, sub: Int, idCol: String,
                         vecCol: String): Seq[Seq[Seq[Double]]] = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    Await.result(
      Future.traverse((0 until m).toList) { j =>
        Future {
          Cluster.kmeansFit(
            corpus.select(col(idCol),
              slice(asDouble(col(vecCol)), j * sub + 1, sub).as(vecCol)),
            codesPerSub, iters, idCol, vecCol).map(_._2)
        }
      }, Duration.Inf)
  }

  /** Encode (corpus_id, cv) to (corpus_id, __c0..__c{m-1}, __rn): m
    * codegen'd argmax loops in ONE projection; code = index into the
    * id-sorted codebook (argmax ties → lowest index = lowest seed
    * id); __rn = sqrt of the reconstructed norm² (codeword norms²
    * folded on the driver in component order — the same sequential
    * sum list_dot_product replays). */
  private def pqEncode(c: DataFrame, books: Seq[Seq[Seq[Double]]],
                       sub: Int): DataFrame = {
    val m = books.size
    val normSq: Seq[Seq[Double]] =
      books.map(_.map(_.foldLeft(0.0)((a, x) => a + x * x)))
    val enc0 = (0 until m).foldLeft(c) { (df, j) =>
      df.withColumn(s"__c$j",
        graft.functions.VectorExpressions.argmax_cosine(
          slice(col("cv"), j * sub + 1, sub),
          books(j).map(_.toArray).toArray)
        .getItem(1).cast("int"))
    }
    val rnorm = sqrt((0 until m).map(j =>
        element_at(typedLit(normSq(j)), col(s"__c$j") + 1))
      .reduceLeft(_ + _))
    enc0.select(col("corpus_id") +:
      (0 until m).map(j => col(s"__c$j")) :+ rnorm.as("__rn"): _*)
  }

  /** ADC scan + rerank cut over an encoded corpus: per-query tables
    * of dot(query-slice, codeword), the m-lookup approximate score,
    * and the top-`rerank` candidate ids per query. */
  private def pqCandidates(enc: DataFrame, q: DataFrame,
                           books: Seq[Seq[Seq[Double]]],
                           codesPerSub: Int, sub: Int,
                           rerank: Int): DataFrame = {
    val m = books.size
    val qTabs = (0 until m).foldLeft(q) { (df, j) =>
      df.withColumn(s"__t$j",
        transform(sequence(lit(0), lit(codesPerSub - 1)),
          i => dot(slice(col("qv"), j * sub + 1, sub),
            element_at(typedLit(books(j)), i + 1))))
    }.select(col("query_id") +:
      (0 until m).map(j => col(s"__t$j")) :+ col("qn"): _*)
    val approx = enc.crossJoin(broadcast(qTabs))
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        ((0 until m).map(j =>
            element_at(col(s"__t$j"), col(s"__c$j") + 1))
          .reduceLeft(_ + _) / (col("qn") * col("__rn"))).as("approx"))
    val wA = Window.partitionBy("query_id")
      .orderBy(col("approx").desc, col("corpus_id"))
    approx.withColumn("__r", row_number().over(wA))
      .filter(col("__r") <= rerank).select("query_id", "corpus_id")
  }

  /** Persist a PQ index for [[pqFromIndex]] — codebooks (j, code,
    * centroid), the encoded corpus (corpus_id, m int codes, __rn —
    * the ~m·4+8-byte scan side), and the full vectors
    * (corpus_id, cv, cn — the id-keyed rerank side a serving layout
    * would bucket by id). Fits and encoding are [[pqTopK]]'s exact
    * code paths, so the stored index replays bit-for-bit. */
  def buildPqIndex(corpus: DataFrame, indexDir: String,
                   m: Int = 4, codesPerSub: Int = 8, iters: Int = 2,
                   idCol: String = "vec_id",
                   vecCol: String = "embedding"): Unit = {
    val dim = corpus.select(size(col(vecCol)).as("d")).head.getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val sub = dim / m
    val books = pqFitBooks(corpus, m, codesPerSub, iters, sub,
      idCol, vecCol)
    val spark = corpus.sparkSession
    import spark.implicits._
    books.zipWithIndex.flatMap { case (b, j) =>
      b.zipWithIndex.map { case (cw, i) => (j, i, cw) }
    }.toDF("j", "code", "centroid")
      .write.mode("overwrite").parquet(s"$indexDir/books")
    val c = corpus.select(col(idCol).as("corpus_id"),
      asDouble(col(vecCol)).as("cv")).withColumn("cn", norm(col("cv")))
    pqEncode(c, books, sub)
      .write.mode("overwrite").parquet(s"$indexDir/codes")
    c.write.mode("overwrite").parquet(s"$indexDir/vectors")
  }

  /** PQ top-k FROM the persisted index — BIT-IDENTICAL to [[pqTopK]]
    * at the same stored (m, codesPerSub) and the same `rerank`
    * (q177 hash-matches q134's oracle verbatim — the stored-index ≡
    * in-memory equivalence argument of q176/q95): codebooks load to
    * the driver (m·codes·sub doubles), the ADC scan reads the
    * ~m·4+8-byte code rows instead of float vectors, and only
    * queries×rerank ids join back to the stored vectors for the
    * exact tail. */
  def pqFromIndex(spark: org.apache.spark.sql.SparkSession,
                  indexDir: String, queries: DataFrame, k: Int,
                  rerank: Int = 50,
                  idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame = {
    require(rerank >= k, s"need rerank >= k, got $rerank < $k")
    val books: Seq[Seq[Seq[Double]]] =
      spark.read.parquet(s"$indexDir/books")
        .orderBy("j", "code").collect()
        .map(r => (r.getInt(0), r.getSeq[Double](2)))
        .groupBy(_._1).toSeq.sortBy(_._1)
        .map(_._2.map(_._2).toSeq)
    val codesPerSub = books.head.size
    val sub = books.head.head.size
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qv")).withColumn("qn", norm(col("qv")))
    val enc = spark.read.parquet(s"$indexDir/codes")
    val c = spark.read.parquet(s"$indexDir/vectors")
    rankTopK(scoreCandidates(
      pqCandidates(enc, q, books, codesPerSub, sub, rerank), q, c), k)
  }

  /** Maximal-marginal-relevance (MMR, Carbonell & Goldstein 1998)
    * diversified top-k: re-rank each query's top-`cand` cosine
    * candidates so the k results balance RELEVANCE to the query
    * against REDUNDANCY with already-selected results —
    * mmr(c) = λ·cos(q, c) − (1−λ)·max over picked p of cos(c, p).
    * The dedup step a retrieval/RAG stack applies after ANN: without
    * it, a near-duplicated corpus returns k copies of one document.
    *
    * Shape: candidate generation is [[bruteForceTopK]]'s scan (swap
    * in any ANN variant upstream); the greedy runs as k driver-
    * unrolled rounds of per-query window argmax over BOUNDED frames —
    * (query × cand) relevance rows and (query × cand²) pairwise-sim
    * rows, ids + doubles only, never corpus-sized. k and cand are
    * small constants (5/20), so the rounds are bounded jobs exactly
    * like the BPE/k-means iteration discipline.
    *
    * Determinism: the mmr expression is two IEEE multiplies and one
    * subtract in fixed order; max-over-picked is a max over ≤ k
    * doubles; ties break on corpus_id — the DuckDB oracle unrolls
    * the same k rounds and matches hash-exact. Output:
    * (query_id, rank, corpus_id, cosine_sim, mmr_score). */
  def mmrTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              cand: Int = 20, lambda: Double = 0.7,
              idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    require(k >= 1 && cand >= k, s"need 1 <= k <= cand, got $k/$cand")
    require(lambda >= 0.0 && lambda <= 1.0, "need lambda in [0,1]")
    // top-`cand` exact candidates per query, with their relevance
    val rel = bruteForceTopK(corpus, queries, cand, idCol, vecCol)
      .select(col("query_id"), col("corpus_id"),
        col("cosine_sim").as("rel"))
    // pairwise sims among each query's candidates (cand² per query,
    // bounded); computed once, reused by every round
    val c = corpus.select(col(idCol).as("__cid"),
      asDouble(col(vecCol)).as("__cv")).withColumn("__cn", norm(col("__cv")))
    val withVec = rel
      .join(c, rel("corpus_id") === c("__cid")).drop("__cid")
    val a = withVec.select(col("query_id"), col("corpus_id").as("a"),
      col("__cv").as("av"), col("__cn").as("an"))
    val b = withVec.select(col("query_id"), col("corpus_id").as("b"),
      col("__cv").as("bv"), col("__cn").as("bn"))
    val sims = a.join(b, Seq("query_id"))
      .filter(col("a") =!= col("b"))
      .select(col("query_id"), col("a"), col("b"),
        cosinePre(col("av"), col("an"), col("bv"), col("bn")).as("sim"))
      .localCheckpoint()
    val relCk = rel.localCheckpoint()
    // round 1: pure relevance argmax (no picked set yet)
    val w1 = Window.partitionBy("query_id")
      .orderBy(col("rel").desc, col("corpus_id"))
    var picked = relCk.withColumn("__r", row_number().over(w1))
      .filter(col("__r") === 1)
      .select(col("query_id"), col("corpus_id"), col("rel"),
        col("rel").as("mmr_score"), lit(1).as("rank"))
      .localCheckpoint()
    for (r <- 2 to k) {
      val remaining = relCk.join(
        picked.select(col("query_id"), col("corpus_id")),
        Seq("query_id", "corpus_id"), "left_anti")
      // max sim of each remaining candidate to the picked set
      val maxSim = sims.join(
          picked.select(col("query_id"), col("corpus_id").as("b")),
          Seq("query_id", "b"))
        .groupBy(col("query_id"), col("a").as("corpus_id"))
        .agg(max(col("sim")).as("__ms"))
      val wr = Window.partitionBy("query_id")
        .orderBy(col("mmr_score").desc, col("corpus_id"))
      val next = remaining.join(maxSim, Seq("query_id", "corpus_id"))
        .withColumn("mmr_score",
          lit(lambda) * col("rel") - lit(1.0 - lambda) * col("__ms"))
        .withColumn("__r", row_number().over(wr))
        .filter(col("__r") === 1)
        .select(col("query_id"), col("corpus_id"), col("rel"),
          col("mmr_score"), lit(r).as("rank"))
      picked = picked.unionByName(next).localCheckpoint()
    }
    picked.select(col("query_id"), col("rank"), col("corpus_id"),
        col("rel").as("cosine_sim"), col("mmr_score"))
      .orderBy("query_id", "rank")
  }

  /** EMBEDDING-space decontamination — the semantic sibling of the
    * n-gram [[TextOps.decontaminate]]: a training vector whose cosine
    * to ANY eval-set vector reaches `tau` is contaminated (a
    * paraphrased eval leak that shares no 8-gram still sits next to
    * its source in embedding space). Reports, per corpus vector, the
    * max eval similarity, the argmax eval id (ties → lowest), and the
    * verdict — the audit table a training run blocks on.
    *
    * Scale shape: the q67 discipline — the eval pool is BROADCAST
    * (eval sets are thousands of rows; the corpus is the big side),
    * the corpus is scanned ONCE with a codegen'd max-fold over the
    * pool, nothing corpus-sized shuffles, output is corpus-row
    * bounded. For eval pools too large to broadcast, prefilter with
    * [[hammingTopK]]'s sign words; the exact scan here is the
    * verdict-grade tail either way.
    *
    * Determinism: per-row max/argmax over a fixed-order pool with
    * the sequential-fold cosine — engine-replayable. */
  def cosineDecontaminate(corpus: DataFrame, evalSet: DataFrame,
                          tau: Double,
                          idCol: String = "vec_id",
                          vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol), asDouble(col(vecCol)).as("cv"))
      .withColumn("cn", norm(col("cv")))
    val e = evalSet.select(col(idCol).as("eval_id"),
      asDouble(col(vecCol)).as("ev")).withColumn("en", norm(col("ev")))
    // (corpus × eval) with the eval side broadcast; argmax by
    // (sim desc, eval_id) via one window over corpus-partitioned rows
    val sims = c.crossJoin(broadcast(e))
      .select(col(idCol), col("eval_id"),
        cosinePre(col("cv"), col("cn"), col("ev"), col("en")).as("sim"))
    val w = Window.partitionBy(idCol)
      .orderBy(col("sim").desc, col("eval_id"))
    sims.withColumn("__r", row_number().over(w))
      .filter(col("__r") === 1)
      .select(col(idCol), col("eval_id").as("nearest_eval_id"),
        col("sim").as("max_eval_sim"),
        (col("sim") >= tau).as("contaminated"))
      .orderBy(idCol)
  }

  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              numCentroids: Int = 64, nProbe: Int = 8,
              idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    import graft.functions.VectorExpressions.ivf_probes
    val c = corpus.select(col(idCol).as("corpus_id"),
      asDouble(col(vecCol)).as("cv")).withColumn("cn", norm(col("cv")))
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qv")).withColumn("qn", norm(col("qv")))
    val cCell = c.select(col("corpus_id"),
      element_at(ivf_probes(col("cv"), numCentroids, 1), 1).as("cell"))
    val qCell = q.select(col("query_id"),
        explode(ivf_probes(col("qv"), numCentroids, nProbe)).as("cell"))
    val candIds = cCell.join(qCell, "cell")
      .filter(col("corpus_id") =!= col("query_id"))
      .select("query_id", "corpus_id").distinct()
    rankTopK(scoreCandidates(candIds, q, c), k)
  }

  /** Binary-quantized approximate top-k: corpus and query vectors are
    * sign-packed into BIGINT words ([[Quantize.signPack]] — 32×
    * smaller than float32), candidates are the `rerank` corpus
    * vectors with the smallest Hamming distance to the query's words
    * (ties → corpus_id), and the survivors are re-ranked by EXACT
    * cosine. Integer Hamming + fixed tie order + exact re-rank make
    * the whole result hash-exact (no xxhash, no sketch) — unlike
    * LSH/IVF this approximate index is fully oracle-checkable.
    *
    * Scale shape: the Hamming scan reads 8 bytes/vector/word instead
    * of 256+ for floats, the per-query group-limit pushes the top-C
    * selection ahead of the rank shuffle (WindowGroupLimit), and only
    * (queries × rerank) rows re-attach vectors for exact scoring. */
  def hammingTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                  rerank: Int = 50, idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"),
      asDouble(col(vecCol)).as("cv")).withColumn("cn", norm(col("cv")))
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qv")).withColumn("qn", norm(col("qv")))
    val cW = Quantize.signPack(corpus, idCol, vecCol)
      .select(col(idCol).as("corpus_id"), col("words").as("cw"))
    val qW = Quantize.signPack(queries, idCol, vecCol)
      .select(col(idCol).as("query_id"), col("words").as("qw"))
    val hw = Window.partitionBy("query_id")
      .orderBy(col("hamming"), col("corpus_id"))
    // materialized once: the exact-rerank scoring AND the final
    // hamming re-attach join both consume the candidates — un-
    // checkpointed, the corpus×queries Hamming scan + rerank window
    // runs twice (guide §2.4). ≤ rerank·|queries| id rows.
    val cand = cW.crossJoin(broadcast(qW))
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        Quantize.hamming(col("qw"), col("cw")).cast("int").as("hamming"))
      .withColumn("hrank", row_number().over(hw))
      .filter(col("hrank") <= rerank)
      .select("query_id", "corpus_id", "hamming")
      .localCheckpoint(true)
    rankTopK(scoreCandidates(cand, q, c), k)
      .join(cand, Seq("query_id", "corpus_id"))
      .select("query_id", "rank", "corpus_id", "hamming", "cosine_sim")
      .orderBy("query_id", "rank")
  }

  /** Per-group (language) embedding centroid + per-document cosine to
    * its group centroid — the semantic-outlier curation signal (docs
    * far from their language's centroid are mislabeled, noise, or
    * off-distribution). `lang_rank` orders each group
    * ascending-similarity, so rank ≤ r selects the r strongest
    * outliers per group.
    *
    * Determinism at scale: a double sum is partition-order-dependent,
    * so each element is first fixed-point quantized
    * (floor(x·2^20 + 0.5) — one IEEE multiply/add/floor, replayable
    * anywhere) and summed as integers: exact, order-independent, and
    * a plain map-side-combining groupBy — no collect, no sequential
    * fold over a whole group. 2^20 scaling keeps |sum| < 2^63 for any
    * group up to ~10^12 unit-normalized vectors; the centroid is then
    * sum/2^20/n in two fixed-order double divisions. */
  def centroidScores(docs: DataFrame, embeddings: DataFrame,
                     groupCol: String = "lang",
                     idCol: String = "doc_id",
                     vecCol: String = "embedding"): DataFrame = {
    val joined = docs.select(col(idCol), col(groupCol))
      .join(embeddings.select(col("vec_id").as(idCol),
        asDouble(col(vecCol)).as("e")), idCol)
    val sums = joined
      .select(col(groupCol), posexplode(col("e")))
      .select(col(groupCol), col("pos"),
        floor(col("col") * lit(1048576.0) + lit(0.5)).cast("long").as("qv"))
      .groupBy(groupCol, "pos")
      .agg(sum("qv").as("sq"), count(lit(1)).as("n"))
    val centroids = sums
      .withColumn("mean",
        col("sq").cast("double") / lit(1048576.0) / col("n").cast("double"))
      .groupBy(groupCol)
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("mean")))),
        _.getField("mean")).as("centroid"))
    joined.join(broadcast(centroids), groupCol)
      .select(col(idCol), col(groupCol),
        cosine(col("e"), col("centroid")).as("centroid_sim"))
      .withColumn("lang_rank", row_number().over(
        Window.partitionBy(groupCol)
          .orderBy(col("centroid_sim"), col(idCol))))
      .orderBy(idCol)
  }

  /** Shared kNN vote machinery of [[knnClassify]] and [[labelErrors]]
    * — (votes, winner): per-(query, label) neighbor counts and the
    * majority winner under the (n_votes desc, label asc) tie order.
    * One definition, so the two oracle-gated consumers can never
    * drift on the vote semantics. */
  private def majorityVotes(labeled: DataFrame, queries: DataFrame,
                            k: Int, rerank: Int, labelCol: String,
                            idCol: String, vecCol: String)
      : (DataFrame, DataFrame) = {
    val nn = hammingTopK(labeled, queries, k, rerank, idCol, vecCol)
      .select(col("query_id"), col("corpus_id"))
    val lab = labeled.select(col(idCol).as("corpus_id"),
      col(labelCol).cast("long").as("lbl"))
    val votes = nn.join(lab, "corpus_id")
      .groupBy(col("query_id"), col("lbl"))
      .agg(count(lit(1)).as("n_votes"))
    val winner = votes
      .withColumn("rk", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("n_votes").desc, col("lbl"))))
      .filter(col("rk") === 1)
      .select(col("query_id"), col("lbl").as("label_pred"),
        col("n_votes"))
    (votes, winner)
  }

  /** kNN label propagation — the FineWeb-Edu-style pattern of labeling
    * a large corpus from a small annotated seed set: each query doc
    * takes the MAJORITY label of its k nearest labeled neighbors
    * (ties → the smaller label id). Neighbors come from
    * [[hammingTopK]] (sign-packed Hamming prefilter + exact cosine
    * re-rank), so the whole classification is deterministic and
    * hash-exact — label-propagation regressions gate like
    * correctness ones.
    *
    * Scale shape: the labeled seed set is the ANN corpus (scans
    * 8 bytes/vector/word); votes are one (query, label) aggregate
    * over k·Q rows and the winner one per-query window over ≤
    * k·Q rows. Output: (id, label_pred, n_votes). */
  def knnClassify(labeled: DataFrame, queries: DataFrame, k: Int,
                  rerank: Int = 50, labelCol: String = "label",
                  idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame = {
    val (_, winner) = majorityVotes(labeled, queries, k, rerank,
      labelCol, idCol, vecCol)
    winner.select(col("query_id").as(idCol), col("label_pred"),
        col("n_votes"))
      .orderBy(idCol)
  }

  /** Label-error detection (the confident-learning / cleanlab shape):
    * each LABELED vector is scored against the majority label of its
    * k nearest OTHER labeled neighbors — a point whose neighborhood
    * votes against its own label is a likely annotation error, the
    * single highest-yield audit before training a classifier on
    * bought labels. Neighbors come from [[hammingTopK]] (sign-packed
    * Hamming prefilter + exact cosine re-rank, ties → corpus_id), the
    * majority is (n_votes desc, label asc), and own_votes counts the
    * point's own label among the k — so the flag AND its evidence are
    * deterministic and hash-exact, like [[knnClassify]].
    *
    * Scale shape: identical to knnClassify (the corpus scan is
    * 8 bytes/vector/word; votes/winner are aggregates over k·Q rows)
    * plus one broadcastable own-label join. Labels must be non-null
    * (a null label would silently zero its own-vote count — the
    * q158 groupBy-null-key lesson; filter or impute first). Output:
    * (id, label, label_pred, n_votes, own_votes, flagged) for every
    * query. */
  def labelErrors(labeled: DataFrame, queries: DataFrame, k: Int,
                  rerank: Int = 50, labelCol: String = "label",
                  idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame = {
    val (votes, winner) = majorityVotes(labeled, queries, k, rerank,
      labelCol, idCol, vecCol)
    val own = queries.select(col(idCol).as("query_id"),
      col(labelCol).cast("long").as("label"))
    val ownVotes = votes.select(col("query_id").as("__qid"),
      col("lbl").as("__lbl"), col("n_votes").as("own_votes"))
    own.join(winner, "query_id")
      .join(ownVotes, col("query_id") === col("__qid") &&
        col("__lbl") === col("label"), "left")
      .select(col("query_id").as(idCol), col("label"), col("label_pred"),
        col("n_votes"), coalesce(col("own_votes"), lit(0L)).as("own_votes"),
        (col("label_pred") =!= col("label")).as("flagged"))
      .orderBy(idCol)
  }

  /** Hard-negative mining for contrastive training: per query, the k
    * MOST similar corpus vectors whose cosine is still below
    * `ceiling` — similar enough to be informative negatives, not so
    * similar they are unlabeled positives (the standard band-pass
    * selection; a plain top-k would mine near-duplicates as
    * negatives and poison the loss). Built on the deterministic
    * brute-force ranking, so the mined pairs are hash-exact and the
    * negative set is reproducible run-over-run — which contrastive
    * training pipelines need for resumable epochs. Output:
    * (query_id, rank, corpus_id, cosine_sim). */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int,
                    ceiling: Double = 0.95,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"),
      asDouble(col(vecCol)).as("cv"))
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qv"))
    rankTopK(c.crossJoin(broadcast(q))
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        cosine(col("qv"), col("cv")).as("cosine_sim"))
      .filter(col("cosine_sim") < ceiling), k)
  }

  /** Per-query recall report of the binary-Hamming index against the
    * exact cosine top-k — the ANN quality audit as a first-class
    * QUERY, not a spec assertion. Because both sides are
    * deterministic ([[bruteForceTopK]] exactly, [[hammingTopK]] via
    * integer Hamming + fixed tie order + exact re-rank), the whole
    * report is hash-exact and oracle-checkable — recall regressions
    * gate like correctness ones. Output: (query_id, n_hit, recall)
    * with n_hit = |exact∩approx| at k. */
  def annRecallReport(corpus: DataFrame, queries: DataFrame, k: Int,
                      rerank: Int = 200,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): DataFrame = {
    val exact = bruteForceTopK(corpus, queries, k, idCol, vecCol)
      .select("query_id", "corpus_id")
    val approx = hammingTopK(corpus, queries, k, rerank, idCol, vecCol)
      .select("query_id", "corpus_id")
    val hits = exact.join(approx, Seq("query_id", "corpus_id"))
      .groupBy("query_id").agg(count(lit(1)).as("n_hit"))
    queries.select(col(idCol).as("query_id"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
      .withColumn("recall", col("n_hit").cast("double") / lit(k.toDouble))
      .orderBy("query_id")
  }

  /** Reciprocal-rank fusion of two ranked lists — the standard
    * hybrid-search combiner (Cormack et al. 2009): rrf(d) =
    * Σ 1/(c + rank_i(d)) over the lists containing d, c = 60. Pure
    * rational arithmetic (no log), so the fused ranking is
    * hash-exact and oracle-replayable. Inputs carry (idCol, rank);
    * a doc missing from one list contributes 0 from it. The join is
    * over two already-top-k lists (tiny), and the final top-k is
    * TakeOrderedAndProject — at scale the cost lives in the two
    * retrievers, not the fusion. Output (id, rank, rrf). */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int, c: Double = 60.0,
              idCol: String = "doc_id"): DataFrame = {
    val fa = a.select(col(idCol), col("rank").as("rank_a"))
    val fb = b.select(col(idCol), col("rank").as("rank_b"))
    val fused = fa.join(fb, Seq(idCol), "full_outer")
      .select(col(idCol),
        (coalesce(lit(1.0) / (lit(c) + col("rank_a")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c) + col("rank_b")), lit(0.0)))
          .as("rrf"))
    val top = fused.orderBy(col("rrf").desc, col(idCol)).limit(k)
    top.withColumn("rank", row_number().over(
        Window.orderBy(col("rrf").desc, col(idCol))))
      .select(col(idCol), col("rank"), col("rrf"))
      .orderBy("rank")
  }

  /** recall@k of an approximate top-k result against the exact one:
    * the fraction of true (query, neighbor) pairs the approximate
    * index recovered. Computed distributed (pair intersection — no
    * driver collect), so it works at any query-set size; Bench emits
    * it per round so recall regressions gate like correctness ones. */
  def recallAtK(exact: DataFrame, approx: DataFrame): Double = {
    val t = exact.select(col("query_id"), col("corpus_id"))
    val total = t.count()
    if (total == 0) 0.0
    else t.intersect(approx.select(col("query_id"), col("corpus_id")))
      .count().toDouble / total
  }

  /** Embedding-cosine near-dup dedup: vectors whose cosine similarity
    * to a lower-id vector is ≥ threshold are dropped; returns the
    * surviving canonical ids. Exact all-pairs here (oracle baseline —
    * bound the input at the call site); [[cosineDedupLsh]] is the
    * scale path with the same verify/survive logic. */
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
    // .distinct() is an aggregation barrier: without it the anti
    // join is pushed through a unioned corpus and the ENTIRE
    // candidate+verify subtree is duplicated per union branch
    // (observed on the q56 plan — 2x the dedup work)
    v.select(col(idCol)).distinct()
      .join(dup, Seq(idCol), "left_anti").orderBy(idCol)
  }

  /** LSH-fed embedding dedup — [[cosineDedup]]'s scale path. Candidate
    * pairs come from equal sign-LSH buckets (multi-probe across
    * `tables` plane sets) instead of the all-pairs cross join; each
    * candidate is then verified with the exact cosine before the
    * survivor anti-join, so false bucket collisions never cause a
    * false drop — only a missed bucket can miss a true near-dup (miss
    * probability (1−p^planes)^tables where p = 1 − θ/π; ≈0 for the
    * near-1 cosines dedup targets, e.g. <1e-12 at cos ≥ 0.99 with
    * planes=4/tables=8). The bucket join carries IDS ONLY (the same
    * discipline as [[lshTopK]]) — vectors are re-attached once per
    * surviving distinct pair, so the shuffle never ships tables×
    * copies of the embeddings. Cost: O(shuffle(ids×tables) +
    * bucket-local pairs), vs the cross join's O(N²). */
  /** LSH parameters scaled to the corpus: with random hyperplanes
    * each plane splits a (roughly centered) corpus in half, so the
    * expected bucket population is N/2^planes —
    * planes = ceil(log2(N / targetBucket)) keeps bucket-local pair
    * work bounded as N grows (fixed planes at 10⁸ vectors would hold
    * ~N/16 vectors per bucket and explode quadratically). Tables then
    * restore recall: a pair at the threshold cosine agrees on one
    * plane with probability p = 1 − θ/π, on a whole band with
    * p^planes, and is missed by every table with
    * (1 − p^planes)^tables ≤ targetMiss — solve for tables. True
    * near-dups sit far above the threshold (an exact dup agrees on
    * every plane with probability 1), so the bound is conservative.
    * Driver-side plan arithmetic only — result determinism never
    * depends on it (verification is exact). */
  def lshParamsFor(n: Long, threshold: Double,
                   targetBucket: Long = 256,
                   targetMiss: Double = 1e-4): (Int, Int) = {
    require(n > 0 && threshold > 0 && threshold < 1, "need 0<threshold<1, n>0")
    val p = 1.0 - math.acos(threshold) / math.Pi
    def tablesFor(planes: Int): Int = math.max(1,
      math.ceil(math.log(targetMiss) / math.log1p(-math.pow(p, planes)))
        .toInt)
    // planes from the bucket-size target; if honoring the miss bound
    // would take more than MaxTables tables, REDUCE planes until the
    // bound holds again (bigger buckets, never a silently weakened
    // recall guarantee — a silent table cap at 1e8 vectors would turn
    // the promised 1e-4 miss into ~3%)
    val MaxTables = 64
    var planes = math.max(1,
      math.ceil(math.log(n.toDouble / targetBucket) / math.log(2.0)).toInt)
    while (planes > 1 && tablesFor(planes) > MaxTables) planes -= 1
    // at planes == 1 the miss bound can still demand > MaxTables
    // tables (thresholds near 0 drive p → 0.5 and tables unbounded);
    // clamp LOUDLY — the caller gets the budget, not the promised
    // miss probability, and the log says which
    val t = tablesFor(planes)
    if (t > MaxTables) {
      val achievedMiss = math.pow(1.0 - math.pow(p, planes), MaxTables)
      System.err.println(
        f"[graft] lshParamsFor(n=$n, threshold=$threshold): miss target " +
        f"$targetMiss%g needs $t tables; clamped to $MaxTables " +
        f"(achieved miss ≈ $achievedMiss%.3g). Verification stays exact.")
    }
    (planes, math.min(t, MaxTables))
  }

  /** [[cosineDedupLsh]] with `numPlanes`/`tables` derived from the
    * corpus size via [[lshParamsFor]] (one count() pre-pass — a cheap
    * scan next to the dedup itself). */
  def cosineDedupLshAuto(vectors: DataFrame, threshold: Double,
                         idCol: String = "vec_id",
                         vecCol: String = "embedding"): DataFrame = {
    val (planes, tables) = lshParamsFor(vectors.count(), threshold)
    cosineDedupLsh(vectors, threshold, planes, tables, idCol, vecCol)
  }

  def cosineDedupLsh(vectors: DataFrame, threshold: Double,
                     numPlanes: Int = 4, tables: Int = 8,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    import graft.functions.VectorExpressions.sign_lsh_buckets
    val v = vectors.select(col(idCol), asDouble(col(vecCol)).as("v"))
    val buckets = v.select(col(idCol).as("id"),
        posexplode(sign_lsh_buckets(col("v"), numPlanes, tables)))
      .withColumnRenamed("pos", "tbl").withColumnRenamed("col", "bucket")
    val candIds = buckets.select(col("tbl"), col("bucket"), col("id").as("id_a"))
      .join(buckets.select(col("tbl"), col("bucket"), col("id").as("id_b")),
        Seq("tbl", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val dup = candIds
      .join(v.select(col(idCol).as("id_a"), col("v").as("va")), "id_a")
      .join(v.select(col(idCol).as("id_b"), col("v").as("vb")), "id_b")
      .filter(cosine(col("va"), col("vb")) >= threshold)
      .select(col("id_b").as(idCol)).distinct()
    // .distinct() is an aggregation barrier: without it the anti
    // join is pushed through a unioned corpus and the ENTIRE
    // candidate+verify subtree is duplicated per union branch
    // (observed on the q56 plan — 2x the dedup work)
    v.select(col(idCol)).distinct()
      .join(dup, Seq(idCol), "left_anti").orderBy(idCol)
  }

}
