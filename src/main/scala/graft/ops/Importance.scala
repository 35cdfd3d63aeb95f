package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Data-selection by importance weighting — the DSIR family (Xie et
  * al. 2023, "Data Selection for Language Models via Importance
  * Resampling"): score every raw-corpus document by how target-like
  * its hashed n-gram profile is, so a small high-quality target set
  * (a domain, a curated corpus) steers selection over a huge raw
  * crawl without training a classifier.
  */
object Importance {

  /** Per-document DSIR importance weights. Features are unigrams +
    * bigrams hashed into `buckets` buckets via the first 3 hex
    * digits of md5 (an integer in [0, 4096) both engines derive
    * from the same hex string — no engine-private hash); bucket
    * probabilities are add-α smoothed over each corpus's total
    * feature count; a doc's weight is the MEAN per-feature ratio
    * p_target(b) / p_raw(b).
    *
    * The mean RATIO is the rational surrogate for DSIR's mean
    * log-ratio — the [[TextOps.bigramLmScore]] discipline: log is
    * transcendental and libm-dependent, while + / × / ÷ are IEEE-
    * exact on both engines, so the score is hash-replayable. Like
    * the mean-probability LM score, it preserves the signal's
    * direction (target-like docs score high) without the log's
    * outlier damping; the selection step consumes ranks, not
    * absolute scores. Per-doc summation folds features in POSITION
    * order (array_sort + sequential aggregate), never parallel-sum
    * order, so the double is bit-stable under any partitioning.
    *
    * Scale shape at 100 TB: the two bucket-count aggregates reduce
    * each corpus to ≤ `buckets` rows (map-side partial combine does
    * almost all the work); the ratio table is ≤ `buckets` rows and
    * BROADCASTS back to the exploded raw features, so the only
    * corpus-sized shuffle is the per-doc regroup of (id, pos,
    * ratio) — 20-byte rows, bodies never move. `target` is
    * typically tiny next to `raw`; nothing here assumes otherwise.
    * Output: (id, n_feats, weight), ordered by id. */
  def importanceWeights(raw: DataFrame, target: DataFrame,
                        buckets: Int = 4096, alpha: Double = 1.0,
                        textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame = {
    require(buckets > 0 && buckets <= 4096,
      s"buckets $buckets must be in (0, 4096] (3 hex digits)")
    require(alpha > 0, "need alpha > 0 (unseen buckets must smooth)")
    val toks = TextOps.tokens(col(textCol))
    val bigrams = when(size(toks) < 2, array().cast("array<string>"))
      .otherwise(zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => concat(a, lit(" "), b)))
    val grams = concat(toks, bigrams)
    def features(df: DataFrame) = df.select(col(idCol),
        posexplode(grams).as(Seq("pos", "gram")))
      .select(col(idCol), col("pos"),
        (conv(substring(md5(col("gram")), 1, 3), 16, 10)
          .cast(LongType) % buckets).as("bucket"))
    def bucketCounts(feats: DataFrame, cnt: String) =
      feats.groupBy(col("bucket"))
        .agg(count(lit(1)).as(cnt))
    // the raw corpus's hashed-feature rows feed BOTH the bucket-count
    // aggregate and the per-doc ratio regroup below; materialized once
    // (eager localCheckpoint) so the tokenize + per-gram md5 pass —
    // the dominant cost — runs once instead of twice (guide §2.4).
    // (id, pos, bucket) rows only: bodies never materialize.
    val rawFeats = features(raw).localCheckpoint(true)
    val ct = bucketCounts(features(target), "c_t")
    val cr = bucketCounts(rawFeats, "c_r")
    // full outer: a bucket seen in only one corpus still needs its
    // smoothed ratio (that asymmetry IS the signal)
    val aB = alpha * buckets
    // n_t / n_r are the corpora's TOTAL feature counts — which are
    // exactly Σ c_t / Σ c_r over the bucket table already in hand.
    // Summing the ≤`buckets`-row counts (one global window over a
    // tiny frame) replaces two further full-corpus tokenize+hash
    // scans (measured: q127 3.1 → ~1.8 s at sf0.1); integer sums, so
    // the smoothed ratios are bit-identical.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1))
    val ratios = ct.join(cr, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("c_t"), lit(0L)).as("c_t"),
        coalesce(col("c_r"), lit(0L)).as("c_r"))
      .withColumn("n_t", sum(col("c_t")).over(w))
      .withColumn("n_r", sum(col("c_r")).over(w))
      .select(col("bucket"),
        (((col("c_t").cast(DoubleType) + lit(alpha))
            / (col("n_t").cast(DoubleType) + lit(aB)))
          / ((col("c_r").cast(DoubleType) + lit(alpha))
            / (col("n_r").cast(DoubleType) + lit(aB)))).as("ratio"))
    rawFeats.join(broadcast(ratios), "bucket")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"),
        aggregate(array_sort(collect_list(struct(col("pos"), col("ratio")))),
          lit(0.0), (acc, x) => acc + x.getField("ratio")).as("__sum"))
      .select(col(idCol), col("n_feats"),
        (col("__sum") / col("n_feats").cast(DoubleType)).as("weight"))
      .orderBy(idCol)
  }

  /** DSIR step 2 — importance RESAMPLING: draw a k-doc sample from
    * the raw corpus with inclusion probability ∝ importance weight,
    * so the selected subset's n-gram profile tilts toward the
    * target's. Deterministic end to end: weights quantize to
    * fixed-point longs (floor(w·2²⁰ + 0.5) — integer cumsums are
    * order-independent where double cumsums are not) and feed the
    * systematic-PPS grid of [[TextOps.ppsSample]] — the id-ordered
    * cumulative-weight line cut at k equal steps, Madow's method: no
    * RNG, replayable on any engine, and heavy docs can be picked
    * more than once (n_picks is the multiplicity, as in q64/q113).
    *
    * Scale shape: the weight stage is [[importanceWeights]]; the
    * grid adds one cumsum window over (id, weight) rows — bodies
    * stay put. Output: (id, weight [quantized], n_picks > 0),
    * ordered by id. */
  def importanceResample(raw: DataFrame, target: DataFrame, k: Int,
                         buckets: Int = 4096, alpha: Double = 1.0,
                         textCol: String = "text",
                         idCol: String = "doc_id"): DataFrame = {
    val Q = 1048576.0
    val qw = importanceWeights(raw, target, buckets, alpha, textCol,
        idCol)
      .select(lit("all").as("__s"), col(idCol),
        floor(col("weight") * lit(Q) + lit(0.5)).cast(LongType)
          .as("wq"))
    TextOps.ppsSample(qw, k, "wq", stratumCol = "__s", idCol = idCol)
      .select(col(idCol), col("weight"), col("n_picks"))
      .orderBy(idCol)
  }
}
