package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting — the train/val/test assignment
  * stage of a training-data pipeline. Hash-based (stateless,
  * reproducible, stable under corpus growth: a doc's split never
  * depends on what else is in the corpus), plus a leakage-safe
  * variant that routes whole NEAR-DUP FAMILIES to one split so a
  * test document can never have a training-set near-duplicate — the
  * classic eval-contamination failure mode exact splitting cannot
  * prevent.
  */
object Split {

  /** Per-split upper boundaries on the first 8 hex chars of
    * md5(salt:id): weights (p₁…pₙ) become cumulative thresholds
    * floor(Σpᵢ·2³²) rendered as zero-padded hex literals. Hex is
    * compared LEXICOGRAPHICALLY, which for fixed-width lowercase hex
    * is numeric order — so both engines decide a split with one
    * string comparison and no integer parsing. */
  private def hexBounds(weights: Seq[(String, Double)]): Seq[(String, String)] = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "need non-empty, positive weights")
    require(math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      "weights must sum to 1")
    require(weights.map(_._1).distinct.size == weights.size,
      "split names must be distinct")
    var cum = 0.0
    weights.init.map { case (name, w) =>
      cum += w
      // clamp: a pathologically tiny last weight can round cum to 1.0,
      // and floor(1.0·2³²) renders as 9 hex chars ('100000000'),
      // breaking the fixed-width lexicographic comparison — every
      // high-hash id would fall past the boundary
      name -> f"${math.min(math.floor(cum * 4294967296.0).toLong, 4294967295L)}%08x"
    }
  }

  /** Deterministic hash split: split(id) = the bucket of
    * substring(md5(salt:id), 1, 8) under the cumulative-weight
    * thresholds. One narrow codegen'd projection — no shuffle, no
    * state, no RNG; at 100 TB it fuses into the scan. Changing
    * `salt` re-rolls every assignment; keeping it fixes each id's
    * split forever (append-only corpora keep their history).
    * Output: (id, split), ordered by id. */
  /** The split decision as a pure COLUMN over `idCol` — what a
    * stateless streaming ingest gate composes directly
    * ([[graft.streaming.GateStream]]); [[hashSplit]] is this plus
    * the presentation sort. */
  def splitColumn(weights: Seq[(String, Double)],
                  salt: String = "graft",
                  idCol: String = "doc_id"): org.apache.spark.sql.Column = {
    val bounds = hexBounds(weights)
    val bucket = substring(
      md5(concat_ws(":", lit(salt), col(idCol).cast("string"))), 1, 8)
    bounds.foldRight(lit(weights.last._1)) {
      case ((name, bound), rest) =>
        when(bucket < lit(bound), lit(name)).otherwise(rest)
    }
  }

  def hashSplit(df: DataFrame, weights: Seq[(String, Double)],
                salt: String = "graft",
                idCol: String = "doc_id"): DataFrame =
    df.select(col(idCol),
      splitColumn(weights, salt, idCol).as("split")).orderBy(idCol)

  /** EXACT stratified split — the eval-set construction primitive
    * [[hashSplit]] deliberately is not: hash splitting is stable
    * under growth but only PROBABILISTICALLY proportional, so a
    * small stratum (a rare language, a tiny source) can land a 2×
    * over- or under-sized eval slice exactly where sizing matters
    * most. Here each stratum allocates floor(n·frac + 0.5) rows to
    * every named split in order, by the shared min-k md5 rank;
    * whatever remains is `train`. On a tiny stratum the rounded
    * targets can sum past n — the cumulative bounds are clamped at
    * n, so the shortfall lands on the LAST splits (then train) in
    * declaration order. Exact per-stratum counts, fully
    * deterministic — the trade is stability: unlike hashSplit,
    * adding rows to a stratum can re-assign earlier ones (ranks
    * shift), so this is for FROZEN snapshots (eval carving), not
    * append-only corpora.
    *
    * Scale shape: one count aggregate broadcast back + one rank
    * window per stratum carrying (id, strata) only. Output:
    * (id, strataCols…, split, strat_rank), ordered by id. */
  def stratifiedSplit(df: DataFrame, fracs: Seq[(String, Double)],
                      strataCols: Seq[String],
                      salt: String = "strat",
                      idCol: String = "doc_id"): DataFrame = {
    require(fracs.nonEmpty && fracs.forall(_._2 > 0),
      "need non-empty, positive fractions")
    require(fracs.map(_._2).sum < 1.0,
      "named fractions must sum below 1 — the remainder is train")
    require((fracs.map(_._1) :+ "train").distinct.size == fracs.size + 1,
      "split names must be distinct and not 'train'")
    require(strataCols.nonEmpty, "need at least one stratum column")
    import org.apache.spark.sql.expressions.Window
    val strata = strataCols.map(col)
    val n = df.groupBy(strata: _*).agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy(strata: _*)
      .orderBy(md5(concat_ws(":", lit(salt), col(idCol).cast("string"))),
        col(idCol))
    // cumulative integer thresholds: each split's target is floored
    // INDEPENDENTLY (so a named split never absorbs another's
    // rounding), then summed exactly. The cumulative bound is clamped
    // at the stratum size: on a tiny stratum the rounded targets can
    // sum past n even when the fractions don't, and the clamp makes
    // the shortfall land on the LAST splits (then train) in
    // declaration order instead of silently misallocating
    val targets = fracs.map { case (_, f) =>
      floor(lit(f) * col("__n").cast("double") + lit(0.5)).cast("long")
    }
    val cums = targets.scanLeft(lit(0L))(_ + _).tail
      .map(c => least(c, col("__n")))
    // null-safe stratum join: the key came OUT of a groupBy, which
    // makes a NULL-stratum class — a plain equi-join would silently
    // drop those rows from the split (the q158/entityResolve lesson)
    val nR = n.select(
      strataCols.map(c => col(c).as(s"__s_$c")) :+ col("__n"): _*)
    val cond = strataCols.map(c => col(c) <=> col(s"__s_$c"))
      .reduce(_ && _)
    df.withColumn("__rn", row_number().over(w))
      .join(broadcast(nR), cond)
      // nesting puts earlier splits outermost, so the FIRST matching
      // cumulative bound wins — rank ranges stay disjoint
      .withColumn("split", fracs.zip(cums).reverse.foldLeft(lit("train")) {
        case (rest, ((name, _), cum)) =>
          when(col("__rn") <= cum, lit(name)).otherwise(rest)
      })
      .select(col(idCol) +: strata :+ col("split") :+
        col("__rn").cast("long").as("strat_rank"): _*)
      .orderBy(idCol)
  }

  /** Leakage-safe split: near-dup clusters (LSH candidates → exact
    * shingle-Jaccard ≥ `threshold` → connected components, the q66
    * stack) are assigned AS UNITS — every member hashes on its
    * cluster's canonical (minimum) id, so DETECTED near-duplicates
    * never straddle train/test. The guarantee is modulo the LSH
    * banding miss bound: a pair the banding never buckets together
    * (probability (1−J^rowsPerBand)^bands at Jaccard J) is invisible
    * to the clustering and can still straddle — run
    * [[splitLeakageAudit]] on the produced assignment as the release
    * gate. Docs with no near-dup partner are their own singleton
    * group and hash on themselves, making the split identical to
    * [[hashSplit]] on a dup-free corpus.
    *
    * Scale shape: the cluster labels cost exactly the q66 pipeline
    * (bucketed candidates, exact verify on survivors, O(log n)
    * star-contraction); the assignment itself is one broadcast-or-id
    * join + the [[hashSplit]] projection. Output:
    * (id, group_id, split), ordered by id. */
  /** Split-leakage AUDIT: for a given split assignment, the number
    * of verified near-dup pairs whose members landed in DIFFERENT
    * splits — the eval-contamination count a release gate checks
    * (it must be 0 for the split train/eval actually uses). Pairs
    * are the q66 candidate+verify stack; the audit tail is two
    * id-only joins + one count per split-pair. Output:
    * (split_a ≤ split_b, n_pairs) including the same-split diagonal,
    * so the total reconciles with the pair count. */
  def splitLeakageAudit(docs: DataFrame, assignment: DataFrame,
                        threshold: Double = 0.8,
                        textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame = {
    val verified = Dedup.jaccardVerify(
        Dedup.minHashCandidates(docs, textCol = textCol, idCol = idCol),
        docs, textCol, idCol, shingleLen = Dedup.ShingleLen)
      .filter(col("jaccard") >= threshold)
    val sp = assignment.select(col(idCol), col("split"))
    verified
      .join(sp.select(col(idCol).as("id_a"), col("split").as("sp_a")),
        "id_a")
      .join(sp.select(col(idCol).as("id_b"), col("split").as("sp_b")),
        "id_b")
      .select(least(col("sp_a"), col("sp_b")).as("split_a"),
        greatest(col("sp_a"), col("sp_b")).as("split_b"))
      .groupBy("split_a", "split_b")
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("split_a", "split_b")
  }

  /** Deterministic EPOCH SHUFFLE + shard manifest — the training-
    * order materialization step of a data pipeline: epoch e's global
    * order is the md5 order of "epoch:e:salt:id" (a fresh
    * content-random permutation every epoch, identical on any
    * engine, cluster size, or rerun — no RNG state to checkpoint),
    * and each doc lands in one of `shards` equal-probability shards
    * via the same hex-threshold machinery as [[splitColumn]] over
    * the SAME key. Because shards are contiguous RANGES of the
    * shuffle key, ordering by (shard, shuffle_key) ≡ ordering by
    * shuffle_key: assignment is a pure narrow projection (fuses into
    * the scan — no global sort, window, or rank), range-partitioning
    * by shuffle_key lands each shard in its own partition run, and
    * the only sort a trainer ever needs is within-shard on read.
    * `shards` must be a power of two so the equal weights are exact
    * binary fractions (1/2ᵏ sums reproduce 1.0 exactly).
    * Output: (id, shuffle_key, shard), ordered by (shard, key, id). */
  def epochOrder(df: DataFrame, shards: Int, epoch: Int,
                 salt: String = "graft",
                 idCol: String = "doc_id"): DataFrame = {
    require(shards > 0 && (shards & (shards - 1)) == 0,
      s"shards $shards must be a power of two (exact binary weights)")
    val w = (0 until shards).map(i => (f"shard_$i%03d", 1.0 / shards))
    val esalt = s"epoch:$epoch:$salt"
    df.select(col(idCol),
        md5(concat_ws(":", lit(esalt), col(idCol).cast("string")))
          .as("shuffle_key"),
        splitColumn(w, esalt, idCol).as("shard"))
      .orderBy("shard", "shuffle_key", idCol)
  }

  def leakageSafeSplit(docs: DataFrame, weights: Seq[(String, Double)],
                       salt: String = "graft",
                       threshold: Double = 0.8,
                       textCol: String = "text",
                       idCol: String = "doc_id"): DataFrame = {
    val verified = Dedup.jaccardVerify(
        Dedup.minHashCandidates(docs, textCol = textCol, idCol = idCol),
        docs, textCol, idCol, shingleLen = Dedup.ShingleLen)
      .filter(col("jaccard") >= threshold)
    val cc = Components.connectedComponents(verified,
      srcCol = "id_a", dstCol = "id_b")
    val grouped = docs.select(col(idCol))
      .join(cc.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("group_id"))
    val assigned = hashSplit(
      grouped.select(col("group_id")).distinct(),
      weights, salt, idCol = "group_id")
    grouped.join(assigned, "group_id")
      .select(col(idCol), col("group_id"), col("split"))
      .orderBy(idCol)
  }
}
