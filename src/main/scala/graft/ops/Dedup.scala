package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact
  * (content-hash), MinHash+LSH near-dup, SimHash, and n-gram Jaccard
  * verification. Designed for the 100 TB shape:
  *
  *  - signatures are computed columnar (array transforms over the
  *    token array — no explode until the LSH band join, no UDFs);
  *  - candidate generation shuffles only (band_id, band_hash) pairs,
  *    never document text;
  *  - bucket joins cap bucket size ([[maxBucket]]) so a degenerate
  *    band (boilerplate text) cannot produce a quadratic explosion —
  *    the standard guard against LSH skew;
  *  - exact Jaccard verification joins only the candidate pairs back
  *    to the (broadcastable-or-bucketed) token sets.
  */
object Dedup {

  /** The shingle length every stage of the near-dup stack shares —
    * candidates hash n-shingles, so verification MUST grade n-shingle
    * Jaccard with the same n (a mismatch silently breaks the recall
    * bound; round-4 lesson). One constant so the alignment is
    * structural, not three literals that can drift. */
  val ShingleLen: Int = 3

  /** Exact dedup by content hash: keep the smallest doc_id per
    * distinct text. At scale this shuffles (hash, doc_id) only —
    * never the document body. */
  def exactByHash(docs: DataFrame, textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame = {
    val h = md5(col(textCol))
    docs
      .withColumn("text_hash", h)
      .withColumn("keep_id",
        min(col(idCol)).over(Window.partitionBy("text_hash")))
      .filter(col(idCol) === col("keep_id"))
      .select(col(idCol), col("text_hash"))
      .orderBy(idCol)
  }

  /** MinHash signature in ONE pass: shingle strings are hashed once
    * (`xxhash64`), then the k affine permutations run inside the
    * codegen'd [[graft.functions.MinHashFromHashes]] expression — a
    * tight |shingles|×k long-arithmetic loop. Two earlier
    * formulations were each ~k× slower: k×`array_min(transform(...))`
    * re-hashes every shingle string k times (CollapseProject inlines
    * the shared subtree), and an `aggregate`+`zip_with` fold
    * interprets its lambda body per (shingle, permutation). */
  def minHashSignature(text: Column, numHashes: Int = 64,
                       shingleLen: Int = ShingleLen): Column =
    graft.functions.TextExpressions.minhash_from_hashes(
      transform(TextOps.shingles(text, shingleLen), xxhash64(_)),
      numHashes)

  /** LSH banding of a MinHash signature: rows (doc_id, band_id,
    * band_hash). bands*rowsPerBand must equal the signature length. */
  def lshBands(docs: DataFrame, bands: Int, rowsPerBand: Int,
               idCol: String = "doc_id",
               sigCol: String = "minhash"): DataFrame = {
    val bandStructs = array((0 until bands).map { b =>
      struct(
        lit(b).as("band_id"),
        xxhash64(array_join(
          transform(slice(col(sigCol), b * rowsPerBand + 1, rowsPerBand),
            _.cast("string")), ",")).as("band_hash"))
    }: _*)
    docs.select(col(idCol), explode(bandStructs).as("band"))
      .select(col(idCol), col("band.band_id"), col("band.band_hash"))
  }

  /** All-pairs cap per LSH bucket: buckets up to this size expand to
    * every pair; larger buckets fall back to O(n) star pairs against
    * the minimum id (functions.LongArrayPairs) — boilerplate floods
    * still dedup against their canonical doc without a quadratic
    * blow-up. */
  val maxBucket = 50

  /** Candidate near-dup pairs via MinHash LSH: docs sharing any band
    * bucket. Returns distinct (id_a, id_b) with id_a < id_b.
    *
    * Shape: one codegen'd expression computes shingle-hash →
    * signature → band hashes per document (a separate signature
    * column gets re-inlined into every band expression by
    * CollapseProject — k× the work; measured as the dominant cost);
    * ONE shuffle (groupBy band bucket, map-side combined); pairs
    * expanded in-row by the codegen'd LongArrayPairs — all pairs up
    * to [[maxBucket]], star pairs beyond it. */
  def minHashCandidates(docs: DataFrame, numHashes: Int = 64,
                        bands: Int = 16, textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    import graft.functions.TextExpressions._
    docs.select(col(idCol),
        posexplode(minhash_bands(TextOps.tokens(col(textCol)),
          numHashes, bands, ShingleLen)))
      .withColumnRenamed("pos", "band_id")
      .withColumnRenamed("col", "band_hash")
      .groupBy("band_id", "band_hash")
      .agg(collect_list(col(idCol)).as("ids"))
      .filter(size(col("ids")) >= 2)
      .select(explode(long_array_pairs(col("ids"), maxBucket)).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()
  }

  /** Exact Jaccard similarity for candidate pairs. `shingleLen` = 0
    * compares distinct-TOKEN sets (order-blind — the q27 baseline's
    * measure); n > 0 compares distinct n-token SHINGLE sets — the
    * standard w-shingling near-dup measure, and the SAME item family
    * the MinHash signature hashes, so candidates and verification
    * grade one quantity (verifying a shingle-LSH candidate with
    * token-set Jaccard silently under-delivers the threshold
    * contract: this corpus has 30k token-set-0.8 pairs but far fewer
    * shingle-0.8 ones). `candidates` carries (id_a, id_b). */
  def jaccardVerify(candidates: DataFrame, docs: DataFrame,
                    textCol: String = "text",
                    idCol: String = "doc_id",
                    shingleLen: Int = 0): DataFrame = {
    val items =
      if (shingleLen == 0) TextOps.tokenSetSorted(col(textCol))
      else graft.functions.TextExpressions.sorted_distinct_shingles(
        TextOps.tokens(col(textCol)), shingleLen)
    // materialized once: both verify joins (id_a, id_b) consume the
    // sets — un-checkpointed, the tokenize+shingle corpus pass is
    // planned (and run) twice (guide §2.4)
    val sets = docs.select(col(idCol), items.as("toks"))
      .localCheckpoint(true)
    candidates
      .join(sets.select(col(idCol).as("id_a"), col("toks").as("toks_a")), "id_a")
      .join(sets.select(col(idCol).as("id_b"), col("toks").as("toks_b")), "id_b")
      .withColumn("n_inter",
        graft.functions.TextExpressions.sorted_intersect_count(
          col("toks_a"), col("toks_b")))
      .withColumn("jaccard",
        col("n_inter").cast("double") /
          (size(col("toks_a")) + size(col("toks_b")) - col("n_inter")))
      .select("id_a", "id_b", "jaccard")
  }

  /** Near-dup dedup: drop the higher doc_id of every verified pair
    * (SHINGLE Jaccard ≥ threshold — the same [[ShingleLen]]-token
    * shingle family the candidate signature hashes, so the LSH miss
    * probability for a qualifying pair is the banding bound
    * ((1−j^4)^16 ≈ 0.022% at j = 0.8 with 16×4), not an unrelated
    * measure's); return surviving ids. */
  def minHashDedup(docs: DataFrame, threshold: Double = 0.8,
                   textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
    val dup = jaccardVerify(minHashCandidates(docs, textCol = textCol,
        idCol = idCol), docs, textCol, idCol, shingleLen = ShingleLen)
      .filter(col("jaccard") >= threshold)
      .select(col("id_b").as(idCol)).distinct()
    docs.select(col(idCol)).distinct()
      .join(dup, Seq(idCol), "left_anti")
      .orderBy(idCol)
  }

  /** The banded-signature rows of a corpus: (id, band_id, band_hash)
    * from ONE codegen'd pass over each document (the same
    * minhash_bands expression [[minHashCandidates]] uses, so an index
    * built here and a batch run agree on every band hash). */
  private def bandRows(docs: DataFrame, numHashes: Int, bands: Int,
                       textCol: String, idCol: String): DataFrame = {
    import graft.functions.TextExpressions._
    docs.select(col(idCol),
        posexplode(minhash_bands(TextOps.tokens(col(textCol)),
          numHashes, bands, ShingleLen)))
      .select(col(idCol), col("pos").cast("int").as("band_id"),
        col("col").as("band_hash"))
  }

  /** Sorted distinct [[ShingleLen]]-shingle set — the verification
    * payload every stage of the stack grades (codegen'd one-pass
    * window-join + TreeSet; byte-identical to the composable
    * array_sort(array_distinct(shingles)) chain it replaces). */
  private def shingleSet(textCol: String): Column =
    graft.functions.TextExpressions.sorted_distinct_shingles(
      TextOps.tokens(col(textCol)), ShingleLen)

  /** Persist a corpus's LSH index: `indexDir/bands` holds
    * (id, band_id, band_hash) with each bucket capped at [[maxBucket]]
    * smallest ids (a boilerplate flood costs 50 rows per band, not the
    * flood). Degradation mode vs the batch star-cap, precisely: the
    * stored 50 smallest ids always INCLUDE the bucket minimum — the
    * only id batch star pairs reach in a flooded bucket — so for every
    * bucket state (flooded or not, before or after shard arrivals) the
    * candidate pairs [[dedupAgainstIndex]] derives are a SUPERSET of
    * the pairs batch [[minHashCandidates]] would derive over
    * (indexed ∪ shard). Since verification is exact, extra candidates
    * can only convert cap-missed true near-dups into drops: incremental
    * dedup is at least as aggressive as batch, never less, and exactly
    * equal when no bucket exceeds [[maxBucket]]
    * (IncrementalDedupSpec proves both: equality on the clean corpus,
    * one-sided containment on a planted flooded bucket). This is a
    * recall BOUND under flooding, not an unconditional equivalence.
    * `indexDir/shingles` holds
    * `indexDir/shingles` holds each document's sorted distinct shingle
    * set — the exact-verification payload, so dedup against the index
    * never re-reads the original corpus. This is the operational shape
    * at 100 TB: the corpus is indexed ONCE; each incoming shard joins
    * the stored bands (shuffle of the shard's band keys + a pruned
    * index read — at warehouse scale, bucket both tables by band_hash
    * to make it co-located) instead of re-scanning 100 TB per shard. */
  def buildLshIndex(docs: DataFrame, indexDir: String,
                    numHashes: Int = 64, bands: Int = 16,
                    textCol: String = "text",
                    idCol: String = "doc_id"): Unit = {
    val w = Window.partitionBy("band_id", "band_hash").orderBy(col(idCol))
    bandRows(docs, numHashes, bands, textCol, idCol)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxBucket).drop("__rn")
      .write.mode("overwrite").parquet(s"$indexDir/bands")
    docs.select(col(idCol), shingleSet(textCol).as("shingles"))
      .write.mode("overwrite").parquet(s"$indexDir/shingles")
  }

  /** Incremental near-dup dedup of a new shard against a persisted
    * [[buildLshIndex]] index — no corpus re-scan. A new document is
    * dropped iff exact shingle Jaccard ≥ threshold against (a) ANY
    * indexed document (the index is canonical — indexed docs are never
    * dropped) or (b) a lower-id document of its own shard (the batch
    * drop rule within the shard). With every previously-seen doc
    * indexed and shard ids above index ids, this equals
    * [[minHashDedup]] over (indexed ∪ shard) restricted to the shard —
    * the IncrementalDedupSpec theorem — while reading only the
    * shard + the index. Under bucket flooding the relation weakens to
    * one-sided containment (index-path survivors ⊆ batch survivors;
    * see [[buildLshIndex]]) — it drops MORE, never less.
    *
    * Shape: shard bands join stored bands on (band_id, band_hash) —
    * ids only; shingle sets are attached once per distinct surviving
    * candidate pair (the shard's inline, the index side via its pruned
    * shingles table). Returns surviving shard ids. */
  def dedupAgainstIndex(newDocs: DataFrame, indexDir: String,
                        threshold: Double = 0.8,
                        numHashes: Int = 64, bands: Int = 16,
                        textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame = {
    val spark = newDocs.sparkSession
    val idxBands = spark.read.parquet(s"$indexDir/bands")
    val idxShingles = spark.read.parquet(s"$indexDir/shingles")
    val newBands = bandRows(newDocs, numHashes, bands, textCol, idCol)
    val crossCand = newBands.select(col(idCol).as("new_id"),
        col("band_id"), col("band_hash"))
      .join(idxBands.select(col(idCol).as("old_id"),
        col("band_id"), col("band_hash")), Seq("band_id", "band_hash"))
      .select("new_id", "old_id").distinct()
    val newSets = newDocs.select(col(idCol).as("new_id"),
      shingleSet(textCol).as("sh_new"))
    val crossDup = crossCand
      .join(newSets, "new_id")
      .join(idxShingles.select(col(idCol).as("old_id"),
        col("shingles").as("sh_old")), "old_id")
      .withColumn("n_inter",
        graft.functions.TextExpressions.sorted_intersect_count(
          col("sh_new"), col("sh_old")))
      .filter(col("n_inter").cast("double") /
        (size(col("sh_new")) + size(col("sh_old")) - col("n_inter"))
        >= threshold)
      .select(col("new_id").as(idCol))
    val withinDup = jaccardVerify(
        minHashCandidates(newDocs, numHashes, bands, textCol, idCol),
        newDocs, textCol, idCol, shingleLen = ShingleLen)
      .filter(col("jaccard") >= threshold)
      .select(col("id_b").as(idCol))
    newDocs.select(col(idCol)).distinct()
      .join(crossDup.unionByName(withinDup).distinct(), Seq(idCol),
        "left_anti")
      .orderBy(idCol)
  }

  /** All (id_a < id_b) pairs with their token-set Jaccard — the
    * shared bounded brute-force kernel of [[jaccardTopPairs]] and
    * [[jaccardHistogram]] (one definition, so the two artifacts can
    * never silently disagree on the pair measure). */
  private def allPairsJaccard(docs: DataFrame, textCol: String,
                              idCol: String): DataFrame = {
    // materialized once: both cross-join sides consume the token
    // sets — un-checkpointed, the tokenize pass runs twice (guide §2.4)
    val sets = docs.select(col(idCol),
      TextOps.tokenSetSorted(col(textCol)).as("toks"))
      .localCheckpoint(true)
    val a = sets.select(col(idCol).as("id_a"), col("toks").as("toks_a"))
    val b = sets.select(col(idCol).as("id_b"), col("toks").as("toks_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("n_inter",
        graft.functions.TextExpressions.sorted_intersect_count(
          col("toks_a"), col("toks_b")))
      .withColumn("jaccard",
        col("n_inter").cast("double") /
          (size(col("toks_a")) + size(col("toks_b")) - col("n_inter")))
      .select("id_a", "id_b", "jaccard")
  }

  /** Exact all-pairs n-gram Jaccard top-N — the brute-force baseline
    * (O(N²): fine for corpus samples / oracle checks; the scale path
    * is [[minHashCandidates]] + [[jaccardVerify]]). Deterministic
    * total order: (jaccard desc, id_a, id_b). */
  def jaccardTopPairs(docs: DataFrame, topN: Int,
                      textCol: String = "text",
                      idCol: String = "doc_id"): DataFrame =
    allPairsJaccard(docs, textCol, idCol)
      .orderBy(col("jaccard").desc, col("id_a"), col("id_b"))
      .limit(topN)

  /** Pairwise-similarity HISTOGRAM — the threshold-tuning artifact a
    * dedup rollout reads before committing to a cutoff: how many
    * pairs sit in each Jaccard bucket, i.e. how many more dups a
    * 0.75 threshold would catch than 0.8, and whether a boilerplate
    * mode lurks at 0.5. Like [[jaccardTopPairs]] this is the
    * BOUNDED brute-force baseline (all pairs of a deterministic
    * sample — in practice thresholds are tuned on a sample anyway);
    * the unbounded production path stays LSH candidates + verify.
    * Buckets are floor(j·(1/width)) with j ∈ [0,1], so bucket_lo =
    * bucket·width and exact-duplicate pairs land in the final
    * closed bucket [1.0, 1.0]. Output: (bucket_lo, n_pairs), only
    * non-empty buckets, ascending. */
  def jaccardHistogram(docs: DataFrame, buckets: Int = 20,
                       textCol: String = "text",
                       idCol: String = "doc_id"): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    allPairsJaccard(docs, textCol, idCol)
      .select(floor(col("jaccard") * lit(buckets.toDouble))
        .cast("long").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n_pairs"))
      .select((col("bucket").cast("double") / lit(buckets.toDouble))
        .as("bucket_lo"), col("n_pairs"))
      .orderBy("bucket_lo")
  }

  /** SimHash-64 of the token array, computed columnar: for each bit
    * position, sum the ±1 contributions of every token's xxhash64 bit;
    * bit set iff the sum is positive. `aggregate` + `zip_with` keep it
    * one pass over the tokens with a 64-slot accumulator — no shuffle,
    * no UDF. */
  def simHash(text: Column): Column =
    // codegen'd tight loop (functions.SimHash64). The composable
    // formulation — aggregate over zip_with with 64 literal bit
    // masks — is semantically identical (TextDedupSpec asserts
    // equality against it as a model) but interprets 64 array
    // lambdas per token and bloats the plan; measured q65 3.35s →
    // 1.25s at sf0.1 from this swap alone.
    graft.functions.TextExpressions.simhash64(TextOps.tokens(text))

  /** [[simHash]]'s md5-derived, DuckDB-replayable twin (see
    * [[graft.functions.SimHashMd5]]) — the oracle-gate path;
    * xxhash64 stays the production default. */
  def simHashMd5(text: Column): Column =
    graft.functions.TextExpressions.simhash_md5(TextOps.tokens(text))

  /** SimHash near-dup candidates: exact match on any of 4 16-bit
    * blocks (≤ 3-bit Hamming distance guarantee via pigeonhole when
    * combined with verification). */
  def simHashCandidates(docs: DataFrame, textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame =
    simHashCandidatesFromSig(
      docs.select(col(idCol), simHash(col(textCol)).as("simhash")), idCol)

  /** The 4×16-bit block index over an already-computed (id, simhash)
    * frame — shared by the xxhash64 and md5 signature paths. */
  private def simHashCandidatesFromSig(sig: DataFrame,
                                       idCol: String): DataFrame = {
    val blocks = array((0 until 4).map { b =>
      struct(lit(b).as("block_id"),
        shiftright(col("simhash"), b * 16).bitwiseAND(0xFFFFL).as("block"))
    }: _*)
    val banded = sig.select(col(idCol), col("simhash"),
        explode(blocks).as("blk"))
      .select(col(idCol), col("simhash"),
        col("blk.block_id"), col("blk.block"))
    // same no-self-join shape as minHashCandidates: carry (id, sig)
    // structs through the bucket so the simHash aggregate — the
    // dominant per-doc cost — is computed ONCE (joining the lazy sig
    // plan back would re-evaluate it per join). All pairs up to
    // maxBucket; star pairs against the min id beyond it.
    val entries = banded.groupBy("block_id", "block")
      .agg(collect_list(struct(col(idCol), col("simhash"))).as("es"))
      .filter(size(col("es")) >= 2)
    val sorted = array_sort(col("es"))  // struct sort = by id first
    def pairStruct(x: Column, y: Column) = struct(
      x.getField(idCol).as("id_a"),
      y.getField(idCol).as("id_b"),
      bit_count(x.getField("simhash")
        .bitwiseXOR(y.getField("simhash"))).as("hamming"))
    val allPairs = flatten(transform(sorted, (x, i) =>
      transform(slice(sorted, i + 2, size(sorted)), y => pairStruct(x, y))))
    val starPairs = transform(slice(sorted, lit(2), size(sorted)),
      y => pairStruct(element_at(sorted, 1), y))
    entries
      .select(explode(when(size(sorted) <= maxBucket, allPairs)
        .otherwise(starPairs)).as("p"))
      .select(col("p.id_a"), col("p.id_b"), col("p.hamming"))
      .distinct()
  }

  /** SimHash near-dup dedup: drop the higher doc_id of every
    * candidate pair within `maxHamming` signature bits. For
    * maxHamming ≤ 3 the 4×16-bit block index is EXHAUSTIVE
    * (pigeonhole: ≤3 flipped bits cannot touch all 4 blocks), so —
    * unlike MinHash banding — there is no probabilistic miss:
    * candidates and verification grade the same signature distance
    * by construction, and LSH-fed equals brute-force Hamming dedup
    * exactly (TextDedupSpec), up to `maxBucket` star-pair capping in
    * flooded blocks. */
  def simHashDedup(docs: DataFrame, maxHamming: Int = 3,
                   textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame =
    simHashDedupSig(docs,
      docs.select(col(idCol), simHash(col(textCol)).as("simhash")),
      maxHamming, idCol)

  /** [[simHashDedup]] over md5-derived signatures — identical block
    * index, identical drop rule, but every bit is DuckDB-replayable,
    * so the dedup pipeline itself is oracle-gated (q123). The
    * SimHashMd5Spec carries that gate over to the xxhash64
    * production path: both paths drop every planted dup; the only
    * differences are weakly-similar pairs flipping at the 64-bit
    * sketch's Hamming-3 boundary (≤ 2%, quantified in the spec). */
  def simHashDedupMd5(docs: DataFrame, maxHamming: Int = 3,
                      textCol: String = "text",
                      idCol: String = "doc_id"): DataFrame =
    simHashDedupSig(docs,
      docs.select(col(idCol), simHashMd5(col(textCol)).as("simhash")),
      maxHamming, idCol)

  /** Generic 64-bit-signature Hamming dedup — the [[simHashDedup]]
    * machinery (4×16-bit exhaustive block index, ≤ maxBucket
    * all-pairs / star-capped flooded buckets, drop-higher-id rule)
    * over ANY (id, simhash: long) signature frame: SimHash for text,
    * [[graft.functions.BlockHash64]] for binary payloads
    * (Multimodal.blockHashDedup), or any future 64-bit sketch. `ids`
    * supplies the id universe the survivors are drawn from. */
  def hammingDedupSig(ids: DataFrame, sig: DataFrame,
                      maxHamming: Int = 3,
                      idCol: String = "doc_id"): DataFrame =
    simHashDedupSig(ids, sig, maxHamming, idCol)

  private def simHashDedupSig(docs: DataFrame, sig: DataFrame,
                              maxHamming: Int, idCol: String): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "the 4-block index is exhaustive only up to Hamming 3")
    val dup = simHashCandidatesFromSig(sig, idCol)
      .filter(col("hamming") <= maxHamming)
      .select(col("id_b").as(idCol)).distinct()
    docs.select(col(idCol)).distinct()
      .join(dup, Seq(idCol), "left_anti")
      .orderBy(idCol)
  }

  /** Containment candidate pairs via LOSSLESS prefix filtering
    * (Chaudhuri et al. 2006; the PPJoin family): doc X can only be
    * ≥`threshold`-contained in some Y if X shares at least one of its
    * ⌊(1−θ)·|S(X)|⌋+1 rarest shingles (its "prefix", ordered by
    * global document frequency asc, shingle asc) with Y — if the
    * whole prefix misses, the intersection is capped by the remaining
    * |S(X)|−prefix < θ·|S(X)| shingles. So joining only PREFIX
    * shingles of the contained side against the full inverted index
    * is exhaustive for the containment test, while cutting candidate
    * pairs by ~(1−θ): the rarest shingles have the smallest postings.
    * Unlike MinHash banding (a Jaccard sketch that MISSES
    * low-Jaccard/high-containment pairs — a 40-token quote inside a
    * 400-token page has J ≈ 0.1 but C = 1.0), this candidate cover is
    * exact by construction.
    *
    * Scale shape: the inverted index is one (shingle, id) shuffle of
    * the corpus; df ranking is one count per shingle; the prefix join
    * shuffles only prefix postings against the index. Exact
    * intersection counts then come from the codegen'd merge-intersect
    * over each candidate pair's sorted shingle sets (the q27
    * discipline). Output: (id_a, id_b, n_a, n_b, containment) for
    * every pair with containment(id_a → id_b) ≥ threshold. */
  /** The CANDIDATE stage of [[containmentPairs]] — the distinct
    * (id_a, id_b) pairs the lossless prefix cover emits before exact
    * verification. Public because candidate volume IS the cost model
    * of this family (∝ Σ df(prefix shingles)): profilers and capacity
    * planning count it directly (ProfileContainmentZipf measures it
    * under worst-case-uniform vs Zipfian vocabularies). */
  def containmentCandidates(docs: DataFrame, threshold: Double = 0.8,
                            shingleLen: Int = ShingleLen,
                            textCol: String = "text",
                            idCol: String = "doc_id"): DataFrame =
    containmentCandidatesFrom(
      shingleSetsCk(docs, shingleLen, textCol, idCol), threshold)

  /** The df-ranked inverted index both prefix-filter families probe:
    * (id, s, df, n_a, pos). NOT checkpointed: although both join
    * sides (probe prefix, index prefix) derive from it, the two
    * shuffles below it are identical and AQE reuses the map stages at
    * runtime — measured: materializing it instead cost +0.5-0.9 s per
    * query at sf0.1 (the exploded inverted index is the largest frame
    * in the family; the window recompute above the reused exchange is
    * cheaper than writing the rows out). */
  private def rankedFrom(sets: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val inv = sets.select(col("id"), explode(col("sh")).as("s"))
    inv.withColumn("df",
        count(lit(1)).over(Window.partitionBy("s")))
      .withColumn("n_a", count(lit(1)).over(Window.partitionBy("id")))
      .withColumn("pos", row_number().over(
        Window.partitionBy("id").orderBy(col("df"), col("s"))))
  }

  private def containmentCandidatesFrom(sets: DataFrame,
                                        threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1, "need 0 < threshold <= 1")
    // rarest-first prefix of the CONTAINED side: rank each doc's
    // shingles by (df asc, shingle asc); prefix size n−⌈θ·n⌉+1
    // (≡ ⌊(1−θ)n⌋+1 in exact arithmetic — the integer form with a
    // 1e-6 slack inside the ceil so FP rounding can only ENLARGE the
    // prefix: floor((1−θ)·n) in doubles lands BELOW the lossless
    // bound whenever (1−θ)n is an exact integer, e.g. θ=0.8, n=10
    // → 1.9999… → a one-short prefix that silently misses pairs)
    val ranked = rankedFrom(sets)
    val prefix = ranked.filter(
      col("pos") <= col("n_a") -
        ceil(lit(threshold) * col("n_a").cast("double") - lit(1e-6))
          .cast("long") + 1)
    // size lower bound, also lossless: C(A→B) ≥ θ ⟹ |B| ≥ |A∩B| ≥
    // ⌈θ·|A|⌉ — prunes candidates against small B before the pair
    // distinct (measured 32.5 → 26.3 s at the 50k worst-case corpus;
    // the uniform synthetic doc lengths blunt it — real corpora's
    // length spread prunes much harder)
    val idx = ranked.select(col("id").as("id_b"), col("s"),
      col("n_a").as("n_b"), col("pos").as("pos_b"))
    prefix.select(col("id").as("id_a"), col("s"),
        col("n_a"), col("pos").as("pos_a"))
      .join(idx, Seq("s"))
      .filter(col("id_a") =!= col("id_b") &&
        col("n_b") >= ceil(lit(threshold) * col("n_a").cast("double")
          - lit(1e-6)).cast("long"))
      // positional filter (see [[jaccardCandidates]]): at the pair's
      // first common prefix shingle, overlap ≤ 1 + min(remaining_a,
      // remaining_b), and containment ≥ θ needs overlap ≥ θ·n_a.
      // Lossless per-row: the bound only shrinks with position.
      .filter(lit(1) +
        least(col("n_a") - col("pos_a"), col("n_b") - col("pos_b")) >=
        ceil(lit(threshold) * col("n_a").cast("double") - lit(1e-6))
          .cast("long"))
      .select("id_a", "id_b").distinct()
  }

  /** Jaccard-tight candidate pairs (PPJoin, Xiao et al. 2011),
    * canonical (id_a < id_b), lossless for J ≥ `threshold`:
    *   - probe only from the SMALLER set of each pair (J ≥ θ ⟹
    *     min/max set sizes ≥ θ, so the smaller side's view suffices);
    *   - Jaccard prefix: |A∩B| ≥ 2θ/(1+θ)·|A| when |B| ≥ |A|, so if
    *     A's ⌊(1−θ)/(1+θ)·|A|⌋+1 rarest shingles all miss B the pair
    *     cannot qualify — a (1−θ)/(1+θ) prefix vs the containment
    *     cover's (1−θ): at θ=0.4 that's 0.43·n vs 0.6·n of the
    *     postings probed;
    *   - size band |A| ≤ |B| ≤ |A|/θ.
    * The slack discipline matches [[containmentCandidates]]: the
    * 1e-6 inside ceil can only ENLARGE the prefix/band. */
  def jaccardCandidates(docs: DataFrame, threshold: Double = 0.8,
                        shingleLen: Int = ShingleLen,
                        textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame =
    jaccardCandidatesFrom(
      shingleSetsCk(docs, shingleLen, textCol, idCol), threshold)

  private def jaccardCandidatesFrom(sets: DataFrame,
                                    threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1, "need 0 < threshold <= 1")
    val ranked = rankedFrom(sets)
    val alpha = ceil(
      lit(2 * threshold / (1 + threshold)) * col("n_a").cast("double")
        - lit(1e-6)).cast("long")
    val prefix = ranked.filter(col("pos") <= col("n_a") - alpha + 1)
    // INDEX-SIDE prefix (the other half of PPJoin): the indexed side
    // is the larger set, so the size band n_a ≥ θ·n_b gives overlap
    // α ≥ θ/(1+θ)·(n_a+n_b) ≥ θ·n_b, hence B's prefix of length
    // n_b − ⌈θ·n_b⌉ + 1 must contain a common element whenever the
    // pair qualifies (prefix-filter theorem: the (n−α+1)-prefixes of
    // BOTH sides intersect). Indexing all of B generated Σ df_probe·
    // df_all join rows; indexing B's prefix only counts docs whose
    // RAREST shingles include s — common shingles almost never land
    // in a rarest-first prefix, so both join-side dfs collapse
    // (measured: q138 candidate join 2.6× smaller at θ=0.4). The
    // equal-size direction stays covered: both orientations are
    // generated, and each side's restricted prefix still contains the
    // theorem's (n−α+1)-prefix.
    val idx = ranked.filter(col("pos") <= col("n_a") -
        ceil(lit(threshold) * col("n_a").cast("double") - lit(1e-6))
          .cast("long") + 1)
      .select(col("id").as("id_b"), col("s"),
        col("n_a").as("n_b"), col("pos").as("pos_b"))
    prefix.select(col("id").as("id_a"), col("s"), col("n_a"),
        col("pos").as("pos_a"))
      .join(idx, Seq("s"))
      .filter((col("n_b") > col("n_a") ||
          (col("n_b") === col("n_a") && col("id_b") =!= col("id_a"))) &&
        col("n_b").cast("double") <=
          col("n_a").cast("double") / lit(threshold) + lit(1e-6))
      // POSITIONAL filter (the PPJoin refinement that makes prefix
      // filtering survive Zipfian vocabularies): both ranked lists
      // share one global (df, shingle) order, so at a pair's FIRST
      // common prefix shingle the overlap is ≤ 1 + min(remaining_a,
      // remaining_b); a qualifying pair needs overlap ≥
      // θ/(1+θ)·(n_a+n_b). Common shingles rank LATE in both lists —
      // exactly the candidate mass this bound kills. Per-row filtering
      // is lossless: bounds shrink with position, so if any generating
      // row passes, the first-match row passes.
      .filter(lit(1) +
        least(col("n_a") - col("pos_a"), col("n_b") - col("pos_b")) >=
        ceil(lit(threshold / (1 + threshold)) *
          (col("n_a") + col("n_b")).cast("double") - lit(1e-6)).cast("long"))
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
      .distinct()
  }

  /** ONE materialized pass computing each doc's sorted distinct
    * shingle set — the shared input of candidate generation AND
    * verification. Eager localCheckpoint: without it every plan
    * branch that mentions the sets (the candidate prefix side, the
    * candidate index side, the id_a verify join, the id_b verify
    * join) re-runs the tokenize+shingle scan — q112's before-plan
    * carried SIX full document scans, each with the
    * sorted_distinct_shingles expression additionally re-computed
    * inside Generate's inferred size()>0 filter (guide §2.4 "remove
    * shuffles/passes outright", §8 "make every pass but the last
    * operate on a computed-once proxy"). At 100 TB this is the
    * fingerprint-table materialization of guide §8 step 1. */
  private def shingleSetsCk(docs: DataFrame, shingleLen: Int,
                            textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
      graft.functions.TextExpressions.sorted_distinct_shingles(
        TextOps.tokens(col(textCol)), shingleLen).as("sh"))
      .localCheckpoint(true)

  /** Dictionary-encoded shingle sets for pair VERIFICATION (Vernica
    * et al. 2010's token-ordering step): each distinct shingle maps
    * to a dense long id, each doc to the SORTED long array of its
    * shingles' ids. Intersection counts — hence containment and
    * Jaccard — are invariant under the bijection, and the long
    * arrays are ~3× lighter than UTF8String arrays through the two
    * verify joins, which is where the exact-join stages spend their
    * time (carried array bytes, not compares: measured q138 verify
    * 3.7 → 1.4 s at sf0.1). The dictionary window is single-
    * partition but VOCAB-bounded (distinct shingles, not corpus
    * rows); at the 100 TB shape the same ids come from a distributed
    * sort + per-partition offsets — the ordering itself carries no
    * semantics, any bijection works. Input `sets` is an
    * already-materialized [[shingleSetsCk]] frame; the result is
    * checkpointed as well because both verify joins (id_a, id_b)
    * consume it — un-checkpointed, the vocab dictionary window and
    * the per-doc regroup would each run twice. */
  private def encodedSetsFrom(sets: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val inv = sets.select(col("id"), explode(col("sh")).as("s"))
    val dict = inv.select("s").distinct()
      .withColumn("sid",
        row_number().over(Window.orderBy("s")).cast("long"))
    inv.join(dict, "s")
      .groupBy("id")
      .agg(sort_array(collect_list(col("sid"))).as("sh"))
      .localCheckpoint(true)
  }

  def containmentPairs(docs: DataFrame, threshold: Double = 0.8,
                       shingleLen: Int = ShingleLen,
                       textCol: String = "text",
                       idCol: String = "doc_id"): DataFrame = {
    // ONE shingle pass feeds candidates AND verification (guide §2.4)
    val shSets = shingleSetsCk(docs, shingleLen, textCol, idCol)
    val sets = encodedSetsFrom(shSets)
    val candIds = containmentCandidatesFrom(shSets, threshold)
    candIds
      .join(sets.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        size(col("sh_a")).cast("long").as("n_a"),
        size(col("sh_b")).cast("long").as("n_b"),
        graft.functions.TextExpressions.sorted_long_intersect_count(
          col("sh_a"), col("sh_b")).cast("long").as("n_inter"))
      .withColumn("containment",
        col("n_inter").cast("double") / col("n_a").cast("double"))
      .filter(col("containment") >= threshold)
  }

  /** EXACT Jaccard similarity join — every unordered pair with
    * shingle Jaccard ≥ `threshold`, with the value. The complement of
    * [[minHashCandidates]]' probabilistic cover: candidates come from
    * the Jaccard-tight lossless [[jaccardCandidates]] prefix cover,
    * verification is the exact merge-intersect. Use this when the
    * dedup contract must be "no qualifying pair missed, period"
    * (takedown/compliance scans) and the banding miss bound, however
    * small, is not acceptable.
    * Output: (id_a < id_b, n_a, n_b, jaccard). */
  def exactJaccardJoin(docs: DataFrame, threshold: Double = 0.8,
                       shingleLen: Int = ShingleLen,
                       textCol: String = "text",
                       idCol: String = "doc_id"): DataFrame = {
    // ONE shingle pass feeds candidates AND verification (guide §2.4)
    val shSets = shingleSetsCk(docs, shingleLen, textCol, idCol)
    val sets = encodedSetsFrom(shSets)
    jaccardCandidatesFrom(shSets, threshold)
      .join(sets.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        size(col("sh_a")).cast("long").as("n_a"),
        size(col("sh_b")).cast("long").as("n_b"),
        graft.functions.TextExpressions.sorted_long_intersect_count(
          col("sh_a"), col("sh_b")).cast("long").as("n_inter"))
      .withColumn("jaccard",
        col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "n_a", "n_b", "jaccard")
      .orderBy("id_a", "id_b")
  }

  /** Contrastive TRIPLET mining — the training-pair builder for an
    * embedding model: for every anchor document that has BOTH a
    * near-duplicate (shingle Jaccard ≥ `posTau` — the positive) and
    * a hard negative (Jaccard in [`negLo`, `negHi`) — similar enough
    * to be informative, dissimilar enough to be a true negative),
    * emit (anchor, positive, negative) with the hardest example of
    * each kind (argmax Jaccard, ties → lowest partner id).
    *
    * Pairs come from ONE [[exactJaccardJoin]] pass at `negLo` — the
    * lossless prefix cover holds at any threshold (lower θ ⇒ larger
    * prefix ⇒ more candidates; the positional filter keeps the
    * Zipfian tail in check). Selection is ONE map-side-combinable
    * groupBy over the symmetrized id+double pair rows — two
    * conditional struct-max argmaxes, so the expensive join subtree
    * evaluates exactly once (the window formulation evaluated it per
    * branch: measured 17 s → 9 s at sf0.1) and bodies never reappear
    * after the join.
    *
    * Determinism: exact Jaccard values; struct-max on
    * (jaccard, −partner) ≡ argmax by (jaccard desc, partner asc) —
    * hash-exact replayable (q138). */
  def tripletMine(docs: DataFrame, posTau: Double = 0.8,
                  negLo: Double = 0.4, negHi: Double = 0.7,
                  shingleLen: Int = ShingleLen,
                  textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame = {
    require(negLo < negHi && negHi <= posTau,
      "need negLo < negHi <= posTau")
    val pairs = exactJaccardJoin(docs, negLo, shingleLen, textCol, idCol)
      .select(col("id_a"), col("id_b"), col("jaccard"))
    // symmetrize by explode, not union: union would plan the whole
    // join subtree twice (the Components.star discipline)
    val sym = pairs.select(explode(array(
        struct(col("id_a").as("anchor"), col("id_b").as("partner"),
          col("jaccard")),
        struct(col("id_b").as("anchor"), col("id_a").as("partner"),
          col("jaccard")))).as("e"))
      .select(col("e.anchor").as("anchor"),
        col("e.partner").as("partner"), col("e.jaccard").as("jaccard"))
    def best(cond: Column): Column =
      max(when(cond, struct(col("jaccard"),
        (-col("partner")).as("np"), col("partner"))))
    sym.groupBy("anchor")
      .agg(best(col("jaccard") >= posTau).as("p"),
        best(col("jaccard") >= negLo && col("jaccard") < negHi).as("n"))
      .filter(col("p").isNotNull && col("n").isNotNull)
      .select(col("anchor").as("anchor_id"),
        col("p.partner").as("pos_id"), col("n.partner").as("neg_id"),
        col("p.jaccard").as("pos_jaccard"),
        col("n.jaccard").as("neg_jaccard"))
      .orderBy("anchor_id")
  }

  /** Cross-source near-dup PROVENANCE audit: for every unordered
    * source pair, the number of verified near-dup pairs straddling
    * it — the monitoring artifact that surfaces scraper overlap,
    * mirror sites, and license contamination between ingest feeds
    * (a large diagonal entry = within-source boilerplate; a large
    * off-diagonal = two feeds shipping the same content). Candidates
    * and verification are the [[minHashDedup]] stack; sources attach
    * to the surviving pairs ids-only, then one tiny groupBy on the
    * canonicalized (min, max) source pair. Output:
    * (source_a, source_b, n_dup_pairs). */
  def crossSourceDups(docs: DataFrame, threshold: Double = 0.8,
                      sourceCol: String = "source",
                      textCol: String = "text",
                      idCol: String = "doc_id"): DataFrame = {
    val verified = jaccardVerify(
        minHashCandidates(docs, textCol = textCol, idCol = idCol),
        docs, textCol, idCol, shingleLen = ShingleLen)
      .filter(col("jaccard") >= threshold)
    val src = docs.select(col(idCol), col(sourceCol))
    verified
      .join(src.select(col(idCol).as("id_a"), col(sourceCol).as("src_a")),
        "id_a")
      .join(src.select(col(idCol).as("id_b"), col(sourceCol).as("src_b")),
        "id_b")
      .select(least(col("src_a"), col("src_b")).as("source_a"),
        greatest(col("src_a"), col("src_b")).as("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_dup_pairs"))
      .orderBy("source_a", "source_b")
  }

  /** Containment dedup — drops docs that are ≥`threshold`-contained
    * in a LARGER doc (shingle-set size; ties → the smaller id is the
    * canonical copy), the doc-inside-doc case Jaccard dedup
    * structurally misses. Candidates from the lossless
    * [[containmentPairs]] prefix filter, so the result is exact, not
    * sketch-bound. Returns surviving ids. */
  def containmentDedup(docs: DataFrame, threshold: Double = 0.8,
                       shingleLen: Int = ShingleLen,
                       textCol: String = "text",
                       idCol: String = "doc_id"): DataFrame = {
    val dup = containmentPairs(docs, threshold, shingleLen, textCol, idCol)
      .filter(col("n_b") > col("n_a") ||
        (col("n_b") === col("n_a") && col("id_b") < col("id_a")))
      .select(col("id_a").as(idCol)).distinct()
    docs.select(col(idCol)).distinct()
      .join(dup, Seq(idCol), "left_anti")
      .orderBy(idCol)
  }
}
