package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed Bloom filter over a column, built and probed with pure
  * column expressions — the explicit, portable form of the runtime
  * bloom-filter join pruning Spark applies to some shuffle joins.
  *
  * The bitmap lives as rows (word: long, bits: long) — m/64 rows, so
  * a 2^22-bit filter is 65k rows ≈ 1 MB: always broadcastable. Build
  * is one map-side-combined aggregate over k positions per input row;
  * shuffle traffic is bounded by the live word count per partition,
  * never the corpus. Probes broadcast-join the bitmap — the corpus is
  * NOT shuffled and NOT re-scanned.
  *
  * The intended use is as a prefilter in front of an exact
  * verification join ([[dedupAgainstCorpus]]): a Bloom filter has NO
  * false negatives (every inserted item's bits are all set), so
  * "definitely new" rows skip the expensive join entirely and false
  * positives only cost a wasted verify probe — the final result is
  * EXACT, which is what makes the operator oracle-checkable.
  *
  * Reference scope note: the reference engine has no membership
  * machinery; this extends the training-data surface (SURVEY.md
  * north star). At 100 TB: dedup of a daily shard against a corpus
  * whose hash table is parquet-bucketed — the bloom prefilter keeps
  * the bucketed join's probe side tiny.
  */
object Bloom {

  /** Default filter geometry: 2^22 bits (64k longs, ~0.5 MB) and 3
    * hashes — false-positive rate (1−e^(−kn/m))^k ≈ 2.7e-8 at
    * n = 10^4, still < 1% at n = 10^6. Tune mBits ∝ corpus size. */
  val DefaultBits: Long = 1L << 22
  val DefaultHashes: Int = 3

  /** k bit positions for a value: pmod(xxhash64(value, seed), m) per
    * seed — k independent-enough hash functions from the one codegen'd
    * hash family, no UDFs. */
  def bitPositions(value: Column, numHashes: Int, mBits: Long): Column =
    array((0 until numHashes).map(seed =>
      pmod(xxhash64(value, lit(seed)), lit(mBits))): _*)

  /** Build the bitmap: rows (word, bits), word = position / 64,
    * bits = OR of the single-bit masks that landed in the word. Words
    * no position touched are absent (a probe treats absent as 0). */
  def build(df: DataFrame, value: Column,
            mBits: Long = DefaultBits,
            numHashes: Int = DefaultHashes): DataFrame =
    df.select(explode(bitPositions(value, numHashes, mBits)).as("__pos"))
      .select(shiftright(col("__pos"), 6).as("word"),
        col("__pos").bitwiseAND(lit(63L)).as("__bit"))
      .groupBy("word")
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(__bit AS INT)))")
        .as("bits"))

  /** Per-row membership probe: (idCol, might_contain) — true iff all
    * k bits are set. The bitmap side is broadcast; the only shuffle is
    * the k-row-per-id groupBy (map-side combined to one row per id).
    * No false negatives; false positives at the geometry's rate. */
  def mightContain(df: DataFrame, value: Column, bloom: DataFrame,
                   idCol: String,
                   mBits: Long = DefaultBits,
                   numHashes: Int = DefaultHashes): DataFrame =
    df.select(col(idCol),
        explode(bitPositions(value, numHashes, mBits)).as("__pos"))
      .select(col(idCol), shiftright(col("__pos"), 6).as("word"),
        col("__pos").bitwiseAND(lit(63L)).as("__bit"))
      .join(broadcast(bloom), Seq("word"), "left")
      .select(col(idCol),
        coalesce(expr("shiftright(bits, CAST(__bit AS INT))"), lit(0L))
          .bitwiseAND(lit(1L)).as("__set"))
      .groupBy(col(idCol))
      .agg((min(col("__set")) === 1L).as("might_contain"))

  /** Bloom-prefiltered incremental EXACT dedup: drop every shard doc
    * whose text already appears in the corpus, or equals a lower-id
    * shard doc's text. Result is identical to the plain exact rule —
    * the bloom stage only routes "definitely new" docs (no bits match
    * possible ⇒ no corpus twin exists) around the corpus-membership
    * join, so at a typical mostly-novel shard only the few candidate
    * docs pay the join at all. Within-shard dedup is the usual
    * min-id-per-md5 window. Returns surviving shard ids. */
  def dedupAgainstCorpus(corpus: DataFrame, shard: DataFrame,
                         textCol: String = "text",
                         idCol: String = "doc_id",
                         mBits: Long = DefaultBits,
                         numHashes: Int = DefaultHashes): DataFrame = {
    val bloom = build(corpus, col(textCol), mBits, numHashes)
    val candidates = mightContain(shard, col(textCol), bloom, idCol,
        mBits, numHashes)
      .filter(col("might_contain")).select(col(idCol))
    // exact membership verify for the candidates only, on md5 keys —
    // the join ships 32-char digests, never document bodies
    val inCorpus = shard.join(candidates, Seq(idCol), "left_semi")
      .select(col(idCol), md5(col(textCol)).as("__h"))
      .join(corpus.select(md5(col(textCol)).as("__h")).distinct(),
        Seq("__h"), "left_semi")
      .select(col(idCol))
    val withinDup = shard
      .withColumn("__keep",
        min(col(idCol)).over(Window.partitionBy(md5(col(textCol)))))
      .filter(col(idCol) =!= col("__keep"))
      .select(col(idCol))
    // materialize the (tiny) dup-id set before the anti-join: the
    // optimizer pushes LeftAnti through a unioned shard
    // (PushdownLeftSemiAntiJoin), cloning the ENTIRE bloom+verify
    // build side once per shard branch — observed 3× the subtree on
    // the q72 plan, zero exchange reuse. A localCheckpoint leaf makes
    // the duplication free (same precedent as Components' per-round
    // checkpoint).
    val dupIds = inCorpus.unionByName(withinDup).distinct()
      .localCheckpoint()
    shard.select(col(idCol)).distinct()
      .join(dupIds, Seq(idCol), "left_anti")
      .orderBy(idCol)
  }
}
