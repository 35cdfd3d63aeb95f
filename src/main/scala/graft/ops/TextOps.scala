package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, shingling, quality scoring, language-ID heuristic,
  * document fingerprinting. All pure column expressions (no UDFs) —
  * whole-stage-codegen'd, shuffle-free, scale linearly with input.
  */
object TextOps {

  /** Whitespace tokenization of a text column. */
  def tokens(text: Column): Column = split(trim(text), " +")

  /** Distinct token set (for Jaccard-style set similarity). */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  /** Sorted distinct token set — the input contract of the codegen'd
    * merge-intersect (functions.SortedIntersectCount). */
  def tokenSetSorted(text: Column): Column = array_sort(tokenSet(text))

  /** n-word shingles: ["a","b","c","d"] with n=3 →
    * ["a b c", "b c d"]. Documents shorter than n yield one
    * (shorter) shingle. Pure array ops — no explode, no shuffle. */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    transform(
      sequence(lit(0), greatest(size(toks) - n, lit(0))),
      i => array_join(slice(toks, i + 1, lit(n)), " "))
  }

  /** Per-document token statistics: token count, char count. */
  def tokenStats(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(
      col("doc_id"),
      size(tokens(col(textCol))).cast(LongType).as("n_tokens"),
      length(col(textCol)).cast(LongType).as("n_chars"))
      .orderBy("doc_id")

  /** Common English stopwords present in the testdata vocabulary. */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "is", "to")

  /** Heuristic document-quality signals (length / stopword ratio /
    * mean word length) — the classic cheap pre-filters of a training
    * data pipeline. All arithmetic is integer-derived + one double
    * division → bit-exact across engines. */
  def qualityScore(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    val nTok = size(toks)
    val nStop = size(filter(toks, t => t.isin(Stopwords.map(x => x: Any): _*)))
    // single-space-joined text: word chars = length - (n_tokens - 1)
    val wordChars = length(col(textCol)) - (nTok - 1)
    docs.select(
      col("doc_id"),
      nTok.cast(LongType).as("n_tokens"),
      nStop.cast(LongType).as("n_stopwords"),
      (nStop.cast(DoubleType) / nTok).as("stopword_ratio"),
      (wordChars.cast(DoubleType) / nTok).as("avg_word_len"))
      .orderBy("doc_id")
  }

  /** Linear quality classifier — the fasttext-style "score every doc
    * with a tiny model, threshold, keep" stage of a training-data
    * pipeline, with a FIXED hand-set weight vector so the whole
    * scorer is deterministic and oracle-replayable. Features are the
    * [[qualityScore]] ratios plus distinct-token ratio and a scaled
    * length; the squash is the rational sigmoid x/(1+|x|) mapped to
    * (0,1) — NO transcendental calls (exp/log differ across libm
    * implementations; +,*,/,abs are IEEE-exact everywhere). One
    * narrow codegen'd projection — no shuffle, no UDF; at 100 TB
    * this runs at scan speed. Swapping learned weights in changes
    * nothing structurally. Output: (doc_id, clf_score, clf_prob,
    * label), label = keep iff score ≥ 0. */
  /** The q89 classifier (score, prob) expression pair, built in ONE
    * place so [[budgetSelect]] and [[curriculumOrder]] can never
    * drift from [[qualityClassifier]] and its oracle. The tree is
    * IEEE-ordering-sensitive: left-associative, exactly-representable
    * weight literals, token-for-token the oracle SQL — do not
    * restructure without updating all three oracles together. */
  private def clfScoreProb(textCol: String): (Column, Column) = {
    val toks = tokens(col(textCol))
    val nTok = size(toks).cast(DoubleType)
    val nStop = size(filter(toks,
      t => t.isin(Stopwords.map(x => x: Any): _*))).cast(DoubleType)
    val nDist = size(array_distinct(toks)).cast(DoubleType)
    val wordChars = (length(col(textCol)) - (size(toks) - 1))
      .cast(DoubleType)
    val score = lit(-3.5) + lit(8.0) * (nStop / nTok) -
      lit(0.25) * (wordChars / nTok) + lit(2.0) * (nDist / nTok) +
      lit(0.5) * (nTok / lit(100.0))
    val prob = (score / (lit(1.0) + abs(score)) + lit(1.0)) * lit(0.5)
    (score, prob)
  }

  /** The q89 classifier probability as a pure COLUMN over `textCol` —
    * what score-consuming composites (q164, [[curationV3]]) project
    * in the same scan instead of joining [[qualityClassifier]]'s
    * output back on the id. */
  def qualityProb(textCol: String = "text"): Column =
    clfScoreProb(textCol)._2

  /** The q89 classifier raw margin as a pure COLUMN — same contract
    * as [[qualityProb]]; what ranking consumers (the q189 AUC gate)
    * project in-scan. */
  def qualityMargin(textCol: String = "text"): Column =
    clfScoreProb(textCol)._1

  def qualityClassifier(docs: DataFrame, textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame = {
    val (score, prob) = clfScoreProb(textCol)
    docs.select(
      col(idCol),
      score.as("clf_score"),
      prob.as("clf_prob"),
      when(score >= lit(0.0), lit("keep")).otherwise(lit("drop"))
        .as("label"))
      .orderBy(idCol)
  }

  /** Per-group quantile normalization of a quality score — the fix
    * for the classic per-domain thresholding bug: a single global
    * cutoff on a raw score keeps almost everything from an
    * easy-scoring source and almost nothing from a hard one, because
    * the score DISTRIBUTIONS differ per source even when the quality
    * doesn't. Each row gets its within-group percent_rank
    * ((rank−1)/(n−1), unique order via the id tie-break, so the
    * rational division replays engine-exact), making one global
    * `keep` threshold mean the same thing in every group: keep =
    * pct_rank ≥ dropFrac drops the bottom dropFrac of EACH source.
    *
    * A singleton group is KEPT outright: its percent_rank is 0.0 in
    * both engines, so a plain `>= dropFrac` gate would annihilate
    * every one-document source — the opposite of what a per-source
    * fairness fix should do to a rare feed.
    *
    * Scale shape: one window per group partition — the score column
    * and ids are the only shuffled payload; groups are sources, so
    * partitions are balanced by ingest feed. Output: (id, group,
    * score, pct_rank, keep). */
  def scoreQuantileNorm(scored: DataFrame, dropFrac: Double,
                        groupCol: String = "source",
                        scoreCol: String = "score",
                        idCol: String = "doc_id"): DataFrame = {
    require(dropFrac >= 0.0 && dropFrac < 1.0,
      s"dropFrac must be in [0, 1), got $dropFrac")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol), col(idCol))
    val szW = Window.partitionBy(col(groupCol))
    scored.select(col(idCol), col(groupCol), col(scoreCol))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("keep", count(lit(1)).over(szW) === 1 ||
        col("pct_rank") >= lit(dropFrac))
      .orderBy(idCol)
  }

  /** BM25 keyword retrieval with a RATIONAL idf — the classic
    * quality-mining / targeted-extraction query ("pull the top-k docs
    * about X out of the corpus"). The textbook BM25 idf is
    * log((N-df+0.5)/(df+0.5)); log is transcendental and libm-
    * dependent, so like [[tfidfTerms]] this uses the rational idf
    * (N-df+0.5)/(df+0.5) — same ordering, IEEE-exact, oracle-
    * replayable. k1=1.2, b=0.75 are FIXED literals so both engines
    * parse the identical doubles.
    *
    * Shape at 100 TB: one corpus-stats aggregate (count + sum(dl) +
    * one df counter per query term — a single partial-aggregated
    * scan), broadcast back as a one-row literal, then scoring is a
    * narrow codegen'd projection and the top-k is
    * TakeOrderedAndProject — no global window, no full sort. Scoring
    * a q-term query costs q array scans per doc; an inverted index
    * would beat it per-query, but for BULK mining (score the whole
    * corpus once) the scan IS the optimal plan. */
  def bm25Search(docs: DataFrame, terms: Seq[String], k: Int,
                 textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val top = bm25Scored(docs, terms, textCol, idCol)
      .orderBy(col("bm25").desc, col(idCol)).limit(k)
    top.withColumn("rank", row_number().over(
        Window.orderBy(col("bm25").desc, col(idCol))))
      .select(col(idCol), col("rank"), col("bm25"))
      .orderBy("rank")
  }

  /** The BM25 scoring core — (id, bm25 > 0) for every matching unit,
    * no ranking tail. Shared by [[bm25Search]] (global top-k) and
    * [[passageSearch]] (per-document max-pooling), so the two can
    * never drift on the scoring arithmetic.
    *
    * ONE tokenize pass (r7 verdict item 1 — the lazy two-subtree
    * plan re-tokenized the corpus under both the stats aggregate and
    * the scoring projection, ProfileQ90 measures the cost): the scan
    * projects a per-unit (id, dln, tf_0..tf_q) frame — q+1 longs per
    * unit, GBs not TBs at warehouse doc counts — which is eagerly
    * materialized (localCheckpoint; the blocks are freed when the
    * result frame is GC'd); the corpus-stats aggregate and the
    * scoring projection both read the tiny frame. tf values are
    * identical longs to the inline formulation (same long→double
    * cast order), so scores stay bit-exact vs the q90 oracle. */
  private def bm25Scored(docs: DataFrame, terms: Seq[String],
                         textCol: String, idCol: String,
                         carryCols: Seq[String] = Nil): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    val toksC = tokens(col(textCol))
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      size(filter(toksC, x => x === lit(t))).cast(LongType).as(s"tf_$i")
    }
    val base = docs.select(
      (col(idCol) +: carryCols.map(col) :+
        size(toksC).cast(LongType).as("dln")) ++ tfCols: _*)
      .localCheckpoint(true)
    val aggCols =
      count(lit(1)).cast(DoubleType).as("n_docs") +:
      sum(col("dln")).as("sum_dl") +:
      terms.indices.map { i =>
        sum((col(s"tf_$i") > 0).cast(LongType)).as(s"df_$i")
      }
    val stats = base.agg(aggCols.head, aggCols.tail: _*)
    val dl = col("dln").cast(DoubleType)
    val avgdl = col("sum_dl").cast(DoubleType) / col("n_docs")
    val score = terms.indices.map { i =>
      val tf = col(s"tf_$i").cast(DoubleType)
      val df = col(s"df_$i").cast(DoubleType)
      (col("n_docs") - df + lit(0.5)) / (df + lit(0.5)) *
        (tf * lit(2.2)) /
        (tf + lit(1.2) * (lit(0.25) + lit(0.75) * dl / avgdl))
    }.reduce(_ + _)
    base.crossJoin(broadcast(stats))
      .select(col(idCol) +: carryCols.map(col) :+ score.as("bm25"): _*)
      .filter(col("bm25") > lit(0.0))
  }

  /** Passage-level retrieval with DOCUMENT max-pooling — the RAG
    * retrieval shape: long documents are chunked
    * ([[chunkDocs]] windows), BM25 runs at PASSAGE granularity
    * (passage-level stats: a hit in a focused 64-token window
    * outranks the same terms diluted across a long document), and
    * each document is represented by its best passage; documents
    * rank by that pooled score. Exact pooling: a per-doc window over
    * the MATCHING passages only, then TakeOrderedAndProject for the
    * final k — no global passage sort. Output:
    * (id, rank, chunk_idx, bm25). */
  def passageSearch(docs: DataFrame, terms: Seq[String], k: Int,
                    maxTokens: Int = 64, stride: Int = 48,
                    textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val passages = chunkDocs(docs, maxTokens, stride, textCol, idCol)
      .select(col(idCol), col("chunk_idx"),
        concat_ws("#", col(idCol).cast("string"),
          col("chunk_idx").cast("string")).as("passage_id"),
        col("chunk_text"))
    // doc id + chunk index ride through the checkpointed tf frame —
    // no join back to `passages` (which would re-run the chunking)
    val scored = bm25Scored(passages, terms, "chunk_text", "passage_id",
      carryCols = Seq(idCol, "chunk_idx"))
    val best = scored.withColumn("__prn", row_number().over(
        Window.partitionBy(col(idCol))
          .orderBy(col("bm25").desc, col("chunk_idx"))))
      .filter(col("__prn") === 1)
    best.orderBy(col("bm25").desc, col(idCol)).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("bm25").desc, col(idCol))))
      .select(col(idCol), col("rank"), col("chunk_idx"), col("bm25"))
      .orderBy("rank")
  }

  /** Build a persisted inverted index for [[bm25FromIndex]]: postings
    * (term, id, dln, tf) and one-row corpus stats (n_docs, sum_dl).
    * ONE tokenize pass over the corpus; at warehouse scale, bucket
    * the postings by term so a query's posting read is a pruned,
    * co-located scan instead of a corpus pass. */
  def buildInvertedIndex(docs: DataFrame, indexDir: String,
                         textCol: String = "text",
                         idCol: String = "doc_id"): Unit = {
    val toksC = tokens(col(textCol))
    val base = docs.select(col(idCol), toksC.as("toks"),
      size(toksC).cast(LongType).as("dln"))
    base.select(col(idCol), col("dln"), explode(col("toks")).as("term"))
      .groupBy(col(idCol), col("dln"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .write.mode("overwrite").parquet(s"$indexDir/postings")
    base.agg(count(lit(1)).cast(DoubleType).as("n_docs"),
        sum(col("dln")).as("sum_dl"))
      .write.mode("overwrite").parquet(s"$indexDir/stats")
  }

  /** BM25 retrieval FROM the persisted index — the interactive-
    * serving scale path [[bm25Search]]'s scaladoc promises: the
    * query reads only its terms' postings (an `isin` filter that
    * reaches the parquet scan as a pushed filter — with term-
    * bucketed postings, a co-located pruned read) instead of
    * re-tokenizing the corpus. Result is BIT-IDENTICAL to
    * [[bm25Search]]: per-term scores are reassembled as fixed
    * conditional sums (each over at most one posting row, so the
    * double additions happen in the same left-to-right term order as
    * the scan formulation), missing terms contribute the same +0.0,
    * and q95 hash-matches the q90 oracle to prove it end-to-end. */
  def bm25FromIndex(spark: org.apache.spark.sql.SparkSession,
                    indexDir: String, terms: Seq[String], k: Int,
                    idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(terms.nonEmpty, "need at least one query term")
    val postings = spark.read.parquet(s"$indexDir/postings")
      .filter(col("term").isin(terms.map(x => x: Any): _*))
    val stats = spark.read.parquet(s"$indexDir/stats")
    val dfs = postings.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = postings.join(broadcast(dfs), "term")
      .crossJoin(broadcast(stats))
    val dl = col("dln").cast(DoubleType)
    val avgdl = col("sum_dl").cast(DoubleType) / col("n_docs")
    val tfD = col("tf").cast(DoubleType)
    val dfD = col("df").cast(DoubleType)
    val termScore = (col("n_docs") - dfD + lit(0.5)) / (dfD + lit(0.5)) *
      (tfD * lit(2.2)) /
      (tfD + lit(1.2) * (lit(0.25) + lit(0.75) * dl / avgdl))
    // reassemble the per-doc sum in FIXED term order: one conditional
    // sum per query term (≤1 non-null posting each), folded left to
    // right exactly like bm25Search's t0 + t1 + ... expression
    val perTerm = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("term") === lit(t), termScore)).as(s"s_$i")
    }
    val agg = scored.groupBy(col(idCol))
      .agg(perTerm.head, perTerm.tail: _*)
    val score = terms.indices.map(i => coalesce(col(s"s_$i"), lit(0.0)))
      .reduce(_ + _)
    val top = agg.select(col(idCol), score.as("bm25"))
      .filter(col("bm25") > lit(0.0))
      .orderBy(col("bm25").desc, col(idCol)).limit(k)
    top.withColumn("rank", row_number().over(
        Window.orderBy(col("bm25").desc, col(idCol))))
      .select(col(idCol), col("rank"), col("bm25"))
      .orderBy("rank")
  }

  /** Merge persisted inverted indexes ([[buildInvertedIndex]] output)
    * into one — the compaction step of shard-wise index builds (each
    * ingest shard indexes itself; the merged index serves queries).
    * Shards must cover DISJOINT doc-id spaces (each doc indexed by
    * exactly one shard — the natural ingest invariant); then postings
    * union is the full-corpus postings, summed stats are the
    * full-corpus stats, and because [[bm25FromIndex]] derives df from
    * the postings at query time, querying the merged index is
    * BIT-IDENTICAL to querying one index built over the union corpus
    * (q99 hash-matches the q90 scan oracle to prove it end-to-end).
    * Pure metadata-free unions — no re-tokenization, no corpus scan;
    * at warehouse scale this is the cheap nightly compaction that
    * amortizes indexing across ingest batches. */
  def mergeInvertedIndexes(spark: org.apache.spark.sql.SparkSession,
                           indexDirs: Seq[String],
                           outDir: String): Unit = {
    require(indexDirs.nonEmpty, "need at least one index")
    // mode("overwrite") deletes outDir before the LAZY input reads
    // execute — merging in place would destroy an input mid-read
    require(!indexDirs.contains(outDir),
      s"outDir $outDir is one of the input indexes")
    val postings = indexDirs.map(d => spark.read.parquet(s"$d/postings"))
      .reduce(_ unionByName _)
    // the disjoint-doc-span precondition, CHECKED: overlapping shards
    // silently double-count df and n_docs, skewing every BM25 score
    // from the merged index. Doc-level suffices — a shard indexes
    // EVERY term of each of its docs, so any (doc, term) overlap
    // implies a doc overlap, and a doc in k shards contributes k to
    // Σ n_docs (per-shard stats) but 1 to distinct-doc count. One
    // narrow single-column aggregate over the merged postings vs the
    // tiny stats rows — not a wide (doc, term) distinct.
    val docCol = postings.columns
      .filterNot(Set("term", "dln", "tf")).head
    val statsUnion = indexDirs
      .map(d => spark.read.parquet(s"$d/stats"))
      .reduce(_ unionByName _)
    val nDocsSum = statsUnion.agg(sum(col("n_docs")))
      .first().getDouble(0).toLong
    val distinctDocs = postings
      .agg(count_distinct(col(docCol))).first().getLong(0)
    require(distinctDocs == nDocsSum,
      s"input indexes overlap: stats claim $nDocsSum docs but merged " +
        s"postings cover $distinctDocs distinct — shards must cover " +
        "disjoint doc spans")
    postings.write.mode("overwrite").parquet(s"$outDir/postings")
    statsUnion
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("sum_dl")).as("sum_dl"))
      .write.mode("overwrite").parquet(s"$outDir/stats")
  }

  /** Per-language corpus statistics (group-by over the lang label). */
  def langStats(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.groupBy(col("lang")).agg(
      count(lit(1)).as("n_docs"),
      sum(size(tokens(col(textCol))).cast(LongType)).as("total_tokens"),
      max(col("n_chars")).as("max_chars"))
      .orderBy("lang")

  /** Deterministic stratified sample: the k rows with the smallest
    * md5(text) per stratum — min-k hash-order sampling, the
    * reproducible alternative to random sampling in training-data
    * pipelines (same sample on every engine, cluster, and rerun;
    * uniform because the hash order is content-random). One shuffle
    * by stratum; `WindowGroupLimit` turns the rank filter into a
    * per-partition top-k before the final window at scale. */
  def stratifiedSample(docs: DataFrame, stratumCol: String, k: Int,
                       textCol: String = "text",
                       idCol: String = "doc_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol)).orderBy(md5(col(textCol)), col(idCol))
    docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col(stratumCol), col(idCol), md5(col(textCol)).as("sample_key"))
      .orderBy(stratumCol, idCol)
  }

  /** Exact per-stratum length quantiles (linear interpolation —
    * matches ANSI percentile_cont). */
  def lengthQuantiles(docs: DataFrame, stratumCol: String): DataFrame =
    docs.groupBy(col(stratumCol))
      .agg(
        expr("percentile(n_chars, 0.5)").as("p50_chars"),
        expr("percentile(n_chars, 0.9)").as("p90_chars"),
        max(col("n_chars")).as("max_chars"))
      .orderBy(stratumCol)

  /** Marker-token profiles for the language-ID heuristic. In a real
    * corpus these would be learned character n-gram profiles; the
    * principle (argmax over per-language evidence scores, computed
    * columnar without a shuffle) is identical. */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and"),
    "de" -> Seq("der", "die", "das", "und"),
    "es" -> Seq("el", "la", "los", "y"),
    "fr" -> Seq("le", "les", "et", "une"),
    "zh" -> Seq("shi", "de", "bu", "le"))

  /** Language-ID: argmax of marker-token hit counts, deterministic
    * tie-break on language code (via lexicographic struct max). */
  def langId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    val scored = LangMarkers.toSeq.sortBy(_._1).map { case (lang, ms) =>
      struct(
        size(filter(toks, t => t.isin(ms.map(x => x: Any): _*))).as("score"),
        lit(lang).as("lang"))
    }
    docs.select(
      col("doc_id"),
      array_max(array(scored: _*)).getField("lang").as("predicted_lang"),
      col("lang").as("actual_lang"))
      .orderBy("doc_id")
  }

  /** Sequence packing: assign documents to contiguous token-budget
    * bins — the pretraining step that turns a shuffled corpus into
    * fixed-budget training sequences. Within each (stratum, shard),
    * documents are taken in id order and a document whose exclusive
    * running token total has consumed the budget opens the next bin
    * (bins may overflow by one document's tail — the deterministic
    * streaming-fill rule; real packers then truncate/wrap inside the
    * bin, which is a per-bin local op).
    *
    * Scale shape: the running sum is a window per (stratum, shard) —
    * sharding (`pmod(id, shards)`) bounds every window partition so
    * no single stratum serializes the cumsum at 100 TB; shards are
    * independent streams, which is exactly how parallel packers run.
    */
  def packSequences(docs: DataFrame, budget: Long, shards: Int = 4,
                    stratumCol: String = "lang",
                    textCol: String = "text",
                    idCol: String = "doc_id",
                    countCol: Option[String] = None): DataFrame = {
    require(budget > 0 && shards > 0, "budget and shards must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol), col("shard")).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    // countCol feeds REAL tokenizer piece counts ([[encodeGreedy]]
    // aggregated per doc) in place of the whitespace-token estimate
    val nTok = countCol.map(c => col(c).cast(LongType))
      .getOrElse(size(tokens(col(textCol))).cast(LongType))
    docs.select(col(stratumCol), col(idCol),
        pmod(col(idCol), lit(shards.toLong)).as("shard"),
        nTok.as("n_tok"))
      // explicit floor: Spark's double→long cast truncates but
      // DuckDB's CAST rounds — floor() agrees everywhere (exclusive
      // cumsum is non-negative and ≪ 2^53, so the double is exact)
      .withColumn("bin",
        floor((sum(col("n_tok")).over(w) - col("n_tok")) / budget)
          .cast(LongType))
      .groupBy(col(stratumCol), col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        min(col(idCol)).as("first_doc"), max(col(idCol)).as("last_doc"))
      .orderBy(stratumCol, "shard", "bin")
  }

  /** Byte-pair-encoding MERGE LEARNING (Sennrich et al. 2016) — the
    * canonical subword-tokenizer training loop, distributed: the
    * corpus collapses to a (word, count) table once; each round
    * counts adjacent symbol pairs weighted by word count (one
    * map-side-combined aggregate over the word table), takes the
    * globally most frequent pair (count desc, pair asc — the
    * deterministic tie-break), and merges it everywhere. Exactly the
    * "tiny model state, huge data" discipline of [[Cluster.kmeans]]:
    * only the ONE winning pair per round reaches the driver; the
    * word-symbol table never does.
    *
    * Determinism (what makes all `numMerges` rounds hash-exact in
    * DuckDB): a word's symbol state is a 0x1F-joined string, and a
    * merge applies as a LEFT-TO-RIGHT fold — append `b` directly
    * (no separator) when the accumulated string's last symbol is
    * exactly `a` and the next symbol is `b`, else append with the
    * separator. That fold IS leftmost-non-overlapping BPE merging
    * ("aaa" under (a,a) → [aa, a]), it needs no regex (lookarounds
    * would be needed for a replace()-based merge to respect symbol
    * boundaries, and RE2 has none), and DuckDB's list_reduce
    * replays it literally. Output: one row per learned merge —
    * (merge_rank, left, right, merged, pair_count). */
  def bpeLearn(docs: DataFrame, numMerges: Int = 10,
               textCol: String = "text"): DataFrame =
    bpeTrain(docs, numMerges, textCol)._1

  /** The SEGMENTATION the learned merges induce — the final
    * (word, count, n_pieces, pieces) table after [[bpeLearn]]'s
    * rounds, i.e. the tokenizer's word→subword map a training
    * pipeline ships next to the merge list (lookup-table encoding is
    * then a broadcast join, no re-derivation). Same computation;
    * this returns the end state instead of the merge log; the 0x1F
    * separator is rendered as a space in `pieces`. */
  def bpeSegment(docs: DataFrame, numMerges: Int = 10,
                 textCol: String = "text"): DataFrame = {
    val st = bpeTrain(docs, numMerges, textCol)._2
    st.select(col("word"), col("n"),
        size(split(col("sym"), "\u001f")).cast(LongType).as("n_pieces"),
        regexp_replace(col("sym"), "\u001f", " ").as("pieces"))
      .orderBy("word")
  }

  private def bpeTrain(docs: DataFrame, numMerges: Int,
                       textCol: String): (DataFrame, DataFrame) = {
    require(numMerges >= 1, "need numMerges >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    val Sep = "\u001f"
    // (word, n) + initial per-character symbol state
    var words = docs.select(explode(tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .select(col("word"), col("n"),
        array_join(transform(sequence(lit(1), length(col("word"))),
          i => substring(col("word"), i, lit(1))), Sep).as("sym"))
      .localCheckpoint()
    val merges = collection.mutable.ArrayBuffer.empty[
      (Long, String, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= numMerges && !exhausted) {
      val syms = split(col("sym"), Sep)
      val top = words
        .select(col("n"), explode(
          when(size(syms) < 2, array().cast("array<struct<a:string,b:string>>"))
            .otherwise(zip_with(
              slice(syms, lit(1), size(syms) - 1),
              slice(syms, lit(2), size(syms) - 1),
              (x, y) => struct(x.as("a"), y.as("b"))))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val a = top(0).getString(0)
        val b = top(0).getString(1)
        val cnt = top(0).getLong(2)
        merges += ((r.toLong, a, b, a + b, cnt))
        // leftmost-non-overlap merge as a left fold (see scaladoc)
        words = words.select(col("word"), col("n"),
            aggregate(split(col("sym"), Sep), lit(""),
              (acc, x) =>
                when((acc === lit(a) ||
                    acc.endsWith(lit(Sep + a))) && x === lit(b),
                  concat(acc, x))
                .when(acc === lit(""), x)
                .otherwise(concat(acc, lit(Sep), x))).as("sym"))
          .localCheckpoint()
        r += 1
      }
    }
    (merges.toSeq
      .toDF("merge_rank", "left", "right", "merged", "pair_count")
      .orderBy("merge_rank"),
     words)
  }

  /** Collocation mining — the multi-word-expression step of vocabulary
    * construction (phrases like "new york" that should tokenize as a
    * unit): bigrams ranked by rational LIFT c(ab)·N / (c(a)·c(b))
    * (N = corpus token count) — the PMI exponential, which orders
    * identically to PMI itself but needs no log, so the whole ranking
    * is hash-exact. `minCount` suppresses the unstable low-frequency
    * tail exactly as phrase-mining tools do (Mikolov et al. 2013's
    * phrase threshold has the same shape with a −δ discount).
    *
    * Scale shape: one corpus scan explodes bigrams (zip_with — the
    * q76 no-retokenize discipline), both count tables are map-side-
    * combined groupBys, unigram counts broadcast back onto the
    * (distinct-bigram-sized) candidate table, top-k is
    * TakeOrderedAndProject. Output: (rank, bigram, c_ab, c_a, c_b,
    * lift). */
  def collocations(docs: DataFrame, k: Int, minCount: Long = 5,
                   textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0 && minCount >= 1, "need k > 0, minCount >= 1")
    val toks = tokens(col(textCol))
    val bigrams = when(size(toks) < 2, array().cast("array<string>"))
      .otherwise(zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => concat(a, lit(" "), b)))
    val cAb = docs.select(explode(bigrams).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
    val cW = docs.select(explode(toks).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val n = docs.agg(sum(size(toks)).cast(LongType).as("n_tokens"))
    val scored = cAb
      .withColumn("w1", element_at(split(col("bigram"), " ", 2), 1))
      .withColumn("w2", element_at(split(col("bigram"), " ", 2), 2))
      .join(broadcast(cW.select(col("w").as("w1"), col("c").as("c_a"))),
        "w1")
      .join(broadcast(cW.select(col("w").as("w2"), col("c").as("c_b"))),
        "w2")
      .crossJoin(broadcast(n))
      .withColumn("lift",
        col("c_ab").cast(DoubleType) * col("n_tokens").cast(DoubleType)
          / (col("c_a").cast(DoubleType) * col("c_b").cast(DoubleType)))
    scored.orderBy(col("lift").desc, col("bigram")).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("lift").desc, col("bigram"))))
      .select(col("rank").cast(LongType).as("rank"), col("bigram"),
        col("c_ab"), col("c_a"), col("c_b"), col("lift"))
      .orderBy("rank")
  }

  /** MATERIALIZE the packed sequences [[packSequences]] plans: the
    * same (stratum, shard, bin) assignment arithmetic, but each bin's
    * member documents are concatenated in packing order (id asc) with
    * `sep` between them — the actual tensor-prep artifact a training
    * job reads, where q59 is its audit summary. One window + one
    * groupBy whose `collect_list` is bounded by construction: a bin
    * holds ≤ budget tokens (+ one crossing doc), so the packed string
    * is ~budget tokens no matter how large the corpus — state per
    * group is O(budget), never O(corpus). */
  def packMaterialize(docs: DataFrame, budget: Long, shards: Int = 4,
                      sep: String = " <eot> ",
                      stratumCol: String = "lang",
                      textCol: String = "text",
                      idCol: String = "doc_id"): DataFrame = {
    require(budget > 0 && shards > 0, "budget and shards must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol), col("shard")).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    docs.select(col(stratumCol), col(idCol), col(textCol),
        pmod(col(idCol), lit(shards.toLong)).as("shard"),
        size(tokens(col(textCol))).cast(LongType).as("n_tok"))
      .withColumn("bin",
        floor((sum(col("n_tok")).over(w) - col("n_tok")) / budget)
          .cast(LongType))
      .groupBy(col(stratumCol), col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        array_join(transform(
          array_sort(collect_list(struct(col(idCol), col(textCol)))),
          _.getField(textCol)), sep).as("packed_text"))
      .orderBy(stratumCol, "shard", "bin")
  }

  /** Vocabulary building: token frequencies over the corpus, pruned
    * at `minCount`, ranked into contiguous ids (count desc, token asc
    * — the deterministic tie-break). The explode→count is one
    * partial-aggregated shuffle on the token; the id assignment ranks
    * the (tiny) surviving vocabulary. */
  def buildVocab(docs: DataFrame, minCount: Long = 2,
                 textCol: String = "text"): DataFrame = {
    val counts = docs
      .select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("token"))
    counts.withColumn("vocab_id", row_number().over(w).cast("int"))
      .select("vocab_id", "token", "n")
      .orderBy("vocab_id")
  }

  /** Tokenizer application: encode every document with a
    * [[buildVocab]]-style vocabulary via greedy longest-match
    * (WordPiece-style). Each whitespace word becomes one or more
    * pieces: the longest vocab entry prefixing the remaining word is
    * emitted and consumed; a remainder no entry prefixes becomes a
    * single OOV piece with vocab_id 0. Output is fully scalar rows
    * (doc_id, word_pos, piece_pos, piece, vocab_id) — deterministic
    * and replayable in plain SQL, and the per-doc piece counts are
    * the real token counts [[packSequences]] bins at batch-assembly
    * time (IncrementalDedupSpec's sibling spec wires the two).
    *
    * Scale shape: the vocab is collect()ed ONCE into the codegen'd
    * [[graft.functions.GreedyPieces]] expression — a tokenizer vocab
    * is a bounded model artifact (tens of k entries), and embedding
    * it is how tokenizers ship to executors everywhere: the encode
    * itself is then a linear, shuffle-free scan (the only exchange is
    * the trailing presentation sort). */
  def encodeGreedy(docs: DataFrame, vocab: DataFrame,
                   textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
    val entries = vocab.select(col("token"), col("vocab_id").cast("int"))
      .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    docs.select(col(idCol), posexplode(tokens(col(textCol))))
      .withColumnRenamed("pos", "word_pos")
      .withColumnRenamed("col", "word")
      .select(col(idCol), col("word_pos"),
        posexplode(graft.functions.TextExpressions
          .greedy_pieces(col("word"), entries)))
      .select(col(idCol), col("word_pos"), col("pos").as("piece_pos"),
        col("col.piece").as("piece"), col("col.vocab_id").as("vocab_id"))
      .orderBy(idCol, "word_pos", "piece_pos")
  }

  /** Weighted corpus interleave: the data-mixing step that feeds a
    * training run a deterministic stream with fixed per-source
    * proportions. Each source's documents are ranked in id order and
    * scheduled at virtual finish time rank/weight (weighted fair
    * queueing) — the first k positions of the merged stream then
    * contain ≈ weight share of each source. Ties break on
    * (source, rank), so the order is total and engine-independent.
    *
    * Scale shape: per-source ranking is a partitioned window; the
    * global "first k by vft" is TakeOrderedAndProject (per-partition
    * top-k, no full sort); only the k survivors see the final
    * single-partition position numbering. */
  def weightedInterleave(docs: DataFrame, weights: Map[String, Double],
                         k: Int, sourceCol: String = "lang",
                         idCol: String = "doc_id"): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be positive")
    val wExpr = weights.toSeq.sortBy(_._1).foldLeft(lit(null).cast("double")) {
      case (acc, (s, wt)) => when(col(sourceCol) === s, lit(wt)).otherwise(acc)
    }
    val rankW = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol)).orderBy(col(idCol))
    val ranked = docs.select(col(sourceCol), col(idCol))
      .withColumn("w", wExpr).filter(col("w").isNotNull)
      .withColumn("r", row_number().over(rankW))
      .withColumn("vft", col("r") / col("w"))
      .orderBy(col("vft"), col(sourceCol), col("r")).limit(k)
    ranked.withColumn("mix_pos",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("vft"), col(sourceCol), col("r"))).cast("int"))
      .select(col("mix_pos"), col(idCol), col(sourceCol))
      .orderBy("mix_pos")
  }

  /** Weighted sampling without libm: per-stratum SYSTEMATIC
    * probability-proportional-to-size sampling. Documents are laid on
    * the stratum's cumulative-weight line in id order; a document is
    * picked once per sampling-grid point (step = total/k) its weight
    * interval covers, so inclusion probability is proportional to
    * weight — the classic systematic PPS design. Everything is
    * window sums + floor + one IEEE division: no ln/pow (whose
    * last-ulp rounding differs across engines), so the sample is
    * bit-reproducible anywhere — the property that makes weighted
    * sampling auditable in a training-data pipeline.
    *
    * Scale shape: one shuffle per stratum (same discipline as
    * [[packSequences]] — strata bound the partitions); the cumsum
    * and the whole-stratum total are two windows over one
    * partitioning, so the input is scanned once. */
  def ppsSample(docs: DataFrame, k: Int,
                weightCol: String, stratumCol: String = "lang",
                idCol: String = "doc_id"): DataFrame = {
    require(k > 0, "k must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol)).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    // whole-partition total as a second window over the SAME
    // partitioning — it rides the cumsum window's shuffle, so the
    // input is scanned once (a groupBy+join would scan twice)
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
    docs.select(col(stratumCol), col(idCol),
        col(weightCol).cast(LongType).as("__w"))
      .withColumn("__cum", sum(col("__w")).over(w))
      .withColumn("__total", sum(col("__w")).over(wAll))
      // an all-zero-weight stratum has no sampling grid (step 0 →
      // NaN): drop it rather than diverge engine-by-engine on
      // NaN/∞ handling. Weights are expected non-negative.
      .filter(col("__total") > 0)
      // grid points at multiples of total/k: picks = how many fall
      // inside (cum_excl, cum_incl] — floor() both engines (casts
      // disagree on rounding, floor never does)
      .withColumn("__step", col("__total").cast(DoubleType) / k)
      .withColumn("n_picks",
        (floor(col("__cum").cast(DoubleType) / col("__step")) -
          floor((col("__cum") - col("__w")).cast(DoubleType) / col("__step")))
          .cast(LongType))
      .filter(col("n_picks") > 0)
      .select(col(stratumCol), col(idCol), col("__w").as("weight"),
        col("n_picks"))
      .orderBy(stratumCol, idCol)
  }

  /** End-to-end curation composite — the whole batch-assembly story
    * as ONE declarative plan: quality filter (token floor + stopword
    * ceiling) → exact dedup (min id per md5) → deterministic
    * stratified sample (md5 order per stratum) → sequence packing.
    * Each stage is the library op's formula; chaining them keeps
    * Catalyst free to fuse the filters into the scan and share the
    * md5 computation across dedup and sampling. */
  def curateCorpus(docs: DataFrame, minTokens: Long, maxStopRatio: Double,
                   samplePerLang: Int, budget: Long,
                   textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = tokens(col(textCol))
    val nTok = size(toks).cast(LongType)
    val nStop = size(filter(toks,
      t => t.isin(Stopwords.map(x => x: Any): _*))).cast(LongType)
    val quality = docs.filter(nTok >= minTokens &&
      nStop.cast(DoubleType) / nTok <= maxStopRatio)
    val deduped = quality.withColumn("__keep",
        min(col(idCol)).over(Window.partitionBy(md5(col(textCol)))))
      .filter(col(idCol) === col("__keep")).drop("__keep")
    val sampleW = Window.partitionBy(col("lang"))
      .orderBy(md5(col(textCol)), col(idCol))
    val sampled = deduped.withColumn("__rn", row_number().over(sampleW))
      .filter(col("__rn") <= samplePerLang).drop("__rn")
    packSequences(sampled, budget, shards = 1,
      textCol = textCol, idCol = idCol)
  }

  /** Context-window chunking: split each document into fixed-budget
    * token windows advancing by `stride` (overlap = maxTokens −
    * stride) — the step that turns curated documents into model-ready
    * sequences. Chunk count is 1 + ceil(max(n − maxTokens, 0) /
    * stride) (pure integer arithmetic — engine-exact), so every
    * token lands in ≥1 chunk and a short document yields exactly one.
    * Columnar transform + one explode; no shuffle except the
    * presentation sort — linear at any corpus size, and the chunk
    * fan-out is bounded by n/stride per document. */
  def chunkDocs(docs: DataFrame, maxTokens: Int, stride: Int,
                textCol: String = "text",
                idCol: String = "doc_id"): DataFrame = {
    require(maxTokens > 0 && stride > 0 && stride <= maxTokens,
      "need 0 < stride <= maxTokens")
    val toks = tokens(col(textCol))
    val n = size(toks)
    // integer ceil((n - maxTokens)/stride) via (x + stride - 1) / stride
    val extra = floor((greatest(n - maxTokens, lit(0)) + lit(stride - 1))
      / lit(stride)).cast("int")
    val chunks = transform(sequence(lit(0), extra), i => {
      val start = i * stride
      struct(
        i.cast("int").as("chunk_idx"),
        start.cast("long").as("start_tok"),
        least(lit(maxTokens), n - start).cast("long").as("n_chunk_tokens"),
        array_join(slice(toks, start + 1, lit(maxTokens)), " ")
          .as("chunk_text"))
    })
    docs.select(col(idCol), explode(chunks).as("c"))
      .select(col(idCol), col("c.chunk_idx"), col("c.start_tok"),
        col("c.n_chunk_tokens"), col("c.chunk_text"))
      .orderBy(idCol, "chunk_idx")
  }

  /** Intra-document repetition signals — the standard boilerplate /
    * low-quality filter: the fraction of n-shingle (and token)
    * occurrences that are repeats of an earlier occurrence in the
    * same document. Counts are integers and the ratios single IEEE
    * divisions — engine-exact. Shuffle-free columnar scan. */
  def repetitionScore(docs: DataFrame, n: Int = 3,
                      textCol: String = "text",
                      idCol: String = "doc_id"): DataFrame = {
    val toks = tokens(col(textCol))
    val sh = graft.functions.TextExpressions.shingles_multiset(toks, n)
    val nSh = size(sh).cast(LongType)
    val nShD = size(array_distinct(sh)).cast(LongType)
    val nTok = size(toks).cast(LongType)
    val nTokD = size(array_distinct(toks)).cast(LongType)
    docs.select(col(idCol),
      nSh.as("n_shingles"), nShD.as("n_shingles_distinct"),
      (lit(1.0) - nShD.cast(DoubleType) / nSh).as("shingle_rep_ratio"),
      nTok.as("n_tokens"), nTokD.as("n_tokens_distinct"),
      (lit(1.0) - nTokD.cast(DoubleType) / nTok).as("token_rep_ratio"))
      .orderBy(idCol)
  }

  /** Token-distribution CONCENTRATION (Herfindahl index Σpᵢ² and
    * top-token mass) — the no-log entropy proxy: a doc whose token
    * mass concentrates on few types ("buy buy buy cheap buy…") scores
    * high even when [[repetitionScore]]'s distinct-ratio looks
    * acceptable, because concentration weights the SKEW of the
    * distribution, not just its support size. Σpᵢ² = Σcᵢ²/N² is
    * computed in EXACT integer arithmetic (BIGINT Σcᵢ², one final
    * IEEE division), so unlike a Shannon-entropy filter there is no
    * transcendental — hash-exact replayable (the q89 no-libm rule).
    *
    * Shape at 100 TB: per-token counts stay IN-ROW (nested
    * higher-order functions over the token array — O(distinct·n)
    * per doc, zero shuffle); nothing leaves the narrow projection.
    * `tau` must be a binary-exact literal (0.25, 0.125, …) so both
    * engines compare the identical double. */
  def tokenConcentration(docs: DataFrame, tau: Double = 0.25,
                         textCol: String = "text",
                         idCol: String = "doc_id"): DataFrame = {
    val toks = tokens(col(textCol))
    val counts = transform(array_distinct(toks),
      t => size(filter(toks, x => x === t)).cast(LongType))
    val n = size(toks).cast(LongType)
    docs.select(col(idCol), n.as("n_tokens"),
        size(array_distinct(toks)).cast(LongType).as("n_distinct"),
        aggregate(counts, lit(0L), (a, c) => a + c * c).as("sum_sq"),
        array_max(counts).as("max_count"))
      .withColumn("concentration", col("sum_sq").cast(DoubleType) /
        (col("n_tokens") * col("n_tokens")).cast(DoubleType))
      .withColumn("top_frac",
        col("max_count").cast(DoubleType) / col("n_tokens").cast(DoubleType))
      .withColumn("repetitive", col("concentration") >= lit(tau))
      .orderBy(idCol)
  }

  /** Per-document NOVELTY: the fraction of a doc's distinct n-grams
    * that appear in NO other document — the redundancy/contribution
    * signal complementary to near-dup dedup (a doc can be far from
    * every individual neighbor yet contribute nothing the corpus
    * doesn't already have) and to per-doc repetition (which only
    * sees the doc itself). Low novelty ⇒ boilerplate/templated mass;
    * curriculum and budget-selection stages use it as an ordering
    * key, dedup tuning uses its distribution to place thresholds.
    *
    * Shape at 100 TB: distinct (gram, id) pairs are the only
    * exchange; gram df is one map-side-combined count, and the
    * df join back is gram-keyed — Zipf-skewed exactly on boilerplate
    * grams, which is what AQE skew-split handles. Integer counts +
    * one division: engine-exact (q154). */
  def docNovelty(docs: DataFrame, n: Int = 3,
                 textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame = {
    require(n > 0, "n must be positive")
    // native sorted_distinct_shingles, not array_distinct(shingles):
    // the lambda form re-tokenizes the doc per window after inlining
    // (the q125 CollapseProject lesson) — measured 5.6 s → 1.5 s at
    // sf0.1 for the extraction alone
    val grams = docs.select(col(idCol),
      explode(graft.functions.TextExpressions.sorted_distinct_shingles(
        tokens(col(textCol)), n)).as("gram"))
    val gdf = grams.groupBy("gram").agg(count(lit(1)).as("gdf"))
    grams.join(gdf, "gram")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("gdf") === 1, 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty",
        col("n_novel").cast(DoubleType) / col("n_grams").cast(DoubleType))
      .orderBy(idCol)
  }

  /** Corpus n-gram DIVERSITY per source: distinct/total n-gram ratio
    * (type-token ratio) for each n — the distinct-n diagnostic that
    * catches a TEMPLATED source (every doc unique, but they all
    * share the same bigram skeleton) which per-doc repetition and
    * doc-level dedup both miss. Integer counts, one division per
    * report row.
    *
    * Shape at 100 TB: the exchange carries (source, n, gram) with
    * map-side partial aggregation deduplicating grams per partition
    * before the shuffle; count(DISTINCT) is Spark's standard
    * two-phase expand — no corpus-sized single point. This is the
    * honest cost of an EXACT distinct count; a cheaper sketch
    * (approx_count_distinct) drops the ratio's replayability. */
  def ngramDiversity(docs: DataFrame, ns: Seq[Int] = Seq(1, 2, 3),
                     textCol: String = "text",
                     srcCol: String = "source"): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ > 0), "ns must be positive")
    // native multiset shingles: the composable transform() chain
    // re-tokenizes per window after inlining (~3 s per explode at
    // sf0.1 vs 0.4 s native — the q154/q125 lesson)
    val perN = ns.map { n =>
      docs.select(col(srcCol).as("source"), lit(n).as("n"),
        explode(graft.functions.TextExpressions.shingles_multiset(
          tokens(col(textCol)), n)).as("gram"))
    }
    perN.reduce(_ unionByName _)
      .groupBy("source", "n")
      .agg(count(lit(1)).as("total_ngrams"),
        countDistinct(col("gram")).as("distinct_ngrams"))
      .withColumn("ttr", col("distinct_ngrams").cast(DoubleType) /
        col("total_ngrams").cast(DoubleType))
      .orderBy("source", "n")
  }

  /** PII patterns, deliberately restricted to syntax Java regex and
    * RE2 interpret identically (explicit char classes, no \d, no
    * lookaround, greedy quantifiers) so any engine reproduces the
    * scrub byte-for-byte. */
  val EmailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val LongNumberRe: String = "[0-9]{6,}"

  /** PII scrubbing: redact email addresses then long digit runs
    * (phone/account-number shaped), with per-document match counts
    * for audit. Emails are removed FIRST so their digits never count
    * as numbers. Pure columnar regexp expressions — codegen'd,
    * shuffle-free, linear scan at any scale. */
  def piiScrub(docs: DataFrame, textCol: String = "text",
               idCol: String = "doc_id"): DataFrame = {
    val deEmailed = regexp_replace(col(textCol), EmailRe, "<EMAIL>")
    docs.select(col(idCol),
      regexp_replace(deEmailed, LongNumberRe, "<NUM>").as("scrubbed"),
      size(regexp_extract_all(col(textCol), lit(EmailRe), lit(0)))
        .cast(LongType).as("n_emails"),
      size(regexp_extract_all(deEmailed, lit(LongNumberRe), lit(0)))
        .cast(LongType).as("n_numbers"))
      .orderBy(idCol)
  }

  /** Benchmark decontamination: for every corpus document, the
    * fraction of its distinct n-gram shingles that appear ANYWHERE in
    * the eval set's pooled shingle vocabulary — the standard
    * train/eval-overlap audit of a training-data pipeline (flag or
    * drop documents whose overlap exceeds a threshold before they
    * leak eval answers into the training mix).
    *
    * Shape: the eval pool is reduced to DISTINCT shingles first (an
    * eval set is tiny next to a 100 TB corpus, so this side is
    * broadcastable — no corpus shuffle for the membership probe); the
    * corpus side explodes (doc_id, shingle) once and semi-joins the
    * pool, and the per-doc match count is a map-side-combinable
    * groupBy on doc_id. Never all-pairs: cost is O(corpus shingles) +
    * one small-side join, not O(corpus × eval).
    *
    * Determinism: shingles join on their exact strings (no hashing),
    * counts are integers, and the ratio is one IEEE division —
    * bit-reproducible on any engine. */
  def decontaminate(corpus: DataFrame, evalSet: DataFrame, n: Int = 5,
                    threshold: Double = 0.5,
                    textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    // codegen'd one-pass distinct-shingle construction (the
    // interpreted slice+array_join chain dominated this scan)
    val sh = graft.functions.TextExpressions
      .sorted_distinct_shingles(tokens(col(textCol)), n)
    val evalPool = evalSet.select(explode(sh).as("shingle")).distinct()
    // exploding the DISTINCT shingle array yields exactly one row per
    // distinct shingle, so one pass computes BOTH the denominator
    // (count) and the numerator (matched hits) — no second corpus
    // scan, no doc_id re-join. The broadcast left join is the pool
    // membership probe; the only shuffle is the map-side-combined
    // groupBy on doc_id. (shingles() of any text is non-empty — short
    // docs yield one truncated shingle — so no document drops out of
    // the explode.)
    corpus.select(col(idCol), explode(sh).as("shingle"))
      .join(broadcast(evalPool.withColumn("__hit", lit(1))),
        Seq("shingle"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("__hit"), lit(0))).as("n_matched"))
      .withColumn("overlap",
        col("n_matched").cast(DoubleType) / col("n_shingles"))
      .withColumn("contaminated", col("overlap") >= threshold)
      .orderBy(idCol)
  }

  /** [[decontaminate]]'s drop form: the corpus with contaminated
    * documents removed (ids-only anti-join — document bodies never
    * enter the audit shuffle). */
  def dropContaminated(corpus: DataFrame, evalSet: DataFrame, n: Int = 5,
                       threshold: Double = 0.5,
                       textCol: String = "text",
                       idCol: String = "doc_id"): DataFrame =
    corpus.join(
      decontaminate(corpus, evalSet, n, threshold, textCol, idCol)
        .filter(col("contaminated")).select(idCol),
      Seq(idCol), "left_anti")

  /** Winnowing-style document fingerprint: the k smallest 64-bit
    * shingle hashes, collapsed to one signature hash. Near-identical
    * documents share most minima → close fingerprints; robust to
    * small edits, unlike a whole-document hash. */
  def fingerprint(docs: DataFrame, n: Int = 3, k: Int = 8,
                  textCol: String = "text"): DataFrame = {
    val hashes = array_sort(transform(
      graft.functions.TextExpressions.shingles_multiset(
        tokens(col(textCol)), n), xxhash64(_)))
    docs.select(
      col("doc_id"),
      xxhash64(array_join(slice(hashes, 1, k), ",")).as("fingerprint"),
      xxhash64(col(textCol)).as("exact_hash"))
      .orderBy("doc_id")
  }

  /** [[fingerprint]] on md5 — the same min-k-of-hashed-shingles
    * signature pipeline with the hash swapped for one DuckDB shares,
    * so THIS variant is oracle-gated end to end (q155) and stands
    * witness that the q29 pipeline shape replays exactly (the q123
    * pattern). Note the min-k SELECTION is hash-dependent — which
    * shingles hash lowest differs per hash — so q29 and q155 are the
    * same algorithm, not the same values. xxhash64 stays the
    * production default (8-byte fixed-width vs md5's 16, ~5× cheaper
    * per hash). */
  def fingerprintMd5(docs: DataFrame, n: Int = 3, k: Int = 8,
                     textCol: String = "text"): DataFrame = {
    val hashes = array_sort(transform(
      graft.functions.TextExpressions.shingles_multiset(
        tokens(col(textCol)), n), md5(_)))
    docs.select(
      col("doc_id"),
      md5(array_join(slice(hashes, 1, k), ",")).as("fingerprint"),
      md5(col(textCol)).as("exact_hash"))
      .orderBy("doc_id")
  }

  /** Temperature-based multilingual resampling (α = 0.5): per-stratum
    * sample targets ∝ n_l^α — the standard mixing rule that up-weights
    * low-resource languages relative to their raw share (α = 1 is
    * proportional, α = 0 uniform). α is FIXED at 0.5 because
    * n^0.5 = sqrt(n) is the one non-trivial power IEEE 754 requires
    * correctly rounded on every engine — pow()'s last-ulp rounding is
    * libm-specific, so a general-α version could not be
    * bit-reproducible (the [[ppsSample]] no-libm discipline).
    *
    * target_l = floor(budget·sqrt(n_l)/S + 0.5), where
    * S = Σ_l sqrt(n_l) folded in STRATUM ORDER (collect_list →
    * array_sort → sequential aggregate): double addition is
    * order-sensitive in the last ulp, and a partition-order sum would
    * differ run to run. Selection within a stratum is the
    * [[stratifiedSample]] min-k md5 order — reproducible anywhere.
    *
    * Shape: one tiny groupBy for the counts (broadcast back), one
    * stratum-partitioned window for the ranked selection —
    * WindowGroupLimit caps it per partition at scale. */
  def temperatureSample(docs: DataFrame, budget: Int,
                        stratumCol: String = "lang",
                        textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame = {
    require(budget > 0, "budget must be positive")
    import org.apache.spark.sql.expressions.Window
    val counts = docs.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("w", sqrt(col("n_docs").cast(DoubleType)))
    val totals = counts
      .agg(array_sort(collect_list(struct(col(stratumCol).as("s"),
        col("w").as("w")))).as("arr"))
      .select(aggregate(col("arr"), lit(0.0),
        (acc, x) => acc + x.getField("w")).as("S"))
    val targets = counts.crossJoin(broadcast(totals))
      .select(col(stratumCol),
        floor(lit(budget.toDouble) * col("w") / col("S") + 0.5)
          .cast(LongType).as("n_target"))
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(textCol)), col(idCol))
    docs.withColumn("__rn", row_number().over(w))
      .join(broadcast(targets), stratumCol)
      .filter(col("__rn") <= col("n_target"))
      .select(col(stratumCol), col(idCol),
        col("__rn").cast(LongType).as("sample_rank"))
      .orderBy(col(stratumCol), col("sample_rank"))
  }

  /** Count-based bigram language-model scoring — the KenLM-style
    * fluency filter of training-data pipelines. The corpus itself is
    * the training set: p(w2|w1) = c(w1 w2)/c(w1·) from corpus bigram
    * counts, and a document's score is the MEAN bigram probability
    * (documents full of corpus-typical transitions score high;
    * boilerplate with rare transitions scores low). Mean probability
    * rather than log-perplexity is deliberate: ln()'s last-ulp
    * rounding is libm-specific, while each p is one IEEE division and
    * the per-document sum is a SEQUENTIAL fold in position order
    * (sort_array of (pos, p) structs → aggregate), so the score is
    * bit-reproducible on any engine. Ranking by mean-p and by
    * perplexity differ in general; for a drop-the-tail quality gate
    * both order the pathological documents last.
    *
    * Shape: ONE explode; bigram counts are a map-side-combined
    * groupBy of it, prefix counts re-aggregate the (already tiny,
    * Heaps-sublinear) distinct-bigram table rather than the exploded
    * rows, and the finished (bigram, p) model — a model artifact, like
    * the tokenizer vocab — broadcasts back onto the exploded rows, so
    * corpus-sized data crosses the wire exactly once (the count
    * shuffle) plus the per-doc fold groupBy. Nothing is O(corpus²).
    * (A first formulation that re-aggregated and re-joined the
    * exploded rows per table cost 11 s at sf0.1; this one 1.5 s.)
    * The broadcast hint assumes a prunable/bounded model — the
    * operational shape of LM filtering; for an unpruned web-scale
    * bigram table drop the hint and the join degrades to sort-merge
    * without semantic change. */
  def bigramLmScore(docs: DataFrame,
                    textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    val toks = tokens(col(textCol))
    // bigram i = tok[i] ⧺ ' ' ⧺ tok[i+1], absent for 1-token docs.
    // zip_with over two slices, NOT transform(sequence, i =>
    // element_at(toks, i)): CollapseProject inlines the split() into
    // the lambda, so the per-index form re-tokenizes the document for
    // EVERY bigram — O(n²) per doc, measured 4.9 s for the explode
    // alone at sf0.1 vs 0.5 s for this form (the MinHash lesson
    // again; ProfileQ76).
    val bigrams = when(size(toks) < 2, array().cast("array<string>"))
      .otherwise(zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => concat(a, lit(" "), b)))
    // materialized once: the model counts AND the per-doc score join
    // both consume the exploded bigrams — un-checkpointed, the
    // tokenize + zip_with + explode pass runs twice (guide §2.4)
    val exploded = docs.select(col(idCol),
      posexplode(bigrams).as(Seq("pos", "bigram")))
      .localCheckpoint(true)
    val bigramCounts = exploded.groupBy(col("bigram"))
      .agg(count(lit(1)).as("c_bigram"))
    // c(w1·) = Σ over bigrams starting with w1 — computed from the
    // distinct-bigram table, not the corpus-sized exploded rows
    val prefix = element_at(split(col("bigram"), " ", 2), 1)
    val model = bigramCounts.withColumn("prefix", prefix)
      .withColumn("c_prefix",
        sum(col("c_bigram")).over(
          org.apache.spark.sql.expressions.Window.partitionBy("prefix")))
      .select(col("bigram"),
        (col("c_bigram").cast(DoubleType) / col("c_prefix")).as("p"))
    exploded.join(broadcast(model), "bigram")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        aggregate(array_sort(collect_list(struct(col("pos"), col("p")))),
          lit(0.0), (acc, x) => acc + x.getField("p")).as("__sum"))
      .select(col(idCol), col("n_bigrams"),
        (col("__sum") / col("n_bigrams")).as("lm_score"))
      .orderBy(idCol)
  }

  /** CCNet-style perplexity-bucket sampling (Wenzek et al. 2020 §4.3:
    * score with an LM, cut the corpus into equal fluency buckets,
    * keep head/middle, drop tail): documents are scored with
    * [[bigramLmScore]], cut into `keepFracs.size` equal ntile buckets
    * by (lm_score desc, id) — bucket 1 = most fluent — and bucket b
    * keeps its floor(frac_b·n_b + 0.5) min-k-md5 docs. Returns a
    * VERDICT per scored doc (id, lm_score, bucket, kept), the
    * manifest shape — filtering is the caller's one-liner. Docs with
    * no bigram (single-token) are unscored and absent, as in
    * [[bigramLmScore]].
    *
    * Scale shape: scoring is the q76 plan (distinct-bigram model
    * broadcast back); bucketing is ONE global ntile window (the
    * score ranking a production CCNet run sorts anyway) and the
    * per-bucket selection is a bucket-partitioned row_number — both
    * engine-exact, no RNG. */
  def perplexityBucketSample(docs: DataFrame,
                             keepFracs: Seq[Double] = Seq(1.0, 0.5, 0.0),
                             textCol: String = "text",
                             idCol: String = "doc_id"): DataFrame = {
    require(keepFracs.nonEmpty && keepFracs.forall(f => f >= 0 && f <= 1),
      "keepFracs must be fractions in [0, 1]")
    import org.apache.spark.sql.expressions.Window
    val scored = bigramLmScore(docs, textCol, idCol)
      .select(col(idCol), col("lm_score"))
    val bucketed = scored.withColumn("bucket",
      ntile(keepFracs.size).over(
        Window.orderBy(col("lm_score").desc, col(idCol))))
    bucketKeep(bucketed, keepFracs, idCol)
  }

  /** The per-bucket min-k-md5 keep verdict shared by
    * [[perplexityBucketSample]] and its sketch twin — bucket b keeps
    * its floor(frac_b·n_b + 0.5) smallest-md5 docs. */
  private def bucketKeep(bucketed: DataFrame, keepFracs: Seq[Double],
                         idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sel = Window.partitionBy("bucket")
      .orderBy(md5(concat_ws(":", lit("ppl"), col(idCol).cast("string"))),
        col(idCol))
    val szW = Window.partitionBy("bucket")
    val frac = keepFracs.zipWithIndex.foldLeft(lit(0.0)) {
      case (acc, (f, i)) =>
        when(col("bucket") === i + 1, lit(f)).otherwise(acc)
    }
    bucketed
      .withColumn("__rn", row_number().over(sel))
      .withColumn("__n", count(lit(1)).over(szW))
      .select(col(idCol), col("lm_score"),
        col("bucket").cast(LongType).as("bucket"),
        (col("__rn") <=
          floor(frac * col("__n").cast(DoubleType) + lit(0.5))
            .cast(LongType)).as("kept"))
      .orderBy(idCol)
  }

  /** [[perplexityBucketSample]]'s WAREHOUSE-SCALE twin (the
    * [[Analytics.rfmSketch]] discipline applied to the quality
    * family's one remaining global sort): fluency buckets are
    * VALUE-cut at histogram-estimated quantile bounds of lm_score —
    * one min/max pass and one ≤`buckets`-row map-side-combined
    * histogram aggregate over the eagerly-materialized (id, score)
    * frame replace the global ntile window, so nothing is globally
    * sorted at any corpus size. Bucket 1 is still the most fluent;
    * bounds carry the one-bucket-width error, so assignments agree
    * with the ntile cut for every doc ≥ one width from an exact
    * boundary (PplSketchSpec proves it), and TIED scores share a
    * bucket — for sampling, strictly saner than ntile's forced
    * equal-size split of identical-fluency docs. The per-bucket
    * min-k-md5 keep stage is byte-identical code to the exact path
    * ([[bucketKeep]]). Oracle-gated end-to-end as q175 (the
    * histogram arithmetic replays in SQL like q174's). */
  def perplexityBucketSampleSketch(docs: DataFrame,
                                   keepFracs: Seq[Double] =
                                     Seq(1.0, 0.5, 0.0),
                                   buckets: Int = 1024,
                                   textCol: String = "text",
                                   idCol: String = "doc_id"): DataFrame = {
    require(keepFracs.nonEmpty && keepFracs.forall(f => f >= 0 && f <= 1),
      "keepFracs must be fractions in [0, 1]")
    require(buckets >= keepFracs.size,
      "need at least as many histogram buckets as fluency buckets")
    import org.apache.spark.sql.expressions.Window
    val k = keepFracs.size
    val scored = bigramLmScore(docs, textCol, idCol)
      .select(col(idCol), col("lm_score"))
      .localCheckpoint(true)
    val stats = scored.agg(count(lit(1)).as("n"),
      min(col("lm_score")).as("lo"), max(col("lm_score")).as("hi")).head()
    val (n, lo, hi) = (stats.getAs[Long]("n"),
      stats.getAs[Double]("lo"), stats.getAs[Double]("hi"))
    require(n > 0, "no scored docs")
    val bounds: Seq[Double] =
      if (hi <= lo) Seq.empty // constant fluency: one bucket
      else {
        val w = (hi - lo) / buckets
        val hist = graft.ops.Sketch
          .histSketch(scored, "lm_score", lo, hi, buckets)
          .withColumn("cum", sum(col("cnt")).over(Window.orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("cum_prev", col("cum") - col("cnt"))
          .collect() // ≤ `buckets` rows by construction
          .map(r => (r.getAs[Int]("bucket"), r.getAs[Long]("cum"),
            r.getAs[Long]("cum_prev")))
        (1 until k).map { i =>
          val rank = math.ceil(i.toDouble / k * n - 1e-9).toLong
          val (b, cum, cumPrev) =
            hist.find { case (_, c, p) => c >= rank && p < rank }.get
          lo + w * (b.toDouble + (rank - cumPrev).toDouble / (cum - cumPrev))
        }
      }
    // descending value cut: the most fluent docs exceed every bound
    // → bucket k − (k−1) = 1; constant fluency → everyone bucket 1
    val gtCount = bounds
      .map(b => (col("lm_score") > lit(b)).cast(LongType))
      .foldLeft(lit(0L).cast(LongType))(_ + _)
    val bucketCol =
      if (bounds.isEmpty) lit(1) else (lit(k) - gtCount).cast("int")
    bucketKeep(scored.withColumn("bucket", bucketCol), keepFracs, idCol)
  }

  /** Materialize an EXPLICIT data mixture (the DoReMi/Dolma shape:
    * a tuned weight per source, not [[temperatureSample]]'s derived
    * sqrt weights): source s gets n_keep = min(floor(budget·w_s+0.5),
    * available_s) documents, chosen by the min-k md5 order every
    * sampler here shares. A source whose target exceeds its
    * inventory is CAPPED — the honest behavior for a static mix
    * (report the shortfall downstream rather than silently
    * re-weighting; sources without a weight are excluded). One
    * groupBy for inventories + one per-source selection window;
    * weights fold into literal CASE arms, so no second input or
    * join is needed. Output: (source, id, sample_rank). */
  def mixtureSample(docs: DataFrame, weights: Seq[(String, Double)],
                    budget: Int, sourceCol: String = "source",
                    idCol: String = "doc_id"): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "need non-empty positive weights")
    require(weights.map(_._1).distinct.size == weights.size,
      "source names must be distinct")
    import org.apache.spark.sql.expressions.Window
    // unlisted sources fall through to NULL and are filtered BEFORE
    // the least() — Spark's least() skips nulls, so folding the null
    // into it would silently keep a weightless source whole
    val wExpr = weights.foldLeft(lit(null).cast("double")) {
      case (acc, (s, w)) =>
        when(col(sourceCol) === lit(s), lit(w)).otherwise(acc)
    }
    val targets = docs.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("__avail"))
      .withColumn("__w", wExpr)
      .filter(col("__w").isNotNull)
      .select(col(sourceCol),
        least(floor(lit(budget.toDouble) * col("__w") + lit(0.5))
          .cast(LongType), col("__avail")).as("__keep"))
    val sel = Window.partitionBy(col(sourceCol))
      .orderBy(md5(concat_ws(":", lit("mix"), col(idCol).cast("string"))),
        col(idCol))
    docs.withColumn("__rn", row_number().over(sel))
      .join(broadcast(targets), sourceCol)
      .filter(col("__rn") <= col("__keep"))
      .select(col(sourceCol), col(idCol),
        col("__rn").cast(LongType).as("sample_rank"))
      .orderBy(col(sourceCol), col("sample_rank"))
  }

  /** [[mixtureSample]] with a TOKEN budget — the unit real mixes are
    * specified in (a 30%-code mix means 30% of TOKENS, not of
    * documents; doc-count mixing over-weights short-doc sources).
    * Source s greedily fills floor(tokenBudget·w_s + 0.5) tokens in
    * the md5 order: a doc is kept iff the running token total BEFORE
    * it is still under target (packSequences' streaming-fill rule,
    * so the crossing doc is included and every source overshoots by
    * < 1 doc). A source that runs out of documents simply
    * under-fills — the cap behavior of [[mixtureSample]], in token
    * units. Output: (source, id, n_tokens, cum_tokens). */
  def mixtureSampleTokens(docs: DataFrame, weights: Seq[(String, Double)],
                          tokenBudget: Long,
                          sourceCol: String = "source",
                          textCol: String = "text",
                          idCol: String = "doc_id"): DataFrame = {
    require(tokenBudget > 0, "tokenBudget must be positive")
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "need non-empty positive weights")
    require(weights.map(_._1).distinct.size == weights.size,
      "source names must be distinct")
    import org.apache.spark.sql.expressions.Window
    val wExpr = weights.foldLeft(lit(null).cast("double")) {
      case (acc, (s, w)) =>
        when(col(sourceCol) === lit(s), lit(w)).otherwise(acc)
    }
    val target = floor(lit(tokenBudget.toDouble) * wExpr + lit(0.5))
      .cast(LongType)
    val cumW = Window.partitionBy(col(sourceCol))
      .orderBy(md5(concat_ws(":", lit("mix"), col(idCol).cast("string"))),
        col(idCol))
    docs
      .withColumn("__w", wExpr).filter(col("__w").isNotNull)
      .withColumn("n_tokens", size(tokens(col(textCol))).cast(LongType))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(cumW))
      .filter(col("cum_tokens") - col("n_tokens") < target)
      .select(col(sourceCol), col(idCol), col("n_tokens"),
        col("cum_tokens"))
      .orderBy(col(sourceCol), col("cum_tokens"))
  }

  /** [[mixtureSample]] with EPOCH REPETITION — the up-sampling half
    * of mixture materialization (Pile/Dolma style: a high-value
    * source whose target exceeds its inventory is REPEATED for whole
    * epochs rather than capped at one pass). Source s with inventory
    * n_s and target t_s = min(floor(budget·w_s + 0.5), maxEpochs·n_s)
    * emits every document floor(t_s/n_s) times (epochs 1..full) plus
    * the first t_s − full·n_s documents of the shared min-k md5
    * order once more at epoch full+1 — so exactly t_s rows per
    * source unless the maxEpochs cap bites (the cap is the honest
    * bound: unbounded repetition of a tiny source is memorization,
    * not mixing). A target under inventory degenerates to
    * [[mixtureSample]] at epoch 1.
    *
    * Scale shape: one map-side-combined inventory aggregate
    * (broadcast back), one per-source selection window, and the
    * epoch fan-out is a narrow per-row `sequence`+`explode` whose
    * multiplicity is ≤ maxEpochs — no join ever exceeds output
    * cardinality Σ t_s. Output: (source, id, epoch, sample_rank). */
  def epochMixture(docs: DataFrame, weights: Seq[(String, Double)],
                   budget: Long, maxEpochs: Int = 4,
                   sourceCol: String = "source",
                   idCol: String = "doc_id"): DataFrame = {
    // budget 0 (e.g. an empty corpus counted at the call site) is a
    // valid degenerate input: every target floors to 0 and the mix
    // is empty — matching the oracle, which cannot throw
    require(budget >= 0, "budget must be non-negative")
    require(maxEpochs >= 1, "maxEpochs must be >= 1")
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "need non-empty positive weights")
    require(weights.map(_._1).distinct.size == weights.size,
      "source names must be distinct")
    import org.apache.spark.sql.expressions.Window
    val wExpr = weights.foldLeft(lit(null).cast("double")) {
      case (acc, (s, w)) =>
        when(col(sourceCol) === lit(s), lit(w)).otherwise(acc)
    }
    val targets = docs.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__w", wExpr)
      .filter(col("__w").isNotNull)
      .select(col(sourceCol), col("__n"),
        least(floor(lit(budget.toDouble) * col("__w") + lit(0.5))
            .cast(LongType),
          lit(maxEpochs.toLong) * col("__n")).as("__t"))
      .select(col(sourceCol), col("__n"),
        // `div` is exact integral division (the oracle's `//`) — a
        // double-divide-then-cast is only floor-exact while the
        // quotient stays >½ulp from an integer
        expr("__t div __n").as("__full"),
        (col("__t") % col("__n")).as("__rem"))
    val sel = Window.partitionBy(col(sourceCol))
      .orderBy(md5(concat_ws(":", lit("epoch"), col(idCol).cast("string"))),
        col(idCol))
    val nEp = col("__full") +
      when(col("__rn") <= col("__rem"), lit(1L)).otherwise(lit(0L))
    docs.withColumn("__rn", row_number().over(sel))
      .join(broadcast(targets), sourceCol)
      .withColumn("epoch", explode(when(nEp >= 1,
        sequence(lit(1L), nEp)).otherwise(array())))
      .select(col(sourceCol), col(idCol), col("epoch"),
        col("__rn").cast(LongType).as("sample_rank"))
      .orderBy(col(sourceCol), col(idCol), col("epoch"))
  }

  /** [[decontaminate]] against MULTIPLE eval benchmarks at once, with
    * per-benchmark attribution — production decontamination screens
    * dozens of eval sets and must report WHICH benchmark each doc
    * overlaps (different benchmarks get different thresholds and
    * different takedown policies). One corpus pass: the per-set
    * pooled shingle vocabularies are unioned with their set ids and
    * broadcast; a corpus shingle joins every pool it hits; the
    * per-doc denominator comes from the same exploded frame via one
    * doc-partitioned window (no second scan). Emits only (doc, set)
    * pairs with ≥ 1 hit — the attribution report, bounded by actual
    * overlap, not |corpus|×|sets|. */
  def decontaminateMulti(corpus: DataFrame, evalSets: DataFrame,
                         n: Int = 5, threshold: Double = 0.5,
                         setCol: String = "eval_id",
                         textCol: String = "text",
                         idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sh = graft.functions.TextExpressions
      .sorted_distinct_shingles(tokens(col(textCol)), n)
    val pools = evalSets
      .select(col(setCol), explode(sh).as("shingle")).distinct()
    corpus.select(col(idCol), explode(sh).as("shingle"))
      .withColumn("n_shingles",
        count(lit(1)).over(Window.partitionBy(idCol)))
      .join(broadcast(pools), Seq("shingle"))
      .groupBy(col(idCol), col(setCol))
      .agg(max(col("n_shingles")).as("n_shingles"),
        count(lit(1)).as("n_matched"))
      .withColumn("overlap",
        col("n_matched").cast(DoubleType) / col("n_shingles"))
      .withColumn("contaminated", col("overlap") >= threshold)
      .orderBy(idCol, setCol)
  }

  /** Normalization key for case/punctuation-insensitive exact dedup
    * (the C4/CCNet normalize-before-dedup stage): lowercase, strip
    * everything outside [a-z0-9 ], collapse runs of spaces, trim.
    * Restricted to regex constructs with identical semantics in
    * Java regex and RE2 (the [[piiScrub]] discipline). */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(c), "[^a-z0-9 ]", ""), " +", " "))

  /** Exact dedup on the NORMALIZED text: keeps the minimum id per
    * normalization class — catches case-variant and
    * punctuation-variant duplicates plain exact dedup misses, while
    * staying one hash-groupBy (the q20 scale shape). The group key is
    * md5 of the normalized text, so only (32-char key, id) cross the
    * exchange — never document bodies. At 50k short docs this is
    * cost-parity with grouping the text itself (4.4–4.6 s measured
    * both ways — hashing CPU ≈ exchange savings locally); the md5
    * key is chosen for the 100 TB shape, where exchange bytes
    * dominate and documents are long. md5 is computed identically by
    * DuckDB, so the hashed key costs no oracle exactness. Returns
    * surviving ids. */
  def normalizedExactDedup(docs: DataFrame,
                           textCol: String = "text",
                           idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol), md5(normalizeText(col(textCol))).as("__k"))
      .groupBy(col("__k")).agg(min(col(idCol)).as(idCol))
      .select(idCol)
      .orderBy(idCol)

  /** Per-source corpus report card — the monitoring aggregate a
    * production pipeline publishes per ingest source: volume, token
    * mass, length profile, and the short-document fraction that
    * feeds the quality gate. All integer aggregates plus exact
    * percentile and single IEEE divisions — engine-exact. One
    * map-side-combined groupBy. */
  def sourceReport(docs: DataFrame, minTokens: Long = 30,
                   textCol: String = "text"): DataFrame = {
    val nTok = size(tokens(col(textCol))).cast(LongType)
    docs.select(col("source"), col("lang"), col("n_chars"),
        nTok.as("__t"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("__t")).as("total_tokens"),
        expr("percentile(n_chars, 0.9)").as("p90_chars"),
        sum(when(col("__t") < minTokens, 1L).otherwise(0L)).as("n_short"))
      .withColumn("avg_tokens",
        col("total_tokens").cast(DoubleType) / col("n_docs"))
      .withColumn("short_frac",
        col("n_short").cast(DoubleType) / col("n_docs"))
      .orderBy("source")
  }

  /** VOCABULARY COVERAGE curve — the artifact that sizes a
    * tokenizer's vocabulary: for each candidate vocab size 2^j
    * (j = 0..`maxLog2`), the fraction of the corpus TOKEN MASS
    * covered by the 2^j most frequent types (frequency desc, type
    * asc). The knee of this curve is where vocab growth stops paying;
    * the complement of the q130 OOV report (that measures one chosen
    * vocab, this measures every candidate size at once).
    *
    * Scale shape: the corpus reduces to (type, count) — vocab-sized —
    * in one map-side-combined groupBy. The global frequency rank is
    * the [[budgetSelect]] two-level prefix discipline with the COUNT
    * VALUE as the bucket (per-count totals give offsets over a
    * bounded distinct-count frame; within-count ranking partitions by
    * count) — no vocab-sized single-partition window. The curve
    * itself is a broadcast threshold join over vocab-sized rows.
    *
    * Determinism: integer counts and ranks, one IEEE division per
    * curve point. Output: (vocab_size, n_types, tokens_covered,
    * coverage), ordered by vocab_size. */
  def vocabCoverageCurve(docs: DataFrame, maxLog2: Int = 16,
                         textCol: String = "text"): DataFrame = {
    require(maxLog2 >= 0 && maxLog2 <= 40, "need 0 <= maxLog2 <= 40")
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    import spark.implicits._
    val counts = docs
      .select(explode(tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    // two-level exact rank in (cnt desc, w asc) order: offsets from
    // per-count totals (distinct-count-bounded window), within-count
    // row_number partitioned by cnt
    val ctot = counts.groupBy("cnt").agg(count(lit(1)).as("__n"))
    val off = ctot.withColumn("__off",
      coalesce(sum("__n").over(Window.orderBy(col("cnt").desc)
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("cnt"), col("__off"))
    val ranked = counts.join(broadcast(off), Seq("cnt"))
      .withColumn("rank", col("__off") + row_number().over(
        Window.partitionBy("cnt").orderBy("w")))
    val total = counts.agg(sum("cnt").as("__total"))
    val sizes = (0 to maxLog2).map(j => 1L << j).toDF("vocab_size")
    ranked.crossJoin(broadcast(sizes))
      .filter(col("rank") <= col("vocab_size"))
      .groupBy("vocab_size")
      .agg(count(lit(1)).as("n_types"),
        sum("cnt").as("tokens_covered"))
      .crossJoin(broadcast(total))
      .select(col("vocab_size"), col("n_types"), col("tokens_covered"),
        (col("tokens_covered").cast(DoubleType) / col("__total"))
          .as("coverage"))
      .orderBy("vocab_size")
  }

  /** Pairwise SOURCE VOCABULARY overlap — the cross-source affinity /
    * contamination matrix: for every unordered source pair, the two
    * vocabulary sizes, the shared-word count, and the vocabulary
    * Jaccard. High overlap between supposedly-independent sources is
    * the first signal of shared upstream scrapes (and the cheap
    * precursor to the document-level q105 cross-source dup audit);
    * near-zero overlap flags a source the tokenizer/LM will treat as
    * out-of-domain.
    *
    * Scale shape: the corpus reduces to DISTINCT (source, word) —
    * vocabulary-sized, bodies never shuffle. The pair join is on
    * `word` with per-key multiplicity bounded by the SOURCE COUNT
    * (each word appears once per source), so join output is
    * O(vocab · S²/2) worst-case with S small — no corpus-sized
    * blowup possible. The complete matrix (including zero-overlap
    * pairs) comes from the S²-row size cross, a driver-trivial frame.
    *
    * Determinism: integer counts + one IEEE division. Output:
    * (src_a, src_b, n_a, n_b, n_common, jaccard), src_a < src_b,
    * ordered. */
  def sourceVocabOverlap(docs: DataFrame, textCol: String = "text",
                         srcCol: String = "source"): DataFrame = {
    val vocab = docs.select(col(srcCol).as("src"),
      explode(tokens(col(textCol))).as("word")).distinct()
    val sizes = vocab.groupBy("src").agg(count(lit(1)).as("n"))
    val inter = vocab.as("a").join(vocab.as("b"),
        col("a.word") === col("b.word") && col("a.src") < col("b.src"))
      .groupBy(col("a.src").as("src_a"), col("b.src").as("src_b"))
      .agg(count(lit(1)).as("__common"))
    val pairs = sizes.select(col("src").as("src_a"), col("n").as("n_a"))
      .join(sizes.select(col("src").as("src_b"), col("n").as("n_b")),
        col("src_a") < col("src_b"))
    pairs.join(inter, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
        coalesce(col("__common"), lit(0L)).as("n_common"))
      .withColumn("jaccard", col("n_common").cast(DoubleType) /
        (col("n_a") + col("n_b") - col("n_common")))
      .orderBy("src_a", "src_b")
  }

  /** Characteristic terms per document: rational-idf TF-IDF top-k.
    * score = tf · (N/df) — for any fixed corpus this ranks per
    * document identically to tf·idf with idf = N/df; the classic
    * log-idf damping is deliberately NOT applied because ln()'s
    * last-ulp rounding is libm-specific and would break cross-engine
    * reproducibility (the same reason [[ppsSample]] avoids pow). The
    * arithmetic is two IEEE ops (one multiply, one divide) in fixed
    * order — bit-exact anywhere. Ties break on term asc.
    *
    * Shape: explode → (doc, term) count (map-side combined), a
    * vocab-sized df aggregate joined back (broadcast at any realistic
    * vocab), and one doc-partitioned window — WindowGroupLimit keeps
    * the top-k per partition before the final rank at scale. */
  def tfIdfTopTerms(docs: DataFrame, k: Int,
                    textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    require(k > 0, "k must be positive")
    import org.apache.spark.sql.expressions.Window
    val tf = docs.select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(n))
      .withColumn("score",
        col("tf").cast(DoubleType) * col("n_docs") / col("df"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank").cast(LongType).as("rank"),
        col("term"), col("tf"), col("df"), col("score"))
      .orderBy(col(idCol), col("rank"))
  }

  /** Exact duplicated-span detection — the corpus-wide k-token-window
    * audit behind exact substring dedup (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better"),
    * re-expressed as two Spark aggregations instead of a suffix
    * array: every stride-1 window of `k` tokens is counted across
    * documents, a window occurring in ≥ `minDf` distinct documents is
    * a duplicated span, and each document reports what fraction of
    * its distinct windows are duplicated (`flagged` when the fraction
    * reaches `flagRatio` — the "mostly boilerplate" drop signal).
    *
    * Shape: one corpus scan explodes per-document DISTINCT windows,
    * immediately reduced to `(doc_id, xxhash64(window))` so the
    * shuffle carries 16 bytes per corpus token, never window text.
    * The document frequency is a count over a window-hash-partitioned
    * frame (ONE shuffle — a groupBy+self-join here would clone the
    * whole explode subtree into both branches, the q72 pathology),
    * then the per-doc rollup map-side combines on doc_id. A
    * boilerplate span occurring in millions of documents skews its
    * hash partition; the mitigation at that scale is the same
    * two-level count used by [[ops.Skew]] salting — counts are
    * additive — without changing results.
    *
    * Determinism: counts are integers and the ratio one IEEE
    * division. An engine replaying window STRINGS (the DuckDB oracle)
    * matches exactly unless two distinct windows collide in xxhash64
    * (~n²/2⁶⁵ — vanishing for any corpus the oracle can hold, and a
    * deterministic, inspectable event if it ever fires). */
  def dupSpans(docs: DataFrame, k: Int = 8, minDf: Long = 2,
               flagRatio: Double = 0.5, textCol: String = "text",
               idCol: String = "doc_id"): DataFrame = {
    require(k > 0 && minDf >= 2 && flagRatio > 0,
      "need k > 0, minDf >= 2, flagRatio > 0")
    import org.apache.spark.sql.expressions.Window
    val toks = tokens(col(textCol))
    // full windows only (positions 0..n-k); shorter documents have no
    // k-window and fall out of the explode (restored by the left join)
    val wins = when(size(toks) >= k,
      transform(sequence(lit(0), size(toks) - k),
        i => array_join(slice(toks, i + 1, lit(k)), " ")))
      .otherwise(array())
    val pairs = docs
      .select(col(idCol), explode(array_distinct(wins)).as("win"))
      .select(col(idCol), xxhash64(col("win")).as("wh"))
    val withDf = pairs.withColumn("df",
      count(lit(1)).over(Window.partitionBy("wh")))
    val perDoc = withDf.groupBy(idCol)
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("df") >= minDf, 1L).otherwise(0L)).as("n_dup_windows"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"))
      .withColumn("dup_ratio",
        when(col("n_windows") > 0,
          col("n_dup_windows").cast(DoubleType) / col("n_windows"))
          .otherwise(lit(0.0)))
      .withColumn("flagged", col("dup_ratio") >= flagRatio)
      .orderBy(idCol)
  }

  /** Stride-1 k-token window hashes over a (id, toks) frame —
    * (id, p, wh) with p the 0-based window start and wh =
    * xxhash64 of the space-joined window. The ONE extraction both
    * [[slidingScrub]] and [[maxDupSpans]] build on (a drifted copy
    * would make the scrub and the audit disagree about which spans
    * are duplicated).
    *
    * greatest(…, 0) clamp: InferFiltersFromGenerate derives a
    * size(…) > 0 predicate from the explode and pushes it BELOW the
    * length filter, so the expression must be total — an unclamped
    * sequence(0, n−k) descends into negative indices on a short doc
    * and slice(…, 0, …) throws before the filter ever runs. The
    * clamp changes nothing for surviving rows (n−k ≥ 0 there). */
  private def stride1WindowHashes(base: DataFrame, k: Int,
                                  idCol: String): DataFrame =
    base.filter(size(col("toks")) >= k)
      .select(col(idCol), posexplode(
        transform(sequence(lit(0), greatest(size(col("toks")) - k, lit(0))),
          i => array_join(slice(col("toks"), i + 1, lit(k)), " "))))
      .select(col(idCol), col("pos").as("p"), xxhash64(col("col")).as("wh"))

  /** MAXIMAL duplicated-span extraction — the variable-length upgrade
    * of the [[dupSpans]] audit: instead of reporting window counts,
    * report each document's maximal contiguous duplicated token
    * REGIONS (start, length, text), the artifact a curation team
    * actually inspects ("what exactly is boilerplate here, and how
    * long is it"). Every stride-1 `k`-token window occurring in
    * ≥ `minDf` distinct documents marks its positions; positions
    * whose k-token coverage intervals touch or overlap (gap ≤ k)
    * merge into one maximal region via gaps-and-islands — so a
    * duplicated span of ANY length ≥ k, at ANY alignment, surfaces as
    * one region of its exact token extent, where the tumbling q96
    * blocks round to block boundaries and fixed-k audits report only
    * ratios.
    *
    * Shape: the [[dupSpans]] discipline throughout — windows reduce
    * to (id, pos, xxhash64(win)) before any exchange; document
    * frequency is one count over the hash-partitioned distinct
    * (id, hash) pairs; the island merge is a lag+running-sum window
    * pair over the SAME (id)-partitioned sort (one shuffle); span
    * text is sliced only for the final, dup-mass-bounded output join.
    *
    * Determinism: integer positions, integer counts, first-window
    * coverage arithmetic — the DuckDB oracle replays window STRINGS
    * and matches hash-exact modulo xxhash64 collisions (~n²/2⁶⁵).
    * Output: (id, start_pos, span_tokens, n_windows, span_text),
    * ordered by (id, start_pos). */
  def maxDupSpans(docs: DataFrame, k: Int = 8, minDf: Long = 2,
                  textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame = {
    require(k > 0 && minDf >= 2, "need k > 0, minDf >= 2")
    import org.apache.spark.sql.expressions.Window
    val base = docs.select(col(idCol), tokens(col(textCol)).as("toks"))
    // materialized once: the df filter AND the position join both
    // consume the window hashes — un-checkpointed, the tokenize +
    // stride-1 hash pass runs twice (guide §2.4). (id, p, wh) rows
    // only; token arrays stay out.
    val wins = stride1WindowHashes(base, k, idCol).localCheckpoint(true)
    val dupPairs = wins.select(col(idCol), col("wh")).distinct()
      .withColumn("df", count(lit(1)).over(Window.partitionBy("wh")))
      .filter(col("df") >= minDf)
      .select(col(idCol), col("wh"))
    val dupPos = wins.join(dupPairs, Seq(idCol, "wh"))
      .select(col(idCol), col("p"))
    val ord = Window.partitionBy(idCol).orderBy("p")
    val spans = dupPos
      // coverage intervals [p, p+k) merge when the position gap ≤ k
      // (touching or overlapping); a null lag (first position) opens
      // a region in both engines (null comparison → otherwise/ELSE)
      .withColumn("newgrp",
        when(col("p") - lag("p", 1).over(ord) <= k, 0).otherwise(1))
      .withColumn("grp", sum("newgrp").over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("grp"))
      .agg(min("p").as("s"), (max("p") - min("p") + k).as("n"),
        count(lit(1)).as("nw"))
    spans.join(base, Seq(idCol))
      .select(col(idCol), col("s").cast(LongType).as("start_pos"),
        col("n").cast(LongType).as("span_tokens"),
        col("nw").as("n_windows"),
        array_join(slice(col("toks"), col("s") + 1, col("n")), " ")
          .as("span_text"))
      .orderBy(col(idCol), col("start_pos"))
  }

  /** CONTENT-DEFINED chunking dedup audit — the rsync/CDC recipe at
    * token granularity: a token whose hash satisfies the boundary
    * predicate (first 4 md5 hex digits mod 2^`maskBits` = 0) CLOSES a
    * chunk, so chunk boundaries are decided by content, not position.
    * An insertion or deletion perturbs only the chunk it lands in —
    * boundaries downstream re-synchronize — where fixed tumbling
    * blocks ([[spanScrub]]) misalign every block after the edit.
    * Chunks are then deduplicated corpus-wide by md5 (first
    * occurrence by (doc, chunk) keeps), and each document reports its
    * duplicated-chunk mass. Mean chunk length ≈ 2^maskBits tokens.
    *
    * Scale shape: chunking is entirely IN-ROW (higher-order
    * functions build the variable spans from the boundary-position
    * array — no token explode, no body shuffle); only
    * (id, chunk_idx, md5, n_tok) rows reach the first-occurrence
    * exchange, partitioned by chunk hash. The rollup map-side
    * combines on id.
    *
    * Determinism: md5 predicate + md5 chunk keys replay on any
    * engine; integer counts, one IEEE division. Output: (id,
    * n_tokens, n_chunks, n_dup_chunks, n_dup_tokens, dup_ratio),
    * ordered by id. */
  def cdcChunkAudit(docs: DataFrame, maskBits: Int = 4,
                    textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    require(maskBits >= 1 && maskBits <= 16, "need 1 <= maskBits <= 16")
    import org.apache.spark.sql.expressions.Window
    val modulus = 1L << maskBits
    val isB = (t: Column) =>
      conv(substring(md5(t), 1, 4), 16, 10).cast(LongType) % modulus === 0
    val n = size(col("toks"))
    val bpos = filter(sequence(lit(1), n),
      i => isB(element_at(col("toks"), i)))
    val starts = concat(array(lit(1)), transform(bpos, _ + lit(1)))
    val ends = concat(bpos, array(n))
    // a trailing boundary token yields an empty (start > end) span —
    // dropped, matching the window-numbering replay exactly
    val spans = filter(
      zip_with(starts, ends, (s, e) => struct(s.as("s"), e.as("e"))),
      p => p.getField("s") <= p.getField("e"))
    val chunks = docs.select(col(idCol), tokens(col(textCol)).as("toks"))
      .select(col(idCol), posexplode(transform(spans, p =>
        struct(
          (p.getField("e") - p.getField("s") + 1).as("n_tok"),
          md5(array_join(slice(col("toks"), p.getField("s"),
            p.getField("e") - p.getField("s") + 1), " ")).as("h")))))
      .select(col(idCol), col("pos").as("chunk_idx"),
        col("col.n_tok").cast(LongType).as("n_tok"), col("col.h").as("h"))
    val marked = chunks.withColumn("__rn", row_number().over(
      Window.partitionBy("h").orderBy(col(idCol), col("chunk_idx"))))
    marked.groupBy(col(idCol))
      .agg(sum("n_tok").as("n_tokens"),
        count(lit(1)).as("n_chunks"),
        sum(when(col("__rn") > 1, 1L).otherwise(0L)).as("n_dup_chunks"),
        sum(when(col("__rn") > 1, col("n_tok")).otherwise(0L))
          .as("n_dup_tokens"))
      .withColumn("dup_ratio",
        col("n_dup_tokens").cast(DoubleType) / col("n_tokens"))
      .orderBy(idCol)
  }

  /** Gopher-style document quality rules (Rae et al. 2021 §A1.1):
    * instead of [[qualityScore]]'s continuous signals, a fixed rule
    * battery with a per-rule verdict, an overall pass, and the FIRST
    * failing rule as the reject reason — the shape a production
    * curation pipeline reports (rejection-reason histograms drive
    * threshold tuning). Thresholds are constructor parameters;
    * defaults are tuned so every rule discriminates on the synthetic
    * corpus (no vacuously-true branch).
    *
    * Pure columnar expressions over one scan — codegen'd,
    * shuffle-free, linear at any corpus size. Integer counts + two
    * IEEE divisions keep every column engine-exact. */
  def gopherRules(docs: DataFrame,
                  minTokens: Int = 20, maxTokens: Int = 90,
                  minMeanLen: Double = 4.0, maxMeanLen: Double = 10.0,
                  minStopwords: Int = 2,
                  minDistinctRatio: Double = 0.35,
                  textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame =
    gopherRulesUnsorted(docs, minTokens, maxTokens, minMeanLen,
      maxMeanLen, minStopwords, minDistinctRatio, textCol, idCol)
      .orderBy(idCol)

  /** [[gopherRules]] without the presentation sort — the form a
    * STREAMING ingest gate composes (global sorts are illegal on
    * unbounded inputs; every rule here is a stateless per-row
    * expression, so the battery applies to a stream unchanged —
    * [[graft.streaming.GateStream]]). `carryCols` are passed through
    * the projection so a caller can keep e.g. the text column without
    * re-joining (a stream-stream join is exactly what a stateless
    * gate must avoid). */
  def gopherRulesUnsorted(docs: DataFrame,
                  minTokens: Int = 20, maxTokens: Int = 90,
                  minMeanLen: Double = 4.0, maxMeanLen: Double = 10.0,
                  minStopwords: Int = 2,
                  minDistinctRatio: Double = 0.35,
                  textCol: String = "text",
                  idCol: String = "doc_id",
                  carryCols: Seq[String] = Nil): DataFrame = {
    val toks = tokens(col(textCol))
    val nTok = size(toks)
    val nStop = size(filter(toks, t => t.isin(Stopwords.map(x => x: Any): _*)))
    // single-space-joined text: word chars = length - (n_tokens - 1)
    val meanLen = (length(col(textCol)) - (nTok - 1)).cast(DoubleType) / nTok
    val distinctRatio = size(array_distinct(toks)).cast(DoubleType) / nTok
    docs.select(col(idCol) +: carryCols.map(col) :+
        nTok.cast(LongType).as("n_tokens") :+
        meanLen.as("mean_word_len") :+
        nStop.cast(LongType).as("n_stopwords") :+
        distinctRatio.as("distinct_ratio"): _*)
      .withColumn("r_word_count",
        col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens)
      .withColumn("r_word_len",
        col("mean_word_len") >= minMeanLen &&
          col("mean_word_len") <= maxMeanLen)
      .withColumn("r_stopword", col("n_stopwords") >= minStopwords)
      .withColumn("r_repetition", col("distinct_ratio") >= minDistinctRatio)
      .withColumn("passes",
        col("r_word_count") && col("r_word_len") &&
          col("r_stopword") && col("r_repetition"))
      .withColumn("reject_reason",
        when(!col("r_word_count"), lit("word_count"))
          .when(!col("r_word_len"), lit("word_len"))
          .when(!col("r_stopword"), lit("stopword"))
          .when(!col("r_repetition"), lit("repetition")))
  }

  /** Shared stage outputs of the v2 curation pipeline — ONE
    * definition of the stages so [[curateCorpusV2]] and
    * [[curationManifest]] cannot drift apart: (rule verdicts,
    * near-dup cluster survivor ids, temperature sample). */
  private def curationStages(docs: DataFrame, budget: Int,
                             jaccardThreshold: Double,
                             stratumCol: String, textCol: String,
                             idCol: String)
      : (DataFrame, DataFrame, DataFrame) = {
    // rules checkpoint: the pass gate feeds FOUR downstream plan
    // branches (candidates, verify sets, dedup scores, the surviving
    // semi-join) and the manifest re-reads the verdicts — un-
    // checkpointed, the full gopherRules expression battery runs once
    // per branch (guide §2.4). (id, verdicts) rows only; the UNSORTED
    // variant, so the checkpoint doesn't materialize the presentation
    // sort no stage consumer needs (joins are order-blind).
    val rules = gopherRulesUnsorted(docs, textCol = textCol,
        idCol = idCol)
      .localCheckpoint(true)
    val passed = docs.join(rules.filter(col("passes")).select(col(idCol)),
      Seq(idCol), "left_semi")
    val verified = Dedup.jaccardVerify(
        Dedup.minHashCandidates(passed, textCol = textCol, idCol = idCol),
        passed, shingleLen = Dedup.ShingleLen,
        textCol = textCol, idCol = idCol)
      .filter(col("jaccard") >= jaccardThreshold)
    val kept = Components.componentDedupBest(
      passed.select(col(idCol)), verified,
      passed.select(col(idCol),
        size(tokens(col(textCol))).cast(LongType).as("score")),
      idCol = idCol, srcCol = "id_a", dstCol = "id_b")
      .localCheckpoint(true) // ids only; feeds the sampling semi-join
                             // AND the manifest decision join
    val surviving = docs.join(kept, Seq(idCol), "left_semi")
    val sampled = temperatureSample(surviving, budget, stratumCol,
      textCol, idCol)
    (rules, kept, sampled)
  }

  /** End-to-end curation v2 — the r6 operators chained the way a
    * production pipeline runs them: [[gopherRules]] pass gate →
    * MinHash-LSH candidates + exact shingle-Jaccard verify →
    * [[Components.componentDedupBest]] keeping the LONGEST member of
    * each near-dup cluster → [[temperatureSample]] (α = 0.5)
    * rebalancing what survives. Returns (stratum, doc_id,
    * sample_rank), the training-mix manifest.
    *
    * Every stage is ids-only where it can be: the rule gate passes
    * ids into a semi-join, the cluster stage shuffles candidate ids
    * and shingle sets only, and document bodies are only re-read for
    * the final sampling window. Stage-by-stage determinism (integer
    * rules, exact verify, integer argmax, md5 min-k) makes the WHOLE
    * composite replayable by the DuckDB oracle — rules CTE →
    * recursive closure + argmax → sqrt-target window. */
  def curateCorpusV2(docs: DataFrame, budget: Int,
                     jaccardThreshold: Double = 0.8,
                     stratumCol: String = "lang",
                     textCol: String = "text",
                     idCol: String = "doc_id"): DataFrame =
    curationStages(docs, budget, jaccardThreshold, stratumCol,
      textCol, idCol)._3

  /** Per-document curation MANIFEST: the [[curateCorpusV2]] pipeline
    * with full decision lineage — every input doc labeled with WHY it
    * survived or died ('rejected_rule' + the first failing rule,
    * 'near_dup' = lost its cluster to a longer member, 'sampled_out'
    * = survived the gates but fell outside the temperature budget,
    * 'kept' + its sample_rank). This is the explainability artifact
    * audits and takedown requests need — and it is pure column logic
    * over the [[curationStages]] outputs, so it costs three
    * broadcast-or-id-only joins beyond the pipeline itself. */
  def curationManifest(docs: DataFrame, budget: Int,
                       jaccardThreshold: Double = 0.8,
                       stratumCol: String = "lang",
                       textCol: String = "text",
                       idCol: String = "doc_id"): DataFrame = {
    val (rules, kept, sampled) = curationStages(docs, budget,
      jaccardThreshold, stratumCol, textCol, idCol)
    docs.select(col(idCol), col(stratumCol))
      .join(rules.select(col(idCol), col("passes"), col("reject_reason")),
        Seq(idCol))
      .join(kept.select(col(idCol)).withColumn("__kept", lit(1)),
        Seq(idCol), "left")
      .join(sampled.select(col(idCol), col("sample_rank")),
        Seq(idCol), "left")
      .select(col(idCol), col(stratumCol),
        when(!col("passes"), lit("rejected_rule"))
          .when(col("__kept").isNull, lit("near_dup"))
          .when(col("sample_rank").isNull, lit("sampled_out"))
          .otherwise(lit("kept")).as("decision"),
        col("reject_reason").as("reason"),
        col("sample_rank"))
      .orderBy(idCol)
  }

  /** Curation v3 — the RELEASE-SHAPE composite over the r7-cont
    * operators, proving they compose: (1) per-source quantile gate on
    * the q89 classifier ([[scoreQuantileNorm]] — drop the bottom
    * dropFrac of EVERY source, not a skewed global cutoff), (2) exact
    * stratified eval carving among survivors
    * ([[Split.stratifiedSplit]] — test/val sized per stratum), (3)
    * epoch-repetition mixture of the TRAIN partition
    * ([[epochMixture]], budget = |train|, one count job). Output is
    * the per-document release manifest: (id, source, stratum,
    * decision ∈ dropped_quality|test|val|train, n_epochs) — n_epochs
    * counts the doc's appearances in the final mix (0 for eval docs,
    * quality drops, and train docs of unlisted sources).
    *
    * Scale shape: each stage's own contract (one window per source /
    * per stratum, broadcastable targets), chained by ids-only
    * semi-joins — the q81/q86 composite discipline. */
  def curationV3(docs: DataFrame, dropFrac: Double,
                 evalFracs: Seq[(String, Double)],
                 weights: Seq[(String, Double)], maxEpochs: Int,
                 strataCol: String = "lang",
                 sourceCol: String = "source",
                 textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame = {
    // each stage's ids-only outcome is localCheckpointed: the final
    // manifest reads every stage from THREE sinks (the budget count,
    // the next stage's semi-join, the output join) — uncached, the
    // classifier scan and both rank windows would run 3-4× per call.
    // Checkpointed frames carry (id, flag) only — corpus-row-bounded,
    // never the bodies.
    val scoredIds = scoreQuantileNorm(
      docs.select(col(idCol), col(sourceCol),
        qualityProb(textCol).as("clf_prob")),
      dropFrac, sourceCol, "clf_prob", idCol)
      .select(col(idCol), col("keep")).localCheckpoint()
    val kept = docs.join(
      scoredIds.filter(col("keep")).select(col(idCol)), idCol)
    val splitIds = Split.stratifiedSplit(kept, evalFracs,
        Seq(strataCol), idCol = idCol)
      .select(col(idCol), col("split")).localCheckpoint()
    val trainIds = splitIds.filter(col("split") === "train")
      .select(col(idCol))
    val train = kept.join(trainIds, idCol)
    val epochs = epochMixture(train, weights, budget = trainIds.count(),
      maxEpochs, sourceCol, idCol)
    val nEp = epochs.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_epochs"))
    docs.select(col(idCol), col(sourceCol), col(strataCol))
      .join(scoredIds, idCol)
      .join(splitIds, Seq(idCol), "left")
      .join(nEp, Seq(idCol), "left")
      .select(col(idCol), col(sourceCol), col(strataCol),
        when(!col("keep"), lit("dropped_quality"))
          .otherwise(col("split")).as("decision"),
        coalesce(col("n_epochs"), lit(0L)).as("n_epochs"))
      .orderBy(idCol)
  }

  /** C4-style duplicated-span REMOVAL — the rewriting sibling of the
    * [[dupSpans]] audit (Raffel et al. 2020 §2.2 remove repeated
    * spans; here at token-block granularity since the synthetic
    * corpus has no sentence boundaries). Each document is chopped
    * into TUMBLING k-token blocks (block b covers tokens
    * [b·k, b·k+k); the trailing remainder shorter than k is kept
    * verbatim — it can never equal a full block). A block instance
    * survives iff it is the corpus-wide FIRST occurrence of its text,
    * ordered by (doc_id, block_idx); every later instance — across
    * documents or within one — is dropped. Survivors rejoin in
    * original order.
    *
    * Scale shape: tumbling (not sliding) blocks mean every token is
    * in EXACTLY ONE block, so the (block_text, doc, idx) shuffle
    * carries ≈ the corpus once — no k× sliding-window blowup, which
    * is why this groups the span TEXT itself (hash-exact, oracle-
    * replayable) where the sliding audit had to hash. First-
    * occurrence selection is one min(struct(doc,idx)) window per
    * block text; reassembly is one per-doc sort-merge of the
    * surviving blocks. Output: (id, text, n_blocks, n_dropped). */
  def spanScrub(docs: DataFrame, k: Int = 8,
                textCol: String = "text",
                idCol: String = "doc_id"): DataFrame = {
    require(k > 0, "need k > 0")
    import org.apache.spark.sql.expressions.Window
    val toks = tokens(col(textCol))
    val nFull = (size(toks) / k).cast("int")
    val base = docs.select(col(idCol), toks.as("toks"),
      nFull.as("n_blocks"))
    // (doc, b, block text) for the full blocks; remainder kept aside
    val blocks = base
      .select(col(idCol), col("n_blocks"),
        posexplode_outer(when(col("n_blocks") > 0,
          sequence(lit(0), col("n_blocks") - 1)).otherwise(array())),
        col("toks"))
      .select(col(idCol), col("n_blocks"), col("col").as("b"),
        when(col("col").isNotNull,
          array_join(slice(col("toks"), col("col") * k + 1, lit(k)), " "))
          .as("block"))
    val firstW = Window.partitionBy("block")
    val marked = blocks.withColumn("keep",
      col("b").isNull ||
        struct(col(idCol), col("b")) ===
          min(struct(col(idCol), col("b"))).over(firstW))
    val kept = marked.filter(col("b").isNotNull)
      .groupBy(idCol)
      .agg(
        array_join(transform(array_sort(collect_list(
            when(col("keep"), struct(col("b"), col("block"))))),
          _.getField("block")), " ").as("kept_blocks"),
        sum(when(!col("keep"), 1L).otherwise(0L)).as("n_dropped"))
    base.select(col(idCol), col("n_blocks"),
        array_join(slice(col("toks"), col("n_blocks") * k + 1,
          size(col("toks")) - col("n_blocks") * k), " ").as("remainder"))
      .join(kept, Seq(idCol), "left")
      .select(col(idCol),
        trim(concat_ws(" ", coalesce(col("kept_blocks"), lit("")),
          col("remainder"))).as("text"),
        col("n_blocks").cast(LongType).as("n_blocks"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"))
      .orderBy(idCol)
  }

  /** Boundary-robust duplicated-span removal — the sliding-window
    * sibling of [[spanScrub]] and the rewriting counterpart of the
    * [[dupSpans]] audit (Lee et al. 2022 exact-substring-dedup
    * semantics at k-token-window granularity). [[spanScrub]]'s
    * tumbling blocks miss any repeat not aligned to a block boundary
    * — the common case for scraped boilerplate behind a one-word
    * prefix (SlidingScrubSpec proves the blind spot). Here every
    * STRIDE-1 window of `k` tokens is hashed corpus-wide; each
    * window's FIRST occurrence (min (doc, pos), the [[spanScrub]]
    * rule) keeps its tokens, and every token covered by any
    * non-first duplicated window is removed. Alignment cannot hide a
    * repeat: a span of length ≥ k duplicated at ANY offset shares
    * all its k-windows with the first copy.
    *
    * Scale shape: the explode is k rows per corpus token, but each
    * is immediately reduced to (doc, pos, xxhash64(window)) — 20
    * bytes — before the ONE shuffle (window-hash partitioning for
    * the first-occurrence window function; the [[dupSpans]]
    * discipline). Coverage expansion re-explodes only DUPLICATED
    * window instances (bounded by the dup mass, not the corpus), and
    * reassembly is one per-doc aggregate. Skewed boilerplate hashes
    * mitigate exactly as [[dupSpans]] documents.
    *
    * Determinism: first-occurrence selection is a min over (doc,
    * pos) structs, coverage is integer positions, reassembly an
    * order-sorted join — hash-exact; the DuckDB oracle replays
    * window STRINGS, identical modulo xxhash64 collisions (~n²/2⁶⁵).
    * Output: (id, text, n_tokens, n_removed), ordered by id. */
  def slidingScrub(docs: DataFrame, k: Int = 8,
                   textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
    require(k > 0, "need k > 0")
    import org.apache.spark.sql.expressions.Window
    val base = docs.select(col(idCol), tokens(col(textCol)).as("toks"))
    val wins = stride1WindowHashes(base, k, idCol)
    val dups = wins
      .withColumn("first",
        min(struct(col(idCol).as("d"), col("p").as("q")))
          .over(Window.partitionBy("wh")))
      .filter(!(col("first.d") === col(idCol) && col("first.q") === col("p")))
    val covered = dups
      .select(col(idCol), explode(sequence(col("p"), col("p") + (k - 1)))
        .as("pos"))
      .distinct()
    val toksPos = base.select(col(idCol), posexplode(col("toks")))
    val agg = toksPos
      .join(covered.withColumn("__cov", lit(1)), Seq(idCol, "pos"), "left")
      .groupBy(idCol)
      .agg(
        array_join(transform(array_sort(collect_list(
            when(col("__cov").isNull, struct(col("pos"), col("col"))))),
          _.getField("col")), " ").as("text"),
        count(lit(1)).as("n_tokens"),
        sum(when(col("__cov").isNotNull, 1L).otherwise(0L)).as("n_removed"))
    docs.select(col(idCol))
      .join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("text"), lit("")).as("text"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"))
      .orderBy(idCol)
  }

  /** Tokenizer COVERAGE report — the acceptance check a tokenizer
    * ships with: apply a [[bpeSegment]] table trained on `train` to
    * the full corpus and report, per source, the word count, the
    * out-of-vocabulary count/rate (word occurrences the table has
    * never seen — char-fallback territory, `n_pieces` = word length
    * there, the byte-fallback convention), and the FERTILITY
    * (mean pieces per word — the metric that predicts sequence-length
    * inflation and thus training cost per document). A fertility or
    * OOV spike in one source is the canary for a domain the
    * tokenizer was not trained on.
    *
    * Scale shape: the segmentation table is vocabulary-sized and
    * broadcasts; the corpus contributes one exploded (source, word)
    * pass into a per-source partial-aggregated rollup — no
    * corpus-sized shuffle. */
  def tokenizerReport(docs: DataFrame, train: DataFrame,
                      numMerges: Int = 10,
                      textCol: String = "text",
                      srcCol: String = "source"): DataFrame = {
    val table = bpeSegment(train, numMerges, textCol)
      .select(col("word"), col("n_pieces"))
    docs.select(col(srcCol), explode(tokens(col(textCol))).as("word"))
      .join(broadcast(table), Seq("word"), "left")
      .groupBy(col(srcCol))
      .agg(count(lit(1)).as("n_words"),
        sum(when(col("n_pieces").isNull, 1L).otherwise(0L)).as("n_oov"),
        sum(coalesce(col("n_pieces"),
          length(col("word")).cast(LongType))).as("__pieces"))
      .select(col(srcCol), col("n_words"), col("n_oov"),
        (col("n_oov").cast(DoubleType) / col("n_words")).as("oov_rate"),
        (col("__pieces").cast(DoubleType) / col("n_words"))
          .as("fertility"))
      .orderBy(srcCol)
  }

  /** TOKEN-BUDGET corpus selection — "fill a 100 B-token training
    * budget with the best documents": greedy selection by quality
    * (the [[qualityClassifier]] probability, replayed expression-
    * for-expression), taking documents in (score desc, id asc) order
    * while the running token total stays within `tokenBudget` — the
    * canonical quality-density knapsack every pretraining data team
    * runs last.
    *
    * Scale shape: the naive global cumsum is a single-partition
    * window over the whole corpus — illegal at 100 TB. Instead the
    * score axis is split into `buckets` fixed ranges
    * (floor(score·B)): per-bucket token totals (≤ B rows) produce
    * exact cross-bucket offsets via one bounded window, and the
    * within-bucket cumsum runs partitioned by bucket — the global
    * prefix sum reconstructed exactly, because (bucket desc, score
    * desc, id) IS the global greedy order. Only (id, score, n_tokens)
    * rows shuffle; bodies stay put.
    *
    * Determinism: integer token counts, IEEE-exact score (q89
    * discipline), n_tokens ≥ 1 makes cum_tokens strictly increasing,
    * so the output order is total. Output: (id, score, n_tokens,
    * cum_tokens) in selection order. */
  def budgetSelect(docs: DataFrame, tokenBudget: Long,
                   buckets: Int = 1024, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
    require(tokenBudget > 0, "need tokenBudget > 0")
    require(buckets > 0, "need buckets > 0")
    import org.apache.spark.sql.expressions.Window
    // the q89 score tree via the shared helper — identical roundings
    val (_, prob) = clfScoreProb(textCol)
    val scored = docs.select(col(idCol), prob.as("score"),
      size(tokens(col(textCol))).cast(LongType).as("n_tokens"))
    // prob ∈ (0,1) strictly (rational sigmoid), so the clamp is
    // belt-and-braces for an exact 1.0
    val withB = scored.withColumn("bkt",
      least(floor(col("score") * lit(buckets.toDouble)).cast(LongType),
        lit(buckets - 1L)))
    val btot = withB.groupBy("bkt").agg(sum("n_tokens").as("__btoks"))
    // ≤ `buckets` rows: the unpartitioned window is bounded by
    // construction, never corpus-sized
    val off = btot.withColumn("__offset",
      coalesce(sum("__btoks").over(Window.orderBy(col("bkt").desc)
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bkt"), col("__offset"))
    val wb = Window.partitionBy("bkt")
      .orderBy(col("score").desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withB.join(broadcast(off), Seq("bkt"))
      .withColumn("cum_tokens", col("__offset") + sum("n_tokens").over(wb))
      .filter(col("cum_tokens") <= tokenBudget)
      .select(col(idCol), col("score"), col("n_tokens"),
        col("cum_tokens"))
      .orderBy("cum_tokens")
  }

  /** CURRICULUM ordering: partition the corpus into `stages` equal
    * quality tiers (stage 0 = highest q89 classifier probability =
    * "easiest"), then give each stage a deterministic content-random
    * training order (the [[Split.epochOrder]] md5 discipline, keyed
    * by epoch AND stage so every epoch re-shuffles within tiers while
    * the tier schedule stays fixed) — the anneal-from-clean-data
    * ordering a curriculum trainer consumes.
    *
    * Global quality rank WITHOUT a corpus-sized window: the
    * [[budgetSelect]] two-level prefix discipline — 1024 score-range
    * buckets, per-bucket doc counts, cross-bucket offsets over a
    * ≤1024-row window, within-bucket row_number. Stage is then pure
    * integer arithmetic floor((rank−1)·stages/N) with N attached as
    * a broadcast 1-row stats frame, and the within-stage order is a
    * narrow md5 projection — ordering by (stage, order_key) needs no
    * materialized sequence number. */
  def curriculumOrder(docs: DataFrame, stages: Int = 4, epoch: Int = 0,
                      buckets: Int = 1024, salt: String = "graft",
                      textCol: String = "text",
                      idCol: String = "doc_id"): DataFrame = {
    require(stages > 0, "need stages > 0")
    import org.apache.spark.sql.expressions.Window
    // the q89 score tree via the shared helper — identical roundings
    val (_, prob) = clfScoreProb(textCol)
    val scored = docs.select(col(idCol), prob.as("score"))
    val withB = scored.withColumn("bkt",
      least(floor(col("score") * lit(buckets.toDouble)).cast(LongType),
        lit(buckets - 1L)))
    val btot = withB.groupBy("bkt").agg(count(lit(1)).as("__bdocs"))
    val off = btot.withColumn("__offset",
      coalesce(sum("__bdocs").over(Window.orderBy(col("bkt").desc)
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bkt"), col("__offset"))
    val total = btot.agg(sum("__bdocs").as("__n"))
    val wb = Window.partitionBy("bkt")
      .orderBy(col("score").desc, col(idCol))
    withB.join(broadcast(off), Seq("bkt"))
      .withColumn("rank", col("__offset") + row_number().over(wb))
      .crossJoin(broadcast(total))
      // integer `div`, not `/`: Spark's `/` is double division, and
      // a borderline (rank−1)·stages/N could round up across a tier
      .withColumn("stage", expr(s"(rank - 1) * $stages div __n"))
      .withColumn("order_key",
        md5(concat_ws(":", lit(s"curriculum:$epoch:$salt"),
          col("stage").cast("string"), col(idCol).cast("string"))))
      .select(col(idCol), col("score"), col("rank"), col("stage"),
        col("order_key"))
      .orderBy("stage", "order_key", idCol)
  }

  /** C4/RefinedWeb-style LINE-level boilerplate removal: a line
    * whose exact text appears in at least `minDf` DISTINCT documents
    * is boilerplate (nav bars, cookie banners, footers — the scraped
    * furniture that survives doc-level dedup because every page's
    * BODY differs) and is removed from EVERY document; the remaining
    * lines reassemble in order. Complements [[slidingScrub]]:
    * that is keep-first exact-substring dedup at token-window
    * granularity, this is remove-everywhere at line granularity —
    * ubiquity across documents means the line carries no training
    * signal in ANY of them. A line repeated only WITHIN one doc has
    * df = 1 and survives ([[repetitionStats]] is the within-doc
    * signal).
    *
    * Scale shape: document bodies never cross an exchange. Lines
    * reduce to (xxhash64(line), doc, pos) — 20 bytes — before the
    * ONE shuffle (the df count); the boilerplate hash set (only
    * df ≥ minDf lines) joins back to those narrow rows, and removal
    * is an index-filter EXPRESSION over each doc's own line array
    * after a per-doc (id, positions) join — the dup mass, not the
    * corpus, is what re-shuffles. The DuckDB oracle replays line
    * STRINGS; identical modulo xxhash64 collisions (~n²/2⁶⁵).
    * Output: (id, text, n_lines, n_removed), ordered by id. */
  def lineDedup(docs: DataFrame, minDf: Long = 2,
                sep: String = "\n",
                textCol: String = "text",
                idCol: String = "doc_id"): DataFrame = {
    require(minDf >= 2, s"minDf $minDf would remove every line")
    val base = docs.select(col(idCol),
      split(col(textCol), java.util.regex.Pattern.quote(sep)).as("lines"))
    val lines = base
      .select(col(idCol), posexplode(col("lines")).as(Seq("pos", "ln")))
      .select(col(idCol), col("pos"), xxhash64(col("ln")).as("lh"))
    val boiler = lines.groupBy(col("lh"))
      .agg(count_distinct(col(idCol)).as("df"))
      .filter(col("df") >= minDf).select("lh")
    val drops = lines.join(boiler, "lh")
      .groupBy(col(idCol)).agg(collect_list(col("pos")).as("ps"))
    base.join(drops, Seq(idCol), "left")
      .select(col(idCol),
        array_join(filter(col("lines"),
          (x: Column, i: Column) =>
            coalesce(!array_contains(col("ps"), i), lit(true))), sep)
          .as("text"),
        size(col("lines")).cast(LongType).as("n_lines"),
        coalesce(size(col("ps")), lit(0)).cast(LongType).as("n_removed"))
      .orderBy(idCol)
  }

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003 — the
    * MOSS algorithm): hash every k-token gram, then keep the MINIMUM
    * hash in each w-wide window of consecutive k-gram hashes. The
    * winnowing guarantee: any shared token run of length ≥ w + k − 1
    * yields at least one shared fingerprint at ANY alignment, while
    * only ~2/(w+1) of k-grams are selected — a density-guaranteed
    * sketch where MinHash banding misses are probabilistic and
    * stride-k blocks are alignment-blind. Hashes are md5 hex STRINGS
    * under lexicographic order (a uniform total order both engines
    * replay verbatim — no integer parsing); the window min keeps the
    * smallest value (equal md5 inside a window ⇒ equal k-grams, so
    * ties affect only positions, which we do not emit). Docs shorter
    * than w + k − 1 tokens emit no fingerprints.
    *
    * Scale shape: the k-gram hash array is ONE array projection per
    * doc; the posexplode is a Generate BARRIER, so that projection
    * evaluates exactly once per doc (the ProfileQ76 CollapseProject
    * lesson, fourth instance: a nested
    * `transform(…, j => slice(kg, j+1, w))` inlines the whole kg
    * expression into the lambda — every window re-hashes the whole
    * document, O(n²) interpreted md5 per doc, MINUTES at sf0.1 —
    * while this shape is O(n)). The window min runs over the
    * doc-partitioned (pos, hash) rows — same one-narrow-shuffle
    * shape as [[slidingScrub]] — and the per-doc fingerprint-set
    * dedup is a collect_set on the SAME partitioning, so no second
    * exchange. Output: (id, fp), one row per distinct fingerprint
    * per doc. */
  def winnowFingerprints(docs: DataFrame, k: Int = 5, w: Int = 4,
                         textCol: String = "text",
                         idCol: String = "doc_id"): DataFrame = {
    require(k > 0 && w > 0, "need k > 0 and w > 0")
    import org.apache.spark.sql.expressions.Window
    // native multiset shingles + a self-contained md5 lambda (no
    // outer refs, so nothing re-evaluates per element) — the
    // composable slice-per-index form re-tokenized per window; it is
    // also TOTAL on short docs, so no InferFiltersFromGenerate clamp
    // is needed here (unlike stride1WindowHashes' sequence form)
    val kg = docs.select(col(idCol), tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= k + w - 1)
      .select(col(idCol),
        transform(graft.functions.TextExpressions.shingles_multiset(
            col("toks"), k),
          g => md5(g)).as("kg"))
    val ex = kg.select(col(idCol), (size(col("kg")) - w).as("maxp"),
      posexplode(col("kg")).as(Seq("pos", "h")))
    val win = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, w - 1)
    ex.select(col(idCol), col("pos"), col("maxp"),
        min(col("h")).over(win).as("fp"))
      .filter(col("pos") <= col("maxp"))
      .groupBy(col(idCol)).agg(collect_set(col("fp")).as("fps"))
      .select(col(idCol), explode(col("fps")).as("fp"))
  }

  /** Near-dup candidate pairs from shared winnowing fingerprints —
    * docs sharing ≥ `minShared` fingerprints, with the shared count
    * as the match strength. Fingerprints held by more than `dfCap`
    * docs are dropped FIRST (a fingerprint in half the corpus is
    * boilerplate, not evidence — MOSS's common-code exclusion), and
    * df = 1 fingerprints are dropped too (no pair can come from
    * them), so the self-join runs over the rare informative
    * fingerprints only — the bucket-cap discipline of
    * [[Dedup.minHashCandidates]] with an explicit knob. Output:
    * (id_a < id_b, n_shared), ordered. */
  def winnowCandidates(docs: DataFrame, k: Int = 5, w: Int = 4,
                       minShared: Long = 2, dfCap: Long = 50,
                       textCol: String = "text",
                       idCol: String = "doc_id"): DataFrame = {
    require(minShared >= 1 && dfCap >= 2, "need minShared >= 1, dfCap >= 2")
    // no checkpoint: the self-join sides and the df aggregate all
    // land on the same fps shuffle, which ReusedExchange serves once
    // (measured: a localCheckpoint here is net slower warmed)
    val fps = winnowFingerprints(docs, k, w, textCol, idCol)
    val rare = fps.groupBy(col("fp"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= dfCap)
      .select("fp")
    val keyed = fps.join(rare, "fp")
    keyed.select(col("fp"), col(idCol).as("id_a"))
      .join(keyed.select(col("fp"), col(idCol).as("id_b")), "fp")
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .orderBy("id_a", "id_b")
  }

  /** Padding-waste report for length-bucketed batching: assign each
    * doc's token count to the smallest power-of-two bucket that holds
    * it and report, per bucket, the document count, real token mass,
    * padded token mass (n_docs × bucket cap), the waste fraction the
    * padding burns, and the token mass truncation drops from docs
    * past the top cap.
    *
    * [[packSequences]] answers "concatenate into fixed blocks";
    * this answers the OTHER standard batching scheme — pad within a
    * bucket — and tells you what the bucket layout costs before you
    * train with it (padding waste is pure wasted FLOPs).
    *
    * The bucket assignment is a driver-unrolled CASE chain over the
    * caps (no log2 at query time — transcendental-free, the house
    * rule), so the whole report is one narrow scan + a ≤ |caps|-row
    * aggregate; nothing but (bucket, len) pairs reach the exchange,
    * map-side combined.
    */
  def lengthBuckets(docs: DataFrame, caps: Seq[Int] = Seq(16, 32, 64, 128),
                    textCol: String = "text"): DataFrame = {
    require(caps.nonEmpty && caps == caps.sorted && caps.distinct == caps,
      "caps must be sorted distinct")
    val len = size(tokens(col(textCol)))
    val maxCap = caps.last
    val bucket = caps.init.foldRight(lit(maxCap): Column) {
      case (cap, rest) => when(len <= cap, cap).otherwise(rest)
    }
    docs.select(bucket.cast("int").as("bucket"), len.as("len"))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(least(col("len"), col("bucket")).cast("long")).as("real_tokens"),
        sum(greatest(col("len") - lit(maxCap), lit(0)).cast("long"))
          .as("tokens_truncated"))
      .withColumn("padded_tokens", col("n_docs") * col("bucket"))
      .withColumn("waste",
        lit(1.0) - col("real_tokens").cast("double")
          / col("padded_tokens").cast("double"))
      .select("bucket", "n_docs", "real_tokens", "padded_tokens",
        "tokens_truncated", "waste")
      .orderBy("bucket")
  }

  /** BM25-mined HARD NEGATIVES for retrieval training (the DPR
    * recipe): for each query document, the top-`k` BM25-scored corpus
    * documents that are NOT the query itself or an exact copy of it —
    * lexically close enough to be informative negatives, unlabeled
    * as positives. Query terms are each query doc's `m` RAREST
    * distinct tokens (global df asc, token asc) — rare terms are the
    * distinctive ones, and their short postings lists are what keeps
    * the candidate volume bounded at scale.
    *
    * Shape at 100 TB: ONE tokenize pass feeds both the postings
    * (term, doc, tf, dln) shuffle and the one-row corpus stats;
    * query-term selection touches only the Q query docs joined
    * against the per-term df table; scoring joins the tiny
    * broadcast (qid, term, df) frame INTO the postings — candidates
    * are bounded by Σ df(chosen rare terms), never Q × corpus — and
    * the final top-k is one window partitioned by qid. No corpus
    * cross product anywhere; compare [[bm25Search]], which scans the
    * corpus once PER query.
    *
    * Determinism (the q90/q95 discipline, extended to data-dependent
    * term sets): per-term scores use the rational idf and identical
    * literals, and the per-(query, doc) sum folds the term scores in
    * SORTED term order via `aggregate(sort_array(collect_list(...)))`
    * — a canonical left-to-right IEEE fold the DuckDB oracle replays
    * with `list_reduce(list(s ORDER BY term))`. Ties in the final
    * ranking break on doc id. Output:
    * (qid, rank, neg_id, bm25), ordered. */
  def bm25Negatives(docs: DataFrame, queries: DataFrame,
                    m: Int = 5, k: Int = 5,
                    textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(m > 0 && k > 0, "m and k must be positive")
    val toksC = tokens(col(textCol))
    val base = docs.select(col(idCol).as("id"), toksC.as("toks"),
      size(toksC).cast(LongType).as("dln"))
    // materialized once: BOTH the per-term df aggregate and the
    // scoring join below consume the postings — un-checkpointed, the
    // tokenize + explode + (id, term) groupBy runs twice (guide §2.4).
    // (id, dln, term, tf) rows only — no token arrays cross.
    val postings = base
      .select(col("id"), col("dln"), explode(col("toks")).as("term"))
      .groupBy("id", "dln", "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val stats = base.agg(count(lit(1)).cast(DoubleType).as("n_docs"),
      sum(col("dln")).as("sum_dl"))
    // postings are unique per (id, term), so a per-term row count IS
    // the document frequency
    val dfs = postings.groupBy("term").agg(count(lit(1)).as("df"))
    val qterms = queries
      .select(col(idCol).as("qid"),
        explode(array_distinct(tokens(col(textCol)))).as("term"))
      .join(dfs, "term")
      .withColumn("rn", row_number().over(
        Window.partitionBy("qid").orderBy(col("df").asc, col("term").asc)))
      .filter(col("rn") <= m)
      .select("qid", "term", "df")
    val dl = col("dln").cast(DoubleType)
    val avgdl = col("sum_dl").cast(DoubleType) / col("n_docs")
    val tfD = col("tf").cast(DoubleType)
    val dfD = col("df").cast(DoubleType)
    val termScore = (col("n_docs") - dfD + lit(0.5)) / (dfD + lit(0.5)) *
      (tfD * lit(2.2)) /
      (tfD + lit(1.2) * (lit(0.25) + lit(0.75) * dl / avgdl))
    val scored = postings.join(broadcast(qterms), "term")
      .crossJoin(broadcast(stats))
      .select(col("qid"), col("id"), col("term"), termScore.as("s"))
      .groupBy("qid", "id")
      .agg(aggregate(
        sort_array(collect_list(struct(col("term"), col("s")))),
        lit(0.0), (acc, x) => acc + x.getField("s")).as("bm25"))
    val qh = queries.select(col(idCol).as("qid"), md5(col(textCol)).as("qh"))
    val dh = docs.select(col(idCol).as("id"), md5(col(textCol)).as("dh"))
    scored
      .join(broadcast(qh), "qid")
      .join(dh, "id")
      .filter(col("id") =!= col("qid") && col("dh") =!= col("qh"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("bm25").desc, col("id").asc)))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank").cast("int").as("rank"),
        col("id").as("neg_id"), col("bm25"))
      .orderBy("qid", "rank")
  }
}
