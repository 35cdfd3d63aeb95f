package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch over token frequencies, with a measured-error
  * audit against the exact counts.
  *
  * The CMS is THE streaming/mergeable answer to "how often does X
  * occur?" at 100 TB: d×w counters (here 4×256 = 1 KiB) replace a
  * vocabulary-sized exact table, per-shard sketches merge by cell
  * addition, and the estimate min_j cms[j][h_j(x)] never
  * underestimates. What teams get wrong is trusting the bound
  * blindly — the audit here reports the ACTUAL inflation for the
  * heaviest tokens, the ones whose estimates matter (mixture
  * weights, stopword lists, tokenizer seeds).
  *
  * Determinism (the q127 discipline): row-j's hash is the first 2
  * md5 hex digits of "j:token" — `conv(hex, 16, 10)`, an integer in
  * [0, 256) both engines derive identically — so the whole sketch,
  * not just the exact side, replays in ANSI SQL.
  *
  * Shape at scale: building the sketch shuffles (row, bucket) pairs
  * only — d rows per token occurrence, 16 B each, collapsed by
  * map-side partial aggregation into ≤ d·w cells per partition
  * before the exchange. The probe side joins the top-k candidates
  * (tiny) against the d·w-cell table (broadcast). Nothing
  * vocabulary- or corpus-sized crosses an exchange unaggregated.
  *
  * Reference scope note: the reference engine has no sketch
  * operators (its one approximate surface is absent entirely); this
  * family extends the training-data surface (SURVEY.md north star)
  * with the mergeable summaries a 100 TB pipeline monitors itself
  * with — frequency (CMS), distinct (HLL q151 / KMV q152), quantiles
  * (histogram q153) — each audited against its exact answer.
  */
object Sketch {

  /** h_j(token) ∈ [0, width): first-2-hex-digit md5 of "j:token".
    * width must divide 256 so the modulo keeps hex uniformity. */
  private def bucketOf(j: Int, tok: Column, width: Int): Column =
    conv(substring(md5(concat(lit(s"$j:"), tok)), 1, 2), 16, 10)
      .cast("long") % width

  /** The d×width counter table: (row, bucket, cnt) — one map-side-
    * combined aggregate over d rows per token occurrence. */
  def cmsBuild(toks: DataFrame, depth: Int, width: Int,
               tokCol: String = "tok"): DataFrame = {
    require(depth > 0 && width > 0 && 256 % width == 0,
      "depth > 0 and width must divide 256")
    toks.select(explode(array((0 until depth).map(j =>
        struct(lit(j).as("row"),
          bucketOf(j, col(tokCol), width).as("bucket"))): _*)).as("rb"))
      .groupBy(col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Cell-wise merge of [[cmsBuild]] sketches — CMS shards add:
    * count(S₁ ∪ S₂) cells are the sums, so per-shard sketches built
    * independently (per ingest batch, per day, per source) compact
    * into the corpus sketch without touching the corpora. */
  def cmsMerge(sketches: Seq[DataFrame]): DataFrame = {
    require(sketches.nonEmpty, "need at least one sketch")
    sketches.reduce(_ unionByName _)
      .groupBy("row", "bucket").agg(sum("cnt").as("cnt"))
  }

  /** Heavy-hitter audit: the exact top-`k` tokens with their CMS
    * estimates and measured inflation. Output: (rank, tok, exact,
    * cms_estimate, inflation) — estimate ≥ exact always (CMS
    * one-sided error), inflation = estimate/exact. */
  def cmsHeavyHitters(docs: DataFrame, k: Int,
                      depth: Int = 4, width: Int = 256,
                      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // materialized once: the CMS build AND the exact top-k count both
    // consume the token stream — un-checkpointed, the tokenize +
    // explode pass runs twice (guide §2.4). Single-column token rows.
    val toks = docs.select(
      explode(TextOps.tokens(col(textCol))).as("tok"))
      .filter(col("tok") =!= "")
      .localCheckpoint(true)
    val cms = cmsBuild(toks, depth, width)

    val top = toks.groupBy("tok").agg(count(lit(1)).as("exact"))
      .orderBy(col("exact").desc, col("tok")).limit(k)

    // probe: k×d candidate cells joined against the ≤ d·w cell table
    val probes = top.select(col("tok"), col("exact"),
        explode(array((0 until depth).map(j =>
          struct(lit(j).as("row"),
            bucketOf(j, col("tok"), width).as("bucket"))): _*)).as("rb"))
      .select(col("tok"), col("exact"),
        col("rb.row").as("row"), col("rb.bucket").as("bucket"))
    val est = probes.join(broadcast(cms), Seq("row", "bucket"))
      .groupBy("tok", "exact")
      .agg(min(col("cnt")).as("cms_estimate"))

    est.withColumn("rank",
        row_number().over(Window.orderBy(col("exact").desc, col("tok"))))
      .withColumn("inflation",
        col("cms_estimate").cast("double") / col("exact").cast("double"))
      .select("rank", "tok", "exact", "cms_estimate", "inflation")
      .orderBy("rank")
  }

  /** Registers for HLL: m = 2^8 = 256 (standard error
    * 1.04/√m ≈ 6.5%). Register index = first 2 md5 hex digits;
    * rho = leading-zero count of the NEXT 8 hex digits (a 32-bit
    * draw) + 1. */
  val HllRegisters = 256

  /** α₂₅₆ · m² precomputed once; the oracle embeds the same
    * shortest-roundtrip literal so both engines hold the identical
    * double. */
  val HllAlphaM2: Double =
    0.7213 / (1.0 + 1.079 / HllRegisters) * HllRegisters * HllRegisters

  /** Small-range (linear counting) table: entry V = m·ln(m/V), the
    * ballot-problem estimate from V empty registers, for V = 1..m
    * (entry 0 unused). ln is libm-divergent between engines, but V
    * is an integer ≤ m — so the whole correction is a 257-entry
    * lookup of DRIVER-computed doubles, embedded as literals on both
    * sides: engine-exact without a transcendental at query time. */
  val LinearCountTable: IndexedSeq[Double] =
    (0 to HllRegisters).map(v =>
      if (v == 0) 0.0
      else HllRegisters * math.log(HllRegisters.toDouble / v))

  /** rho(hex8) = leading zero BITS of the 32-bit value the 8 hex
    * digits spell, + 1 (= 33 when all zero) — derived from string
    * arithmetic only (strip leading '0' nibbles, CASE on the first
    * surviving nibble), no log2/bit-twiddling builtins, so DuckDB
    * replays it verbatim. */
  private[ops] def hllRho(hex8: Column): Column = {
    val stripped = ltrim(hex8, "0")
    val first = substring(stripped, 1, 1)
    val extraZeroBits = when(first === "1", 3)
      .when(first.isin("2", "3"), 2)
      .when(first.isin("4", "5", "6", "7"), 1)
      .otherwise(0)
    when(length(stripped) === 0, lit(33))
      .otherwise((lit(8) - length(stripped)) * 4 + extraZeroBits + 1)
  }

  /** Per-group HLL register table: (group..., register, rho_max).
    * One narrow projection + one map-side-combinable max-aggregate —
    * duplicate values collapse inside the partial agg, so the
    * exchange carries at most |groups|·m rows regardless of input
    * size. THE distinct-count shape for 100 TB: the q57 exact
    * distinct shuffles every distinct (group, value) pair; this
    * shuffles ≤ 256 rows per group, merges across shards by register
    * max ([[hllMerge]]), and never rescans. */
  def hllSketch(df: DataFrame, groupCols: Seq[String],
                valueCol: String): DataFrame = {
    val h = md5(col(valueCol).cast("string"))
    df.select(
        (groupCols.map(col) :+
          conv(substring(h, 1, 2), 16, 10).cast("int").as("register") :+
          hllRho(substring(h, 3, 8)).as("rho")): _*)
      .groupBy("register", groupCols: _*)
      .agg(max(col("rho")).as("rho_max"))
  }

  /** Register-wise max of HLL sketches — HLL's defining property:
    * sketch(S₁ ∪ S₂) = max(sketch(S₁), sketch(S₂)) per register, so
    * shard sketches compact losslessly into the union sketch. */
  def hllMerge(sketches: Seq[DataFrame], groupCols: Seq[String]): DataFrame = {
    require(sketches.nonEmpty, "need at least one sketch")
    sketches.reduce(_ unionByName _)
      .groupBy("register", groupCols: _*)
      .agg(max(col("rho_max")).as("rho_max"))
  }

  /** Estimate from a register table: raw E = α·m² / Σⱼ 2^(−Mⱼ),
    * empty registers contributing 2⁰ = 1 (counted, not
    * materialized); when raw E ≤ 2.5·m and zero registers exist,
    * the small-range linear-counting estimate [[LinearCountTable]]
    * applies instead (Flajolet et al. 2007 — the raw estimator is
    * badly biased up when most registers are empty: measured 191 vs
    * 15 exact before the correction). Every term is an exact binary
    * fraction (1 / (1L << M)) and the sum is exact in double
    * (≤ 2⁸ + 41-bit fractions), so the estimate is order-independent
    * and engine-exact — no pow(), no query-time transcendentals. */
  def hllEstimate(sketch: DataFrame, groupCols: Seq[String]): DataFrame = {
    val vZero = lit(HllRegisters) - col("n_present")
    val raw = lit(HllAlphaM2) /
      (col("s_present") + vZero.cast("double"))
    val lc = element_at(typedLit(LinearCountTable), vZero.cast("int") + 1)
    sketch.groupBy(groupCols.map(col): _*)
      .agg(
        sum(lit(1.0) /
            expr("shiftleft(CAST(1 AS BIGINT), rho_max)").cast("double"))
          .as("s_present"),
        count(lit(1)).as("n_present"))
      .select((groupCols.map(col) :+
        when(raw <= lit(2.5 * HllRegisters) && vZero > 0, lc)
          .otherwise(raw).as("hll_estimate") :+
        vZero.as("n_zero_registers")): _*)
  }

  /** HLL distinct-count AUDIT over a grouped column: per group, the
    * exact distinct count, the HLL estimate from the 256-register
    * sketch, the zero-register count, and the measured relative
    * error. The exact side exists only to measure the sketch — the
    * sketch itself never needs it (drop it at 100 TB; the q57 twin
    * stays the exact gate). */
  def hllDistinct(df: DataFrame, groupCols: Seq[String],
                  valueCol: String): DataFrame = {
    val est = hllEstimate(hllSketch(df, groupCols, valueCol), groupCols)
    val exact = df.groupBy(groupCols.map(col): _*)
      .agg(count_distinct(col(valueCol)).as("exact_distinct"))
    exact.join(est, groupCols)
      .withColumn("rel_error",
        abs(col("hll_estimate") - col("exact_distinct").cast("double"))
          / col("exact_distinct").cast("double"))
      .select((groupCols.map(col) :+ col("exact_distinct") :+
        col("hll_estimate") :+ col("n_zero_registers") :+
        col("rel_error")): _*)
      .orderBy(groupCols.map(col): _*)
  }

  /** KMV (bottom-k / k-minimum-values) distinct sketch audit: per
    * group, keep the k smallest DISTINCT 32-bit value hashes; with
    * R = the k-th smallest, estimate = (k−1)·2³² / R (uniform order
    * statistics), exact when fewer than k distinct hashes exist.
    *
    * The honest trade vs [[hllDistinct]], kept as its measured
    * contrast: KMV needs DISTINCT hashes, so it pays one
    * (group, hash) pre-aggregation — the same exchange shape as
    * exact distinct (that is WHY HLL wins at scale) — but then the
    * min-k aggregate ([[graft.functions.TopKAggregate]], map-side
    * partial, ≤ k per partition per group) carries only k·16 B per
    * group and merges across shards by min-k union. Output:
    * (group..., exact_distinct, n_distinct_hashes, kmv_estimate,
    * rel_error). */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String],
                  valueCol: String, k: Int = 64): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val kmvScale = (k - 1).toDouble * 4294967296.0
    val hashes = df.select(
        (groupCols.map(col) :+
          conv(substring(md5(col(valueCol).cast("string")), 1, 8), 16, 10)
            .cast("long").as("h")): _*)
      .groupBy("h", groupCols: _*).agg(count(lit(1)).as("__n"))
    val mins = hashes.groupBy(groupCols.map(col): _*)
      .agg(
        graft.functions.TopKAggregate
          .topk_by_value((-col("h")).cast("double"), col("h"), k)
          .as("mink"),
        count(lit(1)).as("n_distinct_hashes"))
    val est = mins.select((groupCols.map(col) :+
      col("n_distinct_hashes") :+
      when(col("n_distinct_hashes") < k,
          col("n_distinct_hashes").cast("double"))
        .otherwise(lit(kmvScale) /
          element_at(col("mink"), k).getField("id").cast("double"))
        .as("kmv_estimate")): _*)
    val exact = df.groupBy(groupCols.map(col): _*)
      .agg(count_distinct(col(valueCol)).as("exact_distinct"))
    exact.join(est, groupCols)
      .withColumn("rel_error",
        abs(col("kmv_estimate") - col("exact_distinct").cast("double"))
          / col("exact_distinct").cast("double"))
      .select((groupCols.map(col) :+ col("exact_distinct") :+
        col("n_distinct_hashes") :+ col("kmv_estimate") :+
        col("rel_error")): _*)
      .orderBy(groupCols.map(col): _*)
  }

  /** Fixed-width histogram of a numeric column over [lo, hi]:
    * (bucket, cnt), bucket = clamp(⌊(x−lo)/w⌋, 0, buckets−1),
    * w = (hi−lo)/buckets. The quantile member of the mergeable-
    * sketch family (CMS = frequency, HLL/KMV = distinct): one
    * map-side-combined aggregate whose exchange carries ≤ `buckets`
    * rows per partition regardless of input size, shards merge by
    * bucket addition ([[histMerge]]), and any quantile reads off the
    * cumulative counts with error ≤ one bucket width — the
    * two-pass-free distributed-quantile shape (contrast: exact
    * quantiles sort, percentile_approx's GK sketch is
    * engine-internal). All bucket arithmetic is one IEEE
    * divide+floor both engines replay. */
  def histSketch(df: DataFrame, valueCol: String,
                 lo: Double, hi: Double, buckets: Int): DataFrame = {
    require(buckets > 0 && hi > lo, "need buckets > 0 and hi > lo")
    val w = (hi - lo) / buckets
    val b = least(greatest(
        floor((col(valueCol).cast("double") - lit(lo)) / lit(w)), lit(0)),
      lit(buckets - 1)).cast("int")
    df.select(b.as("bucket")).groupBy("bucket")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Bucket-wise sum of [[histSketch]] tables (same lo/hi/buckets):
    * hist(S₁ ∪ S₂) = hist(S₁) + hist(S₂). */
  def histMerge(sketches: Seq[DataFrame]): DataFrame = {
    require(sketches.nonEmpty, "need at least one sketch")
    sketches.reduce(_ unionByName _)
      .groupBy("bucket").agg(sum("cnt").as("cnt"))
  }

  /** Histogram-quantile AUDIT: for each q, the histogram estimate
    * (within-bucket linear interpolation — pure IEEE arithmetic on
    * integer counts) against the exact rank statistic (value at rank
    * ⌈q·n⌉ — a deterministic PICK, no interpolation, so both engines
    * agree bit-for-bit), plus the absolute error and the one-bucket
    * error bound. Output: (q, hist_estimate, exact_value, abs_error,
    * bound) — abs_error ≤ bound whenever [lo, hi] covers the data
    * (clamped outliers land in edge buckets and void it; size the
    * range from a profiling pass, q148). */
  def histQuantiles(df: DataFrame, valueCol: String,
                    lo: Double, hi: Double, buckets: Int,
                    qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      "quantiles must be in (0, 1]")
    import org.apache.spark.sql.expressions.Window
    val w = (hi - lo) / buckets
    val hist = histSketch(df, valueCol, lo, hi, buckets)
      .withColumn("cum",
        sum(col("cnt")).over(Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("cum_prev", col("cum") - col("cnt"))
    val n = df.agg(count(lit(1)).as("n"))
    val qrows = n.select(col("n"),
        explode(typedLit(qs)).as("q"))
      .withColumn("rank", ceil(col("q") * col("n").cast("double")
        - lit(1e-9)).cast("long"))
    // first bucket whose cumulative count reaches the rank
    val est = qrows.join(broadcast(hist),
        col("cum") >= col("rank") && col("cum_prev") < col("rank"))
      .withColumn("hist_estimate",
        lit(lo) + lit(w) * (col("bucket").cast("double") +
          (col("rank") - col("cum_prev")).cast("double")
            / col("cnt").cast("double")))
    // exact rank statistic: value at position rank in sorted order
    val ranked = df.select(col(valueCol).cast("double").as("v"))
      .withColumn("rn", row_number().over(Window.orderBy("v")))
    est.join(ranked, col("rn") === col("rank"))
      .select(col("q"), col("hist_estimate"), col("v").as("exact_value"),
        abs(col("hist_estimate") - col("v")).as("abs_error"),
        lit(w).as("bound"))
      .orderBy("q")
  }
}
