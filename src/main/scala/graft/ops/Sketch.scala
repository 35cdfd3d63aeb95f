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

  /** Heavy-hitter audit: the exact top-`k` tokens with their CMS
    * estimates and measured inflation. Output: (rank, tok, exact,
    * cms_estimate, inflation) — estimate ≥ exact always (CMS
    * one-sided error), inflation = estimate/exact. */
  def cmsHeavyHitters(docs: DataFrame, k: Int,
                      depth: Int = 4, width: Int = 256,
                      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(
      explode(TextOps.tokens(col(textCol))).as("tok"))
      .filter(col("tok") =!= "")
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
}
