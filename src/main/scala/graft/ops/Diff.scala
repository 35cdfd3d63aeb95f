package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff / change-data-capture between two versions of a
  * table — the batch operator behind incremental loads: feed the
  * `added`/`changed` rows forward, retire the `removed` keys. The
  * reference re-writes whole tables every run (append-mode JDBC,
  * `helper_func.py:36-45`); at 100 TB only the delta is affordable.
  */
object Diff {

  /** Classify every key across two snapshots:
    * `added` (new only), `removed` (old only), `changed` (present in
    * both, any payload column differs), `unchanged`.
    *
    * One full-outer shuffle join on the key; payloads travel as ONE
    * struct per side, compared null-safely (`<=>`), so the number of
    * payload columns doesn't change the comparison plan. Output =
    * key columns + change_type + the old/new payload structs.
    *
    * Both snapshots must be unique per key (run
    * [[Upsert.latestByKey]] first on changelogs). */
  def snapshotDiff(old: DataFrame, latest: DataFrame,
                   keys: Seq[String]): DataFrame = {
    val payloadCols = old.columns.filterNot(keys.contains).toSeq
    def shape(df: DataFrame) =
      df.schema.fields.filterNot(f => keys.contains(f.name))
        .map(f => (f.name, f.dataType)).toSeq
    require(shape(old) == shape(latest),
      s"snapshots must share the same schema (names AND types); " +
        s"got ${shape(old)} vs ${shape(latest)}")
    val reserved = Seq("old", "new", "change_type", "__in_old", "__in_new")
    require(old.columns.intersect(reserved).isEmpty,
      s"columns may not use reserved names ${reserved.mkString(", ")}")

    def pack(df: DataFrame, side: String, flag: String) =
      df.select(keys.map(col) :+
        struct(payloadCols.map(col): _*).as(side) :+
        lit(true).as(flag): _*)

    pack(old, "old", "__in_old")
      .join(pack(latest, "new", "__in_new"), keys, "full_outer")
      .withColumn("change_type",
        when(col("__in_old").isNull, "added")
          .when(col("__in_new").isNull, "removed")
          .when(!(col("old") <=> col("new")), "changed")
          .otherwise("unchanged"))
      .drop("__in_old", "__in_new")
  }

  /** The forwardable delta: everything except `unchanged`. */
  def changes(old: DataFrame, latest: DataFrame,
              keys: Seq[String]): DataFrame =
    snapshotDiff(old, latest, keys)
      .filter(col("change_type") =!= "unchanged")

  /** Term-distribution drift between two corpus versions — the audit
    * that catches a silent language shift after a re-crawl, a filter
    * change, or a lost feed ("did dropping that source change what
    * the model will read?"). Per term, the total-variation
    * contribution |p_old − p_new| / 2 is computed in EXACT integer
    * arithmetic: the numerator |c_old·N_new − c_new·N_old| is a
    * decimal(38,0) product of exact counts (Spark) ≡ HUGEINT
    * (DuckDB), so the drift RANKING never depends on a floating
    * division; the two IEEE divisions happen once at the output
    * boundary (tv_contrib, and the corpus-level tv_total every row
    * carries). Output: the topK drifting terms as (term, c_old,
    * c_new, direction, drift_rank, tv_contrib, tv_total).
    *
    * Scale shape: two map-side-combined term-count aggregates, one
    * term-keyed full-outer join (Zipf skew lands on boilerplate
    * terms — AQE skew territory, and counts are already combined),
    * 1-row totals broadcast back, one top-K rank. Bodies never
    * cross an exchange. */
  def termDrift(old: DataFrame, latest: DataFrame, topK: Int = 50,
                textCol: String = "text"): DataFrame = {
    require(topK > 0, "topK must be positive")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    def counts(df: DataFrame, as: String) = df
      .select(explode(TextOps.tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as(as))
    def dec(c: Column) = c.cast(DecimalType(38, 0))
    // localCheckpoint: the joined counts feed THREE sinks (totals,
    // the TV-total aggregate, and the ranked output) — uncached,
    // Spark would tokenize and aggregate both corpora three times.
    // The checkpointed frame is vocabulary-bounded, not corpus-sized.
    val joined = counts(old, "c_old")
      .join(counts(latest, "c_new"), Seq("term"), "full_outer")
      .select(col("term"),
        coalesce(col("c_old"), lit(0L)).as("c_old"),
        coalesce(col("c_new"), lit(0L)).as("c_new"))
      .localCheckpoint()
    val totals = joined.agg(
      sum(dec(col("c_old"))).as("n_old"), sum(dec(col("c_new"))).as("n_new"))
    val x = joined.crossJoin(broadcast(totals))
      .withColumn("__up", dec(col("c_old")) * col("n_new"))
      .withColumn("__vp", dec(col("c_new")) * col("n_old"))
      .withColumn("__l1", abs(col("__up") - col("__vp")))
    val tot = x.agg(sum(col("__l1")).as("__t"))
    val denom = lit(2.0) * col("n_old").cast("double") *
      col("n_new").cast("double")
    x.crossJoin(broadcast(tot))
      // global rank window: VOCABULARY-bounded rows (the same bound
      // every vocab/tokenizer op here accepts), not corpus-bounded
      .withColumn("drift_rank", row_number().over(
        Window.orderBy(col("__l1").desc, col("term"))))
      .filter(col("drift_rank") <= topK)
      .select(col("term"), col("c_old"), col("c_new"),
        when(col("__vp") > col("__up"), "up")
          .when(col("__vp") < col("__up"), "down")
          .otherwise("flat").as("direction"),
        col("drift_rank").cast("long").as("drift_rank"),
        (col("__l1").cast("double") / denom).as("tv_contrib"),
        (col("__t").cast("double") / denom).as("tv_total"))
      .orderBy("drift_rank")
  }
}
