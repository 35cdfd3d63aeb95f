package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** SCD-1 merge / upsert operators. The reference's sinks are
  * append-only (`mode("append")`, `helper_func.py:36-45`); a real
  * warehouse needs "latest row wins" compaction of a changelog — the
  * batch half of what MERGE INTO does in table formats.
  */
object Upsert {

  /** Collapse a changelog to the latest row per key.
    *
    * Formulated as `max(struct(version ++ payload))` under a groupBy —
    * NOT `row_number() over (partition by key order by version desc)`:
    * the window form must shuffle EVERY changelog row to its key's
    * partition and sort there, while the struct-max aggregate gets
    * map-side partial aggregation — each input partition reduces to
    * ≤ |distinct keys| rows BEFORE the shuffle (physically a partial
    * SortAggregate: struct-max isn't hash-aggregable, so each input
    * partition is sorted locally — but the exchange then carries only
    * the per-partition maxima, not the data). On a 100 TB changelog
    * with a bounded key space that is the difference between
    * shuffling the dataset and shuffling the answer.
    *
    * `versionCols` are compared in order, descending-last-wins; make
    * the last one a unique id so ties are deterministic. `payloadCols`
    * ride inside the same struct, so every output column comes from
    * the SAME winning row. */
  def latestByKey(changelog: DataFrame, keys: Seq[String],
                  versionCols: Seq[String],
                  payloadCols: Seq[String]): DataFrame = {
    require(versionCols.nonEmpty, "versionCols must be non-empty")
    val fields = (versionCols ++ payloadCols).map(c => col(c).as(c))
    changelog
      .groupBy(keys.map(col): _*)
      .agg(max(struct(fields: _*)).as("__latest"))
      .select(keys.map(col) ++
        (versionCols ++ payloadCols).map(c => col(s"__latest.$c").as(c)): _*)
  }

  /** Apply a deduplicated update set onto a base snapshot: rows in
    * `updates` replace base rows with the same key; unmatched base
    * rows pass through. Both inputs must already be unique per key
    * (run [[latestByKey]] on the changelog first). Plain
    * union+left_anti — one shuffle each side on the key, no window. */
  def applyUpdates(base: DataFrame, updates: DataFrame,
                   keys: Seq[String]): DataFrame = {
    // name AND type must match (same shape check as Diff.snapshotDiff):
    // unionByName would silently widen mismatched numeric types,
    // yielding an output schema that differs from base.
    val shape = (df: DataFrame) =>
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq
    require(shape(base) == shape(updates),
      s"base and updates must share the same schema; got " +
        s"${base.schema.simpleString} vs ${updates.schema.simpleString}")
    base.join(updates.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(updates)
  }

  /** SCD Type-2 history build: collapse a changelog into versioned
    * validity intervals — one row per RUN of consecutive identical
    * payload values per key, with `effective_from` / `effective_to`
    * half-open bounds, an `is_current` flag and a 1-based
    * `version_seq`. The dimension-history sibling of [[latestByKey]]
    * (SCD-1 keeps only each run's final state; SCD-2 keeps them all,
    * which is what a point-in-time join — [[AsOfJoin.asof]] against
    * this output — needs to reproduce "the value as of then").
    *
    * Mechanics: rows order per key by (`timeCol`, `tieCols`…); a row
    * OPENS a run iff it is the key's first row or its payload struct
    * differs null-safely from the previous row's. Only run-openers
    * survive the filter; `effective_to` is the NEXT opener's
    * `timeCol` (null on the live run). Consecutive-duplicate collapse
    * means re-asserting an unchanged value never cuts a new version —
    * the standard compress step a naive `GROUP BY key, value` gets
    * wrong when a value RECURS after an interruption (each recurrence
    * is its own run here).
    *
    * Scale: ONE hash exchange on `keys` total. The lag pass, the
    * filter and the lead/row_number pass share the identical
    * (partition, order) spec, so EnsureRequirements satisfies the
    * second Window from the first's output — no second exchange, no
    * re-sort (asserted in `RangeUpsertSpec`). The exchange carries
    * the changelog once; output is |runs| rows. Contract: `timeCol`
    * and `tieCols` must be non-null (null order differs between
    * engines — the [[AsOfJoin]] family's rule) and (`timeCol`,
    * `tieCols`) unique per key so the order is total. */
  def scd2History(changelog: DataFrame, keys: Seq[String],
                  timeCol: String, tieCols: Seq[String],
                  payloadCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty && payloadCols.nonEmpty,
      "keys and payloadCols must be non-empty")
    val ord = (col(timeCol) +: tieCols.map(col)).map(_.asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    val payload = struct(payloadCols.map(c => col(c).as(c)): _*)
    // struct(...) is never NULL itself, so lag==NULL ⟺ first row of
    // the key; <=> then folds "first row" and "payload changed" into
    // one null-safe predicate.
    changelog
      .withColumn("__opens", !(lag(payload, 1).over(w) <=> payload))
      .filter(col("__opens"))
      .select(keys.map(col) ++ payloadCols.map(col) :+
        col(timeCol).as("effective_from") :+
        lead(col(timeCol), 1).over(w).as("effective_to") :+
        lead(col(timeCol), 1).over(w).isNull.as("is_current") :+
        row_number().over(w).cast(LongType).as("version_seq"): _*)
  }
}
