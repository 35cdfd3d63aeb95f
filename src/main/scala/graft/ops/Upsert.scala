package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
}
