package graft.ops

import org.apache.spark.sql.DataFrame
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
}
