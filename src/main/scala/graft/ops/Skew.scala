package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Skew and co-location tools for the 100 TB design point.
  *
  * First line of defense is AQE (`skewJoin` splits oversized
  * sort-merge partitions automatically — enabled in GraftSession).
  * [[saltedJoin]] covers the cases AQE does not reach: broadcast-free
  * joins against a replicable right side where a handful of hot keys
  * dominate, and engines/plans where the skew reducer cannot apply.
  * [[writeBucketed]]/bucketed reads co-locate repeated joins on the
  * same key — the shuffle is paid once at write time, then every
  * downstream join on the bucket key is exchange-free.
  */
object Skew {

  /** Equi-join with hot-key salting: the large side gets a
    * deterministic-per-row salt in [0, saltFactor); the small side is
    * replicated once per salt value. Hot keys spread over saltFactor
    * reducers. Join RESULT is identical to the unsalted join for any
    * salt assignment (the small side carries every salt). */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
                 saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0)
    // right/full outer would preserve each unmatched REPLICATED small
    // row saltFactor times — not equal to the unsalted join. Only
    // large-side-preserving join types are sound under salting.
    val normalized = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti")
        .contains(normalized),
      s"saltedJoin supports inner/left/semi/anti join types, got $joinType")
    val salted = large.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(saltFactor.toLong)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Bucketed + sorted table write: pays the shuffle once so that
    * joins/aggregations on the bucket key skip their Exchange (and
    * with matching sort, their Sort) forever after. Requires a table
    * catalog (in-memory session catalog works). */
  def writeBucketed(df: DataFrame, table: String, bucketKeys: Seq[String],
                    numBuckets: Int,
                    sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketKeys.head, bucketKeys.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*)
     else w).saveAsTable(table)
  }
}
