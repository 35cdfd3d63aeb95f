package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-risk auditing for training-data release — the k-anonymity /
  * l-diversity pass a corpus takes before rows with personal
  * attributes may ship: an EQUIVALENCE CLASS is the set of rows
  * sharing one combination of quasi-identifier values; a class is
  * re-identifying if it is small (fewer than k members — an attacker
  * who knows the quasi-identifiers pins an individual to few rows)
  * or homogeneous (fewer than l distinct sensitive values — the
  * class maps everyone in it to the same secret).
  *
  * Shape at 100 TB: the audit is ONE map-side-combined aggregate
  * over the quasi-identifier key — count plus a single exact
  * count-distinct (two-phase partial aggregation; no window, no
  * self-join); suppression is one broadcast-or-shuffled semi-join of
  * the risky-class keys back onto the rows. Quasi-identifier skew
  * (one giant class) is harmless — giant classes are precisely the
  * SAFE ones, and the distinct-sensitive state per group is bounded
  * by the sensitive domain, not the class size.
  */
object Privacy {

  /** Per-class audit: (quasi cols…, n, n_sensitive, small, uniform)
    * for every equivalence class failing k-anonymity (n < k) or
    * l-diversity (distinct sensitive < l), ordered by the quasi
    * columns. The healthy classes stay out of the artifact — at
    * warehouse scale the risky tail is what a release gate reads. */
  def kAnonymityAudit(rows: DataFrame, quasiCols: Seq[String],
                      sensitive: Column, k: Long, l: Long): DataFrame = {
    require(quasiCols.nonEmpty && k >= 1 && l >= 1,
      "need quasi columns and positive k, l")
    rows.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        count_distinct(sensitive).as("n_sensitive"))
      .withColumn("small", col("n") < k)
      .withColumn("uniform", col("n_sensitive") < l)
      .filter(col("small") || col("uniform"))
      .orderBy(quasiCols.map(col): _*)
  }

  /** Suppression: the rows whose equivalence class passes BOTH
    * gates — the releasable subset (identified by `idCol`, ordered).
    * Complement of [[kAnonymityAudit]] by construction: a left-anti
    * join of the rows against the risky classes, NULL-SAFE on every
    * quasi column — groupBy treats NULL as a grouping value, so a
    * risky all-NULL class must also match its rows here (a plain
    * equi-join's NULL ≠ NULL would quietly RELEASE exactly the rows
    * the audit flagged). */
  def suppress(rows: DataFrame, quasiCols: Seq[String],
               sensitive: Column, k: Long, l: Long,
               idCol: String): DataFrame = {
    val risky = kAnonymityAudit(rows, quasiCols, sensitive, k, l)
      .select(quasiCols.map(c => col(c).as(s"__r_$c")): _*)
    val cond = quasiCols.map(c => col(c) <=> col(s"__r_$c"))
      .reduce(_ && _)
    rows.join(risky, cond, "left_anti")
      .select(col(idCol))
      .orderBy(idCol)
  }

  /** Per-row release DECISIONS: (id, released) for EVERY input row —
    * the record-level artifact a release pipeline consumes (and, on
    * a fully-risky corpus, still a meaningful non-empty output where
    * [[suppress]]'s released-only view collapses to zero rows). Same
    * null-safe class membership as [[suppress]]; a left join + flag
    * instead of the anti-join. */
  def releaseDecisions(rows: DataFrame, quasiCols: Seq[String],
                       sensitive: Column, k: Long, l: Long,
                       idCol: String): DataFrame = {
    val risky = kAnonymityAudit(rows, quasiCols, sensitive, k, l)
      .select(quasiCols.map(c => col(c).as(s"__r_$c")) :+
        lit(1).as("__risky"): _*)
    val cond = quasiCols.map(c => col(c) <=> col(s"__r_$c"))
      .reduce(_ && _)
    rows.join(risky, cond, "left")
      .select(col(idCol), col("__risky").isNull.as("released"))
      .orderBy(idCol)
  }
}
