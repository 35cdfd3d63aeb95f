package graft.etl

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Data-quality checks at layer boundaries (P9 + the reference
  * readme's own TODO "Add data validation and quality checks",
  * `readme.md:65` — its only primitive, `validate_columns`
  * (`helper_func.py:50-51`), is never called).
  *
  * All checks aggregate in ONE pass over the data (a single
  * HashAggregate — no per-check scans) and return a violation-count
  * report; callers decide whether to fail, quarantine, or log.
  */
object Validate {

  sealed trait Check { def name: String; def agg: org.apache.spark.sql.Column }

  /** Column must be non-null. */
  case class NotNull(col: String) extends Check {
    val name = s"not_null($col)"
    val agg = sum(when(expr(s"$col IS NULL"), 1L).otherwise(0L))
  }

  /** Column values must be within the allowed set (nulls pass —
    * combine with NotNull if needed). */
  case class InEnum(col: String, allowed: Seq[String]) extends Check {
    val name = s"in_enum($col)"
    val agg = sum(when(
      expr(s"$col IS NOT NULL") &&
        !org.apache.spark.sql.functions.col(col).isin(allowed.map(x => x: Any): _*),
      1L).otherwise(0L))
  }

  /** String column must parse as dd/MM/yyyy (nulls pass). Uses
    * `try_to_date` — under ANSI mode (Spark 4 default) plain `to_date`
    * THROWS on malformed input, which is precisely what a validation
    * gate must not do. */
  case class ParsesAsRawDate(col: String) extends Check {
    val name = s"parses_date($col)"
    val agg = sum(when(
      expr(s"$col IS NOT NULL") &&
        expr(s"try_to_date($col, '${Curate.RawDateFormat}')").isNull,
      1L).otherwise(0L))
  }

  /** Numeric column must be ≥ 0 (nulls pass). */
  case class NonNegative(col: String) extends Check {
    val name = s"non_negative($col)"
    val agg = sum(when(expr(s"$col < 0"), 1L).otherwise(0L))
  }

  /** endCol must be ≥ startCol where both present (e.g. checkout ≥
    * checkin). */
  case class OrderedDates(startCol: String, endCol: String) extends Check {
    val name = s"ordered($startCol<=$endCol)"
    private val s = s"try_to_date($startCol, '${Curate.RawDateFormat}')"
    private val e = s"try_to_date($endCol, '${Curate.RawDateFormat}')"
    val agg = sum(when(
      expr(s"$s IS NOT NULL AND $e IS NOT NULL") &&
        expr(s"datediff($e, $s)") < 0,
      1L).otherwise(0L))
  }

  case class Report(total: Long, violations: Map[String, Long]) {
    def clean: Boolean = violations.values.forall(_ == 0)
    def failed: Map[String, Long] = violations.filter(_._2 > 0)
  }

  /** Run all checks in a single aggregation pass. */
  def run(df: DataFrame, checks: Seq[Check]): Report = {
    val aggs = count(lit(1)).as("__total") +:
      checks.map(c => coalesce(c.agg, lit(0L)).as(c.name))
    val row: Row = df.agg(aggs.head, aggs.tail: _*).head()
    Report(
      row.getLong(0),
      checks.zipWithIndex.map { case (c, i) =>
        c.name -> row.getLong(i + 1)
      }.toMap)
  }

  /** One foreign-key edge of a star/snowflake schema. */
  case class FkEdge(child: String, fkCol: String,
                    parent: String, pkCol: String)

  /** The testdata star schema's FK edges — shared with the q180
    * oracle builder so the audited contract cannot drift between
    * the Spark and DuckDB sides. */
  val starFkEdges: Seq[FkEdge] = Seq(
    FkEdge("orders", "o_custkey", "customer", "c_custkey"),
    FkEdge("lineitem", "l_orderkey", "orders", "o_orderkey"),
    FkEdge("lineitem", "l_partkey", "part", "p_partkey"),
    FkEdge("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    FkEdge("customer", "c_nationkey", "nation", "n_nationkey"),
    FkEdge("supplier", "s_nationkey", "nation", "n_nationkey"),
    FkEdge("nation", "n_regionkey", "region", "r_regionkey"))

  /** Referential-integrity audit: for each FK edge, count child
    * rows, null FKs, orphan KEYS (distinct FK values with no parent)
    * and orphan ROWS (child rows carrying them) — the cross-table
    * complement of the single-table [[Check]]s, and the gate that
    * catches a partial parent load before a downstream inner join
    * silently drops the orphans.
    *
    * Scale shape: ONE scan per child per edge — the child collapses
    * to a (fk, count) aggregate (nulls form their own group, so
    * n_rows and n_null_fk fall out of the same frame), the parent to
    * a distinct key set; the left join that flags orphans carries
    * key-cardinality rows only, never child rows, and every output
    * is an exact long. Null FK keys never match the join (SQL null
    * semantics), which is exactly the NOT-EXISTS orphan definition.
    *
    * @param tables  table name → DataFrame (only names referenced by
    *                `edges` are looked up) */
  def referentialAudit(tables: String => DataFrame,
                       edges: Seq[FkEdge] = starFkEdges): DataFrame = {
    require(edges.nonEmpty, "need at least one FK edge")
    val perEdge = edges.map { e =>
      val fkCounts = tables(e.child)
        .groupBy(col(e.fkCol).as("k")).agg(count(lit(1)).as("__cnt"))
      val parentKeys = tables(e.parent)
        .select(col(e.pkCol).as("k")).distinct()
        .withColumn("__hit", lit(1))
      val orphanKey = col("k").isNotNull && col("__hit").isNull
      fkCounts.join(parentKeys, Seq("k"), "left").agg(
        coalesce(sum(col("__cnt")), lit(0L)).as("n_rows"),
        coalesce(sum(when(col("k").isNull, col("__cnt"))), lit(0L))
          .as("n_null_fk"),
        coalesce(sum(when(orphanKey, 1L).otherwise(0L)), lit(0L))
          .as("n_orphan_keys"),
        coalesce(sum(when(orphanKey, col("__cnt"))), lit(0L))
          .as("n_orphan_rows"))
        .select(lit(e.child).as("child_table"), lit(e.fkCol).as("fk_col"),
          lit(e.parent).as("parent_table"), col("n_rows"),
          col("n_null_fk"), col("n_orphan_keys"), col("n_orphan_rows"))
    }
    perEdge.reduce(_ unionByName _).orderBy("child_table", "fk_col")
  }

  /** The raw-bookings contract used by the curate pipeline. */
  def bookingsChecks: Seq[Check] = Seq(
    NotNull("booking_id"), NotNull("booking_status"),
    InEnum("booking_status", Seq("confirmed", "pending", "canceled")),
    ParsesAsRawDate("booking_date"), ParsesAsRawDate("checkin_date"),
    ParsesAsRawDate("checkout_date"),
    NonNegative("total_price"),
    OrderedDates("checkin_date", "checkout_date"))
}
