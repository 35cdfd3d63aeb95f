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

  /** The raw-bookings contract used by the curate pipeline. */
  def bookingsChecks: Seq[Check] = Seq(
    NotNull("booking_id"), NotNull("booking_status"),
    InEnum("booking_status", Seq("confirmed", "pending", "canceled")),
    ParsesAsRawDate("booking_date"), ParsesAsRawDate("checkin_date"),
    ParsesAsRawDate("checkout_date"),
    NonNegative("total_price"),
    OrderedDates("checkin_date", "checkout_date"))
}
