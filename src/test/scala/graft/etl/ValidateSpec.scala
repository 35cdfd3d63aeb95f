package graft.etl

import graft.SparkSpec

class ValidateSpec extends SparkSpec {
  import spark.implicits._

  def dirty = Seq(
    (Some(1), "confirmed", "31/01/2024", "31/01/2024", "02/02/2024", 100.0),
    (Some(2), "WHAT",      "10/02/2024", "11/02/2024", "10/02/2024", -5.0),
    (None,    "pending",   "99/99/9999", "01/01/2024", "02/01/2024", 10.0))
    .toDF("booking_id", "booking_status", "booking_date",
      "checkin_date", "checkout_date", "total_price")

  test("single-pass quality report counts each violation kind") {
    val r = Validate.run(dirty, Validate.bookingsChecks)
    assert(r.total == 3)
    assert(!r.clean)
    assert(r.violations("not_null(booking_id)") == 1)
    assert(r.violations("in_enum(booking_status)") == 1)
    assert(r.violations("parses_date(booking_date)") == 1)   // 99/99/9999
    assert(r.violations("non_negative(total_price)") == 1)
    assert(r.violations("ordered(checkin_date<=checkout_date)") == 1)
  }

  test("clean data reports clean") {
    val r = Validate.run(dirty.limit(1), Validate.bookingsChecks)
    assert(r.clean && r.total == 1)
  }

  test("referentialAudit: orphan keys vs rows, null FKs, clean edge") {
    val child = Seq(
      (1L, Some(10L)), (2L, Some(10L)),  // valid fk, two rows
      (3L, Some(99L)), (4L, Some(99L)),  // orphan key 99, two rows
      (5L, Some(77L)),                   // orphan key 77, one row
      (6L, None)                         // null fk — NOT an orphan
    ).toDF("id", "fk")
    val parent = Seq(10L, 20L).toDF("pk")
    val edges = Seq(Validate.FkEdge("child", "fk", "parent", "pk"))
    val got = Validate.referentialAudit(
        Map("child" -> child, "parent" -> parent), edges)
      .as[(String, String, String, Long, Long, Long, Long)]
      .collect().toSeq
    assert(got == Seq(("child", "fk", "parent", 6L, 1L, 2L, 3L)))
    // an empty child is all-zero counts, not nulls
    val empty = Validate.referentialAudit(
        Map("child" -> child.filter($"id" < 0), "parent" -> parent),
        edges).collect().head
    assert((3 to 6).forall(i => empty.getLong(i) == 0L))
  }

  test("referentialAudit on real testdata: star schema is closed") {
    val dir = "/root/testdata/sf0.001"
    val rows = Validate.referentialAudit(
      name => graft.io.Tables.parquet(spark, dir, name)).collect()
    assert(rows.length == Validate.starFkEdges.length)
    // the synthetic star schema has no orphans and no null FKs
    assert(rows.forall(r =>
      r.getLong(4) == 0L && r.getLong(5) == 0L && r.getLong(6) == 0L))
    assert(rows.forall(_.getLong(3) > 0L))
  }

  test("dedupByKeyDeterministic keeps the minimal row per key") {
    val df = Seq((1, "b", 20), (1, "a", 10), (2, "c", 30))
      .toDF("k", "v", "x")
    val out = Curate.dedupByKeyDeterministic(df, Seq("k"), Seq("v"))
      .orderBy("k").collect()
    assert(out.map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "a"), (2, "c")))
  }
}
