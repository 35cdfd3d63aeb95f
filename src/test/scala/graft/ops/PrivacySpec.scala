package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** k-anonymity / l-diversity audit (q158/q159): hand-computed class
  * gates, the audit/suppression complement invariant, and the
  * boundary semantics (n == k and ndv == l are SAFE — the gates are
  * strict less-than). */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  // classes: ("a",): 3 rows, 3 distinct secrets → small only (k=4)
  //          ("b",): 4 rows, 1 distinct secret  → uniform only (l=2)
  //          ("c",): 4 rows, 2 distinct secrets → safe (both == bounds)
  private lazy val rows = Seq(
    (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L),
    (4L, "b", 5L), (5L, "b", 5L), (6L, "b", 5L), (7L, "b", 5L),
    (8L, "c", 1L), (9L, "c", 1L), (10L, "c", 2L), (11L, "c", 2L))
    .toDF("id", "qi", "secret")

  test("audit flags small and uniform classes with strict bounds") {
    val audit = Privacy.kAnonymityAudit(rows, Seq("qi"), col("secret"),
        k = 4, l = 2)
      .select($"qi", $"n", $"n_sensitive", $"small", $"uniform")
      .as[(String, Long, Long, Boolean, Boolean)].collect()
    assert(audit.toSeq == Seq(
      ("a", 3L, 3L, true, false),
      ("b", 4L, 1L, false, true)))
  }

  test("suppression is the exact complement of the risky classes") {
    val kept = Privacy.suppress(rows, Seq("qi"), col("secret"),
      k = 4, l = 2, idCol = "id").as[Long].collect().toSeq
    assert(kept == Seq(8L, 9L, 10L, 11L))
  }

  test("NULL quasi values suppress null-safely (NULL class must not leak)") {
    val withNulls = rows.unionByName(Seq(
      (20L, null.asInstanceOf[String], 7L),
      (21L, null.asInstanceOf[String], 8L))
      .toDF("id", "qi", "secret"))
    // the NULL class has n=2 < 4 → risky; a plain equi-anti-join
    // would release ids 20/21 because NULL != NULL
    val kept = Privacy.suppress(withNulls, Seq("qi"), col("secret"),
      k = 4, l = 2, idCol = "id").as[Long].collect().toSeq
    assert(kept == Seq(8L, 9L, 10L, 11L))
  }

  test("releaseDecisions covers every row and agrees with suppress") {
    val dec = Privacy.releaseDecisions(rows, Seq("qi"), col("secret"),
      k = 4, l = 2, idCol = "id").as[(Long, Boolean)].collect().toMap
    assert(dec.size == 11, "one decision per input row")
    val kept = Privacy.suppress(rows, Seq("qi"), col("secret"),
      k = 4, l = 2, idCol = "id").as[Long].collect().toSet
    dec.foreach { case (id, released) =>
      assert(released == kept.contains(id),
        s"decision for $id disagrees with suppress")
    }
  }

  test("audit is non-empty on the real customer table at the q158 knobs") {
    val cust = graft.io.Tables.customer(spark, "/root/testdata/sf0.001")
    val audit = Privacy.kAnonymityAudit(cust,
      Seq("c_nationkey", "c_mktsegment"),
      floor(col("c_acctbal") / 1000.0).cast("long"), k = 10, l = 5)
    assert(audit.count() > 0)
  }
}
