package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin returns exactly the unsalted join result") {
    // skewed: 900 of 1000 rows share key 1
    val large = (1 to 1000).map(i => (if (i <= 900) 1 else i, i))
      .toDF("k", "v")
    val small = Seq((1, "hot"), (950, "cold"), (9999, "unmatched"))
      .toDF("k", "name")
    val plain = large.join(small, Seq("k")).orderBy("v")
      .collect().map(_.toSeq).toSeq
    val salted = Skew.saltedJoin(large, small, Seq("k"), saltFactor = 8)
      .orderBy("v").collect().map(_.toSeq).toSeq
    assert(salted == plain)
    assert(salted.size == 901)
    // left joins preserve unmatched large rows exactly once
    val leftPlain = large.join(small, Seq("k"), "left").count()
    val leftSalted =
      Skew.saltedJoin(large, small, Seq("k"), 8, "left").count()
    assert(leftSalted == leftPlain)
  }

  test("bucketed tables join without an exchange on the bucket key") {
    val a = (1L to 500L).map(i => (i, s"a$i")).toDF("id", "pa")
    val b = (1L to 500L).map(i => (i, i * 2.0)).toDF("id", "pb")
    Skew.writeBucketed(a, "bkt_a", Seq("id"), 4, sortCols = Seq("id"))
    Skew.writeBucketed(b, "bkt_b", Seq("id"), 4, sortCols = Seq("id"))
    val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "id")
    assert(joined.count() == 500)
    val plan = joined.queryExecution.executedPlan.toString
    // both sides bucketed on the join key -> no shuffle before the join
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected exchange-free bucketed join, got:\n$plan")
  }
}
