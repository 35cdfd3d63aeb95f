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

  test("selective dim filter injects a runtime bloom filter on the " +
      "fact side of a shuffle join (r9)") {
    // DPP prunes what is READ (partition grain); the runtime bloom
    // filter prunes what MOVES (row grain, any key): the fact side
    // gets might_contain(<dim keys bloom>) BEFORE its exchange.
    // ProfileBloomFilter10x measures the effect at sf0.1: shuffle
    // records 600288 -> 1401 (428x fewer rows moved).
    import org.apache.spark.sql.functions.{count, lit}
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      // locally the fact is far below the 10 GB application-side
      // default (which binds correctly at warehouse scale), and the
      // dim must not broadcast (injection targets shuffle joins)
      conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      def query() = {
        val li = graft.io.Tables.lineitem(spark, "/root/testdata/sf0.001")
        val o = graft.io.Tables.orders(spark, "/root/testdata/sf0.001")
          .filter(col("o_custkey") % 500 === 0)
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      }
      val on = query(); on.collect()
      assert(on.queryExecution.executedPlan.toString
          .contains("might_contain"),
        s"expected an injected runtime bloom filter:\n" +
          on.queryExecution.executedPlan)
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val off = query(); off.collect()
      assert(!off.queryExecution.executedPlan.toString
        .contains("might_contain"))
      // semi-join reduction never changes the result
      assert(on.orderBy("o_orderstatus").collect().toSeq ==
        off.orderBy("o_orderstatus").collect().toSeq)
    } finally {
      keys.foreach(k => saved(k) match {
        case Some(v) => conf.set(k, v)
        case None => conf.unset(k)
      })
    }
  }
}
