package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKAggregateSpec extends SparkSpec {
  import spark.implicits._

  test("topk_by_value matches window-rank across many partitions (merge path)") {
    // 5000 rows over 23 groups, shuffled into 17 partitions so the
    // partial/merge/serialize path is genuinely exercised
    val rows = (1 to 5000).map { i =>
      (s"g${i % 23}", ((i * 2654435761L) % 997).toDouble / 7.0, i.toLong)
    }
    val df = rows.toDF("g", "v", "id").repartition(17)

    val agg = df.groupBy("g")
      .agg(TopKAggregate.topk_by_value(col("v"), col("id"), 5).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).as("rank"),
        col("col.id").as("id"), col("col.value").as("v"))

    val win = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("g").orderBy(col("v").desc, col("id"))
      df.withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
        .select(col("g"), col("rank").cast("int"), col("id"), col("v"))
    }

    val a = agg.orderBy("g", "rank").collect().map(_.toSeq).toSeq
    val b = win.orderBy("g", "rank").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("value ties break by ascending id, deterministically") {
    val df = Seq(("g", 1.0, 9L), ("g", 1.0, 3L), ("g", 1.0, 7L),
      ("g", 2.0, 5L)).toDF("g", "v", "id")
    val top = df.groupBy("g")
      .agg(TopKAggregate.topk_by_value(col("v"), col("id"), 3).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.id"), col("e.value")).as[(Long, Double)]
      .collect().toSeq
    assert(top == Seq((5L, 2.0), (3L, 1.0), (7L, 1.0)))
  }

  test("groups smaller than k return all rows; null value/id rows are skipped") {
    val df = Seq(
      (java.lang.Double.valueOf(4.0), java.lang.Long.valueOf(1L)),
      (null.asInstanceOf[java.lang.Double], java.lang.Long.valueOf(2L)),
      (java.lang.Double.valueOf(6.0), null.asInstanceOf[java.lang.Long])
    ).toDF("v", "id")
    val top = df.agg(TopKAggregate.topk_by_value(col("v"), col("id"), 10)
        .as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.id"), col("e.value")).as[(Long, Double)]
      .collect().toSeq
    assert(top == Seq((1L, 4.0)))
  }

  test("q55 oracle precondition: every group fits the GK full-retention bound") {
    // the q55 oracle replays percentile_approx as "element at rank
    // ceil(q*n)", which is exact ONLY while n/group < accuracy/2 =
    // 5000 (the GK summary never compresses). Guard the invariant at
    // the largest shipped SF so a future testdata refresh crossing it
    // fails HERE with the explanation, not as a confusing q55
    // correctness flap (compression depends on partition merge order).
    val maxGroup = graft.io.Tables.documents(spark, "/root/testdata/sf0.1")
      .groupBy("lang").count().agg(max("count")).as[Long].head()
    assert(maxGroup < 5000,
      s"largest lang group $maxGroup >= 5000: percentile_approx may " +
        "compress and the q55 oracle's rank rule no longer applies — " +
        "lower q55's group sizes or drop its approx_val oracle column")
  }

  test("percentile_approx stays within 5% of exact on testdata documents") {
    val docs = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
    val rows = docs.groupBy("lang")
      .agg(percentile_approx(col("n_chars"), lit(0.5), lit(10000))
          .as("approx_p50"),
        expr("percentile(n_chars, 0.5)").as("exact_p50"))
      .as[(String, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (lang, approx, exact) =>
      val err = math.abs(approx - exact) / exact
      assert(err < 0.05, s"$lang: approx=$approx exact=$exact err=$err")
    }
  }

  test("approx_count_distinct stays within 5% of exact on testdata events") {
    val ev = graft.io.Tables.events(spark, "/root/testdata/sf0.001")
    val rows = ev.groupBy("event_type")
      .agg(approx_count_distinct(col("user_id")).as("approx"),
        countDistinct(col("user_id")).as("exact"))
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (et, approx, exact) =>
      val err = math.abs(approx - exact).toDouble / exact
      assert(err < 0.05, s"$et: approx=$approx exact=$exact err=$err")
    }
  }
}
