package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("profileColumns: nulls, distincts, and rendered min/max per column") {
    val df = Seq(
      (Some(1L), Some("b"), Some(1.005)),
      (Some(2L), None, Some(2.5)),
      (Some(2L), Some("a"), None),
      (None, Some("a"), Some(2.5)))
      .toDF("k", "s", "v")
    val out = Stats.profileColumns(df, Seq(
        "k" -> Stats.asString, "s" -> Stats.asString, "v" -> Stats.money2))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet === Set("k", "s", "v"))
    val k = out("k")
    assert(k.getAs[Long]("n_rows") === 4)
    assert(k.getAs[Long]("n_nulls") === 1)
    assert(k.getAs[Long]("n_distinct") === 2)
    assert(k.getAs[String]("min_value") === "1" &&
      k.getAs[String]("max_value") === "2")
    val s = out("s")
    assert(s.getAs[Long]("n_nulls") === 1)
    assert(s.getAs[Long]("n_distinct") === 2)
    assert(s.getAs[String]("min_value") === "a" &&
      s.getAs[String]("max_value") === "b")
    // money floor: 1.005 is stored as 1.00499…, so *100 + 0.5
    // floors to 100 → "1.00" (IEEE-exact, and identical in DuckDB —
    // the convention trades half-cent ties for engine agreement)
    val v = out("v")
    assert(v.getAs[String]("min_value") === "1.00" &&
      v.getAs[String]("max_value") === "2.50")
  }

  test("profileColumns: approxDistinct swaps in HLL++ and stays near exact") {
    val df = (0 until 1000).map(i => (i.toLong % 100, i.toLong))
      .toDF("mod", "id")
    val exact = Stats.profileColumns(df,
        Seq("mod" -> Stats.asString, "id" -> Stats.asString))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_distinct")).toMap
    assert(exact("mod") === 100 && exact("id") === 1000)
    val approx = Stats.profileColumns(df,
        Seq("mod" -> Stats.asString, "id" -> Stats.asString),
        approxDistinct = true)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_distinct")).toMap
    assert(math.abs(approx("mod") - 100L) <= 10)
    assert(math.abs(approx("id") - 1000L) <= 100)
    // the approx plan must NOT contain the multi-distinct Expand
    val plan = Stats.profileColumns(df,
      Seq("mod" -> Stats.asString, "id" -> Stats.asString),
      approxDistinct = true).queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"))
  }

  test("profileColumns: empty input yields zero counts and null min/max") {
    val df = Seq.empty[(Long, String)].toDF("k", "s")
    val out = Stats.profileColumns(df,
        Seq("k" -> Stats.asString, "s" -> Stats.asString))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("k").getAs[Long]("n_rows") === 0)
    assert(out("k").getAs[Long]("n_distinct") === 0)
    assert(out("k").getAs[String]("min_value") === null)
  }
}
