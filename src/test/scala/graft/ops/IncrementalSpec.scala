package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.SparkSpec

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def raw(n: Int, seed: Int): DataFrame =
    (1 to n).map { i =>
      (s"k${(i * seed) % 7}",
        BigDecimal((i * 31 + seed) % 1000) / 100,
        ((i * 17 + seed) % 50).toLong)
    }.toDF("k", "amount", "qty")
      .withColumn("amount", col("amount").cast(DecimalType(18, 2)))

  private def gold(df: DataFrame): DataFrame =
    Incremental.partialAggregate(df, Seq("k"),
      sumCols = Seq("amount", "qty"),
      minCols = Seq("amount"), maxCols = Seq("amount"))

  private def rows(df: DataFrame): Seq[Seq[String]] =
    df.orderBy("k").collect().map(_.toSeq.map(String.valueOf)).toSeq

  test("merging split partials equals the one-shot aggregate at any cut") {
    // cut the deterministic local Seq, not the DataFrame: an
    // unordered limit/exceptAll pair can select different rows across
    // the two jobs that would evaluate it
    val rowsSeq = (1 to 500).map { i =>
      (s"k${(i * 3) % 7}",
        BigDecimal((i * 31 + 3) % 1000) / 100,
        ((i * 17 + 3) % 50).toLong)
    }
    def df(xs: Seq[(String, BigDecimal, Long)]) =
      xs.toDF("k", "amount", "qty")
        .withColumn("amount", col("amount").cast(DecimalType(18, 2)))
    val oneShot = rows(gold(df(rowsSeq)))
    for (cut <- Seq(0, 1, 137, 499, 500)) {
      val (a, b) = rowsSeq.splitAt(cut)
      val merged = Incremental.merge(Seq(gold(df(a)), gold(df(b))),
        Seq("k"), sumCols = Seq("amount", "qty"),
        minCols = Seq("amount"), maxCols = Seq("amount"))
      assert(rows(merged) == oneShot, s"cut=$cut")
    }
  }

  test("new keys pass through; re-merging merged state is a no-op shape") {
    val a = Seq(("old", BigDecimal(1.50), 2L)).toDF("k", "amount", "qty")
      .withColumn("amount", col("amount").cast(DecimalType(18, 2)))
    val b = Seq(("new", BigDecimal(9.99), 1L)).toDF("k", "amount", "qty")
      .withColumn("amount", col("amount").cast(DecimalType(18, 2)))
    val m = Incremental.merge(Seq(gold(a), gold(b)), Seq("k"),
      sumCols = Seq("amount", "qty"),
      minCols = Seq("amount"), maxCols = Seq("amount"))
    assert(m.count() == 2)
    // associativity: ((p1 ⊕ p2) ⊕ p3) ≡ (p1 ⊕ p2 ⊕ p3)
    val c = raw(50, 5)
    val stepwise = Incremental.merge(Seq(m, gold(c)), Seq("k"),
      sumCols = Seq("amount", "qty"),
      minCols = Seq("amount"), maxCols = Seq("amount"))
    val flat = Incremental.merge(Seq(gold(a), gold(b), gold(c)), Seq("k"),
      sumCols = Seq("amount", "qty"),
      minCols = Seq("amount"), maxCols = Seq("amount"))
    assert(rows(stepwise) == rows(flat))
    assert(rows(stepwise) == rows(gold(a.unionByName(b).unionByName(c))))
  }

  test("merge is one exchange over partial state, with map-side combine") {
    val p1 = gold(raw(200, 3)).localCheckpoint(true)
    val p2 = gold(raw(200, 11)).localCheckpoint(true)
    val m = Incremental.merge(Seq(p1, p2), Seq("k"),
      sumCols = Seq("amount", "qty"),
      minCols = Seq("amount"), maxCols = Seq("amount"))
    m.collect()
    // AQE's toString prints final AND initial plans — count exchanges
    // in the final section only
    val plan = m.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the union of stored+delta feeds ONE hash exchange; the merge
    // aggregate partial-combines before it (delta-sized shuffle)
    assert("Exchange".r.findAllIn(plan).length == 1, plan)
    assert(plan.contains("partial_sum") || plan.contains("HashAggregate"),
      plan)
  }
}
