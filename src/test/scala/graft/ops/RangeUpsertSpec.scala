package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeUpsertSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("binned range join equals the naive nested-loop result") {
    val points = Seq(
      (1L, ts("2024-01-01 00:00:00")),   // exactly at a start (inclusive)
      (2L, ts("2024-01-03 23:59:59")),   // last second of an interval
      (3L, ts("2024-01-04 00:00:00")),   // exactly at an end (exclusive)
      (4L, ts("2024-02-10 12:00:00")),   // inside a long interval
      (5L, ts("2023-12-31 23:59:59")),   // before everything
      (6L, ts("2024-01-02 05:00:00"))    // overlapping intervals → 2 rows
    ).toDF("pid", "t")
    val intervals = Seq(
      (10L, ts("2024-01-01 00:00:00"), ts("2024-01-04 00:00:00")),
      (11L, ts("2024-01-02 00:00:00"), ts("2024-01-02 12:00:00")),
      (12L, ts("2024-02-01 00:00:00"), ts("2024-03-01 00:00:00"))
    ).toDF("iid", "start_t", "end_t")

    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq

    val naive = key(RangeJoin.naive(points, intervals, "t", "start_t", "end_t"))
    val binned = key(RangeJoin.binned(points, intervals, "t", "start_t", "end_t"))
    assert(binned == naive)
    assert(naive == Seq((1L, 10L), (2L, 10L), (4L, 12L), (6L, 10L), (6L, 11L)))

    // also exact under a bin much smaller / larger than the intervals
    assert(key(RangeJoin.binned(points, intervals, "t", "start_t", "end_t",
      binSeconds = 3600L)) == naive)
    assert(key(RangeJoin.binned(points, intervals, "t", "start_t", "end_t",
      binSeconds = 604800L)) == naive)
    // broadcast interval-index formulation agrees too (same schema
    // contract: point columns ++ interval columns)
    val indexed = RangeJoin.broadcastIndexed(
      points, intervals, "t", "start_t", "end_t")
    assert(indexed.columns.toSeq ==
      points.columns.toSeq ++ intervals.columns.toSeq)
    assert(key(indexed) == naive)
  }

  test("binned keeps matches when the interval end has a sub-second " +
      "fraction just past a bin boundary") {
    // end = 00:00:00.500 on day 2: the final covered bin is day 2
    // itself — second-truncating bin arithmetic dropped it (regression)
    val points = Seq((1L, ts("2024-01-02 00:00:00.2")))
      .toDF("pid", "t")
    val intervals = Seq(
      (10L, ts("2024-01-01 23:00:00"), ts("2024-01-02 00:00:00.5")))
      .toDF("iid", "start_t", "end_t")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("pid", "iid").as[(Long, Long)].collect().toSeq
    assert(key(RangeJoin.naive(points, intervals, "t", "start_t", "end_t"))
      == Seq((1L, 10L)))
    assert(key(RangeJoin.binned(points, intervals, "t", "start_t", "end_t"))
      == Seq((1L, 10L)))
    assert(key(RangeJoin.broadcastIndexed(
      points, intervals, "t", "start_t", "end_t")) == Seq((1L, 10L)))
  }

  test("broadcastIndexed refuses an interval side over the driver gate") {
    // 10 intervals against a gate of 4: the counted gate must fail
    // loudly BEFORE any driver-side collect, naming the fallback
    val points = Seq((1L, ts("2024-01-01 12:00:00"))).toDF("pid", "t")
    val intervals = spark.range(10)
      .select(col("id").as("iid"),
        lit(ts("2024-01-01 00:00:00")).as("start_t"),
        lit(ts("2024-01-02 00:00:00")).as("end_t"))
    val e = intercept[IllegalArgumentException] {
      RangeJoin.broadcastIndexed(points, intervals,
        "t", "start_t", "end_t", maxDriverIntervals = 4L)
    }
    assert(e.getMessage.contains("maxDriverIntervals") &&
      e.getMessage.contains("binned"), e.getMessage)
    // exactly at the gate still runs (the probe counts max+1, so a
    // side of exactly max rows passes) and agrees with naive
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
    assert(key(RangeJoin.broadcastIndexed(points, intervals,
        "t", "start_t", "end_t", maxDriverIntervals = 10L)) ==
      key(RangeJoin.naive(points, intervals, "t", "start_t", "end_t")))
  }

  test("latestByKey picks the (max version, max tiebreak) row with its payload") {
    val changelog = Seq(
      ("u1", 1L, 10L, "a"),
      ("u1", 3L, 11L, "b"),   // winner: max ts
      ("u1", 3L, 9L, "c"),    // same ts, lower id → loses
      ("u2", 5L, 1L, "d")
    ).toDF("k", "ts", "id", "v")
    val got = Upsert.latestByKey(changelog, Seq("k"), Seq("ts", "id"), Seq("v"))
      .as[(String, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq(("u1", 3L, 11L, "b"), ("u2", 5L, 1L, "d")))
  }

  test("latestByKey equals the window-rank formulation and map-side combines") {
    val n = 2000
    val changelog = (1 to n).map { i =>
      (s"k${i % 37}", (i * 7919) % 101, i.toLong, s"v$i")
    }.toDF("k", "ver", "id", "v").repartition(13)
    val agg = Upsert.latestByKey(changelog, Seq("k"), Seq("ver", "id"), Seq("v"))
    val win = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("k")
        .orderBy(col("ver").desc, col("id").desc)
      changelog.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
    }
    val a = agg.orderBy("k").collect().map(_.toSeq).toSeq
    val b = win.select(agg.columns.map(col): _*)
      .orderBy("k").collect().map(_.toSeq).toSeq
    assert(a == b)
    // the aggregate plan must carry partial aggregation (map-side
    // combine) — the scale rationale for preferring it to the window
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("partial_max") || plan.contains("HashAggregate"),
      s"expected a partial aggregate, got:\n$plan")
  }

  test("applyUpdates replaces matched keys and keeps the rest") {
    val base = Seq((1L, "old1"), (2L, "old2"), (3L, "old3")).toDF("k", "v")
    val updates = Seq((2L, "new2"), (4L, "new4")).toDF("k", "v")
    val got = Upsert.applyUpdates(base, updates, Seq("k"))
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "old1"), (2L, "new2"), (3L, "old3"), (4L, "new4")))
  }

  test("overlapBinned: half-open semantics, single emission, ≡ naive") {
    val left = Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 02:00:00")),
      (2L, ts("2024-01-01 06:00:00"), ts("2024-01-01 06:00:00")), // empty
      (3L, ts("2024-01-01 10:00:00"), ts("2024-01-05 10:00:00")), // spans days
      (4L, ts("2024-01-02 00:00:00"), ts("2024-01-02 01:00:00"))
    ).toDF("lid", "ls", "le")
    val right = Seq(
      (10L, ts("2024-01-01 01:00:00"), ts("2024-01-01 03:00:00")), // ∩ 1
      (11L, ts("2024-01-01 02:00:00"), ts("2024-01-01 04:00:00")), // touches 1 → no
      (12L, ts("2023-12-31 00:00:00"), ts("2024-01-06 00:00:00")), // contains all
      (13L, ts("2024-01-01 05:00:00"), ts("2024-01-01 07:00:00"))  // around empty 2
    ).toDF("rid", "rs", "re")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("lid", "rid", "overlap_micros")
        .as[(Long, Long, Long)].collect().sorted.toSeq
    val naive = pairs(RangeJoin.overlapNaive(left, right, "ls", "le", "rs", "re"))
    val binned = pairs(RangeJoin.overlapBinned(left, right, "ls", "le", "rs", "re"))
    assert(binned == naive)
    // half-open: touching intervals don't pair; empty intervals never
    // pair even when strictly inside another; multi-day × container
    // emits ONCE with the exact overlap
    assert(naive == Seq(
      (1L, 10L, 3600000000L),
      (1L, 12L, 7200000000L),
      (3L, 12L, 4L * 86400L * 1000000L),
      (4L, 12L, 3600000000L)))
    // bin width much smaller / larger than the intervals: unchanged
    for (bin <- Seq(3600L, 604800L))
      assert(pairs(RangeJoin.overlapBinned(left, right,
        "ls", "le", "rs", "re", binSeconds = bin)) == naive)
    // plan contract: ONE equi-join on the bin id, no nested loop,
    // no distinct/dedup exchange after the join (the first-shared-bin
    // rule replaces it)
    val df = RangeJoin.overlapBinned(left, right, "ls", "le", "rs", "re")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val joinOps = plan.linesIterator.count(l =>
      l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin") ||
        l.contains("BroadcastHashJoin"))
    assert(joinOps == 1, plan)
    assert(!plan.contains("BroadcastNestedLoop") &&
      !plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("HashAggregate(keys=[lid"), plan) // no dedup pass
  }

  test("overlapBinned ≡ naive on random intervals with sub-second bounds") {
    // pseudo-random interval sets whose endpoints carry millisecond
    // fractions straddling bin boundaries — the arithmetic class that
    // once bit the point-in-interval binning (end−1µs regression)
    def mk(seed: Int, n: Int, idBase: Long) = (1 to n).map { i =>
      val s = ((i * 7919 + seed * 104729) % 14400) * 500L +  // ~2h span
        ((i * 131) % 1000)                                    // ms fraction
      val len = ((i * 37 + seed) % 200) * 1000L + // 0–200 s, plus a
        ((i * 577) % 1000) + 1L                   // ms fraction of its own
      (idBase + i,
        new Timestamp(1704067200000L + s),
        new Timestamp(1704067200000L + s + len))
    }
    for (seed <- 1 to 3) {
      val left = mk(seed, 120, 0L).toDF("lid", "ls", "le")
      val right = mk(seed + 7, 80, 1000L).toDF("rid", "rs", "re")
      def pairs(df: org.apache.spark.sql.DataFrame) =
        df.select("lid", "rid", "overlap_micros")
          .as[(Long, Long, Long)].collect().sorted.toSeq
      val naive = pairs(RangeJoin.overlapNaive(
        left, right, "ls", "le", "rs", "re"))
      assert(naive.nonEmpty, s"seed=$seed generated no overlaps")
      for (bin <- Seq(1L, 7L, 3600L))
        assert(pairs(RangeJoin.overlapBinned(left, right,
          "ls", "le", "rs", "re", binSeconds = bin)) == naive,
          s"seed=$seed bin=$bin")
    }
  }

  test("scd2History collapses runs, reopens on recurrence, chains bounds") {
    val changelog = Seq(
      // u1: a, a (re-assert: NO new version), b, a (recurs: NEW run)
      ("u1", 1L, 1L, "a"),
      ("u1", 2L, 2L, "a"),
      ("u1", 3L, 3L, "b"),
      ("u1", 5L, 4L, "a"),
      // u2: single row → one current version
      ("u2", 4L, 5L, "x"),
      // u3: same-time tie — id orders the runs deterministically
      ("u3", 7L, 6L, "p"),
      ("u3", 7L, 7L, "q")
    ).toDF("k", "t", "id", "v")
    val got = Upsert.scd2History(changelog, Seq("k"), "t", Seq("id"), Seq("v"))
      .as[(String, String, Long, Option[Long], Boolean, Long)]
      .collect().sortBy(r => (r._1, r._6)).toSeq
    assert(got == Seq(
      ("u1", "a", 1L, Some(3L), false, 1L),
      ("u1", "b", 3L, Some(5L), false, 2L),
      ("u1", "a", 5L, None, true, 3L),
      ("u2", "x", 4L, None, true, 1L),
      ("u3", "p", 7L, Some(7L), false, 1L),
      ("u3", "q", 7L, None, true, 2L)))
  }

  test("scd2History: point-in-time lookup reproduces latestByKey, one exchange") {
    // history ⋈ asof at t = max observed time must equal SCD-1
    val n = 1500
    val changelog = (1 to n).map { i =>
      (s"k${i % 23}", (i * 131) % 97 + 1L, i.toLong, s"v${i % 5}")
    }.toDF("k", "t", "id", "v")
    val hist = Upsert.scd2History(changelog, Seq("k"), "t", Seq("id"), Seq("v"))
    // runs partition t: each key's intervals chain gaplessly from its
    // first t to null, exactly one current run per key
    val byKey = hist.orderBy("k", "version_seq")
      .as[(String, String, Long, Option[Long], Boolean, Long)]
      .collect().groupBy(_._1)
    byKey.values.foreach { runs =>
      assert(runs.count(_._5) == 1 && runs.last._5)
      runs.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4.contains(b._3)) // effective_to = next from
          assert(b._6 == a._6 + 1)
        case _ =>
      }
      // adjacent runs always differ in payload (collapse happened)
      runs.sliding(2).foreach {
        case Array(a, b) => assert(a._2 != b._2)
        case _ =>
      }
    }
    val current = hist.filter(col("is_current"))
      .select(col("k"), col("v")).as[(String, String)]
      .collect().sorted.toSeq
    val scd1 = Upsert.latestByKey(changelog, Seq("k"), Seq("t", "id"), Seq("v"))
      .select(col("k"), col("v")).as[(String, String)]
      .collect().sorted.toSeq
    assert(current == scd1)
    // scale contract: the lag pass and the lead/row_number pass share
    // one (partition, order) spec — exactly ONE shuffle, no join
    val plan = hist.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert("Exchange".r.findAllIn(plan).length == 1, plan)
  }
}
