package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // conversions: (conv_id, user, ts); touches: (user, touch_ts, touch_id)
  private val convs = Seq(
    (100L, 1L, ts("2024-01-10 12:00:00")), // two in-window touches
    (101L, 1L, ts("2024-01-20 00:00:00")), // touch exactly at instant
    (102L, 2L, ts("2024-01-10 00:00:00")), // touch exactly horizon-old
    (103L, 3L, ts("2024-01-10 00:00:00")), // no touches at all
    (104L, 4L, ts("2024-01-10 00:00:00"))  // duplicate-time touches
  ).toDF("conv_id", "user_id", "cts")
  private val touches = Seq(
    (1L, ts("2024-01-08 12:00:00"), 11L),
    (1L, ts("2024-01-05 12:00:00"), 10L),
    (1L, ts("2024-01-20 00:00:00"), 12L), // == conv 101 instant
    (2L, ts("2024-01-03 00:00:00"), 20L), // == conv 102 ts − 7d exactly
    (4L, ts("2024-01-09 00:00:00"), 40L), // same instant as 41
    (4L, ts("2024-01-09 00:00:00"), 41L)
  ).toDF("user_id", "tts", "touch_id")

  private lazy val out = Attribution.lastTouch(convs, touches,
    Seq("user_id"), leftId = "conv_id", leftTime = "cts",
    rightTime = "tts", rightCols = Seq("touch_id"), horizon = "7 days")
    .orderBy("conv_id").collect()

  test("last in-window touch, count, and gap") {
    val r100 = out.find(_.getLong(0) == 100L).get
    assert(r100.getLong(4) == 11L)            // latest of 10/11
    assert(r100.getLong(5) == 2L)             // both in window
    assert(r100.getLong(6) == 2L * 86400L * 1000000L) // 2-day gap in µs
  }

  test("touch at the conversion instant is included (closed upper bound)") {
    val r101 = out.find(_.getLong(0) == 101L).get
    assert(r101.getLong(4) == 12L && r101.getLong(5) == 1L)
    assert(r101.getLong(6) == 0L)
  }

  test("touch exactly horizon-old is excluded (open lower bound)") {
    val r102 = out.find(_.getLong(0) == 102L).get
    assert(r102.isNullAt(3) && r102.isNullAt(4) && r102.getLong(5) == 0L)
  }

  test("no touches → nulls and zero count") {
    val r103 = out.find(_.getLong(0) == 103L).get
    assert(r103.isNullAt(3) && r103.isNullAt(4))
    assert(r103.getLong(5) == 0L && r103.isNullAt(6))
  }

  test("equal-time touches: lexicographically greatest payload wins") {
    val r104 = out.find(_.getLong(0) == 104L).get
    assert(r104.getLong(4) == 41L && r104.getLong(5) == 2L)
  }

  test("left columns and row count are preserved exactly") {
    assert(out.length == convs.count())
    assert(out.map(_.getLong(0)).toSeq == Seq(100L, 101L, 102L, 103L, 104L))
    // left ts round-trips through the probe cast untouched
    assert(out.find(_.getLong(0) == 100L).get
      .getTimestamp(2) == ts("2024-01-10 12:00:00"))
  }

  test("lastTouch ≡ touchPairs rollup on real events (sf0.001)") {
    val ev = graft.io.Tables.events(spark, "/root/testdata/sf0.001")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"),
        col("event_id").as("view_event_id"))
    val fast = Attribution.lastTouch(purchases, views, Seq("user_id"),
      "event_id", "ts", "view_ts", Seq("view_event_id"), "7 days")
    // brute model: all pairs → argmax + count, left-joined back
    val pairs = Attribution.touchPairs(purchases, views, Seq("user_id"),
      "ts", "view_ts", Seq("view_event_id"), "7 days")
    val rolled = pairs.groupBy("event_id")
      .agg(max(struct(col("view_ts"), col("view_event_id"))).as("best"),
        count(lit(1)).as("n_touches"))
    val expected = purchases.join(rolled, Seq("event_id"), "left")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("best.view_ts").as("view_ts"),
        col("best.view_event_id").as("view_event_id"),
        coalesce(col("n_touches"), lit(0L)).as("n_touches"),
        (unix_micros(col("ts").cast("timestamp")) -
          unix_micros(col("best.view_ts").cast("timestamp")))
          .as("touch_gap_us"))
    assert(fast.count() == purchases.count())
    assert(fast.exceptAll(expected).isEmpty && expected.exceptAll(fast).isEmpty)
    // the fixture exercises both branches: some purchases attributed,
    // some not
    assert(fast.filter(col("view_event_id").isNotNull).count() > 0)
    assert(fast.filter(col("view_event_id").isNull).count() > 0)
  }

  test("plans: lastTouch never pays O(matches); touchPairs is an equi join") {
    val ev = graft.io.Tables.events(spark, "/root/testdata/sf0.001")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"),
        col("event_id").as("view_event_id"))
    val fastPlan = Attribution.lastTouch(purchases, views, Seq("user_id"),
      "event_id", "ts", "view_ts", Seq("view_event_id"), "7 days")
      .queryExecution.executedPlan.toString
    // union+window formulation: no join operator at all on the scale
    // path — O(|L|·2 + |R|) rows through the single key exchange
    assert(!fastPlan.contains("Join"), fastPlan)
    val pairsPlan = Attribution.touchPairs(purchases, views, Seq("user_id"),
      "ts", "view_ts", Seq("view_event_id"), "7 days")
      .queryExecution.executedPlan.toString
    // equi key present → shuffled/broadcast HASH join with the range
    // as residual, never a nested-loop cartesian
    assert(!pairsPlan.contains("NestedLoop"), pairsPlan)
  }
}
