package graft.ops

import java.sql.Date

import graft.SparkSpec

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  test("cohortRetention: first-month cohorts, return cells, month-0 = 1.0") {
    // u1: Jan, Feb, Apr; u2: Jan only; u3: Feb, Apr
    val events = Seq(
      (1L, d("2024-01-05")), (1L, d("2024-01-20")), (1L, d("2024-02-02")),
      (1L, d("2024-04-11")), (2L, d("2024-01-09")),
      (3L, d("2024-02-14")), (3L, d("2024-04-01"))
    ).toDF("user_id", "ts")
    val got = Analytics.cohortRetention(events)
      .as[(Date, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (d("2024-01-01"), 0L, 2L, 2L, 1.0),   // Jan cohort: u1, u2
      (d("2024-01-01"), 1L, 1L, 2L, 0.5),   // only u1 returns in Feb
      (d("2024-01-01"), 3L, 1L, 2L, 0.5),   // only u1 in Apr
      (d("2024-02-01"), 0L, 1L, 1L, 1.0),   // Feb cohort: u3
      (d("2024-02-01"), 2L, 1L, 1L, 1.0)))  // u3 returns in Apr
  }

  test("cohortRetention on real orders: month-0 cells reconcile") {
    val orders = graft.io.Tables.orders(spark, "/root/testdata/sf0.001")
      .select($"o_custkey".as("user_id"), $"o_orderdate".as("ts"))
    val got = Analytics.cohortRetention(orders)
      .as[(Date, Long, Long, Long, Double)].collect().toSeq
    assert(got.nonEmpty)
    // month 0: every cohort member is active by definition
    val m0 = got.filter(_._2 == 0L)
    assert(m0.forall(r => r._3 == r._4 && r._5 == 1.0))
    // cohort sizes sum to the distinct-user universe
    val users = orders.select("user_id").distinct().count()
    assert(m0.map(_._4).sum == users)
    // retention never exceeds 1 and cells never exceed cohort size
    assert(got.forall(r => r._3 <= r._4 && r._5 <= 1.0))
  }

  test("rfm: tiers from ordered metrics, champion segment code") {
    val orders = Seq(
      (101L, 10L, d("2024-03-10"), 100.0),
      (102L, 10L, d("2024-03-01"), 100.0),
      (103L, 10L, d("2024-02-01"), 100.0),  // A: recent, 3 orders, 300
      (104L, 20L, d("2024-03-08"), 60.0),
      (105L, 20L, d("2024-01-15"), 40.0),   // B: 2 days old, 2, 100
      (106L, 30L, d("2024-03-05"), 50.0),   // C: 5 days old, 1, 50
      (107L, 40L, d("2024-03-01"), 10.0)    // D: 9 days old, 1, 10
    ).toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val got = Analytics.rfm(orders, n = 2)
      .as[(Long, Long, Long, Double, Long, Long, Long, String)]
      .collect().toSeq
    val m = got.map(r => r._1 -> r).toMap
    assert(m(10L) == ((10L, 0L, 3L, 300.0, 1L, 1L, 1L, "111")))
    assert(m(20L) == ((20L, 2L, 2L, 100.0, 1L, 1L, 1L, "111")))
    assert(m(30L) == ((30L, 5L, 1L, 50.0, 2L, 2L, 2L, "222")))
    assert(m(40L) == ((40L, 9L, 1L, 10.0, 2L, 2L, 2L, "222")))
  }

  test("basketLift: counts, independence baseline, dup lines collapse") {
    // orders: o1{A,B,C}, o2{A,B}, o3{A}, o4{D} — A+B together twice;
    // duplicate (o1, A) line must not double-count
    val li = Seq(
      (1L, "A"), (1L, "A"), (1L, "B"), (1L, "C"),
      (2L, "A"), (2L, "B"), (3L, "A"), (4L, "D")
    ).toDF("l_orderkey", "l_partkey")
    val got = Analytics.basketLift(li, topN = 10)
      .as[(String, String, Long, Long, Long, Double, Double)]
      .collect().toSeq
    val m = got.map(r => (r._1, r._2) -> r).toMap
    // A,B: pair 2 of 4 orders; A in 3, B in 2 -> lift = 2*4/(3*2)
    assert(m(("A", "B")) ==
      (("A", "B", 2L, 3L, 2L, 0.5, 8.0 / 6.0)))
    assert(m(("A", "C"))._3 == 1L && m(("B", "C"))._3 == 1L)
    assert(!m.contains(("A", "D"))) // never co-ordered
    // ranked by exact pair count, ties by item ids
    assert(got.head._3 == 2L && got.map(_._3).sliding(2)
      .forall(p => p.size < 2 || p(1) <= p(0)))
  }

  test("basketLift: maxBasket drops a mega-basket's pairs only") {
    // o1..o3 are normal baskets; o9 is a planted 6-item mega-basket
    val normal = Seq(
      (1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"), (3L, "C")
    )
    val mega = (1 to 6).map(i => (9L, s"X$i"))
    val li = (normal ++ mega).toDF("l_orderkey", "l_partkey")
    val capped = Analytics.basketLift(li, topN = 100, maxBasket = 5)
      .as[(String, String, Long, Long, Long, Double, Double)]
      .collect().toSeq
    // no pair touches the dropped basket's items
    assert(capped.forall(r => !r._1.startsWith("X")))
    // but the ratio denominators still count o9: 4 orders total
    assert(capped.forall(r => r._6 == r._3.toDouble / 4.0))
    val m = capped.map(r => (r._1, r._2) -> r).toMap
    assert(m(("A", "B"))._3 == 2L)
    // the same data uncapped: X-pairs present, A/B row identical —
    // the cap changes NOTHING but the over-cap basket's own pairs
    val full = Analytics.basketLift(li, topN = 100)
      .as[(String, String, Long, Long, Long, Double, Double)]
      .collect().toSeq
    assert(full.count(_._1.startsWith("X")) == 15) // C(6,2)
    assert(full.filterNot(_._1.startsWith("X")).toSet == capped.toSet)
  }

  test("basketLift: default cap leaves real testdata unchanged") {
    // r7 verdict item 5's 'top-N unchanged' gate: TPC-H baskets are
    // ≤ 7 lines, so the 4096 default must be a no-op on testdata
    val li = graft.io.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val a = Analytics.basketLift(li, topN = 50)
      .collect().toSeq
    val b = Analytics.basketLift(li, topN = 50, maxBasket = Int.MaxValue)
      .collect().toSeq
    assert(a == b && a.size == 50)
  }

  test("trendSlope: exact closed-form slope; single-week series null") {
    // g: y = 10,20,30,40 over 4 weeks -> slope exactly 10.0/week;
    // h: one week -> no slope (null, not NaN)
    val rows = Seq(
      ("g", d("2024-01-01"), 10.0), ("g", d("2024-01-08"), 20.0),
      ("g", d("2024-01-15"), 30.0), ("g", d("2024-01-22"), 40.0),
      ("h", d("2024-01-01"), 7.0)
    ).toDF("grp_in", "dt", "val")
    val got = Analytics.trendSlope(rows, "grp_in", "dt", "val")
      .as[(String, Long, Option[Double])].collect().toSeq
    assert(got == Seq(("g", 4L, Some(10.0)), ("h", 1L, None)))
    // two rows in the SAME week aggregate before the fit
    val dup = rows.union(Seq(("g", d("2024-01-02"), 5.0))
      .toDF("grp_in", "dt", "val"))
    val g2 = Analytics.trendSlope(dup, "grp_in", "dt", "val")
      .as[(String, Long, Option[Double])].collect().toSeq
    // week1 y becomes 15: points (1,15),(2,20),(3,30),(4,40) ->
    // slope = (4*(15+40+90+160) - 10*105) / 20 = (1220-1050)/20 = 8.5
    assert(g2.find(_._1 == "g").get._3 == Some(8.5))
  }

  test("eventTransitions: per-user sequences, row-normalized counts") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1: a->b->a->c ; user 2: b->a. Cross-user pairs must NOT
    // appear; ties on ts break by event_id (user 1's first two rows).
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 10:00:00"), 2L, "b"),
      (1L, ts("2024-01-01 11:00:00"), 3L, "a"),
      (1L, ts("2024-01-01 12:00:00"), 4L, "c"),
      (2L, ts("2024-01-02 09:00:00"), 5L, "b"),
      (2L, ts("2024-01-02 09:30:00"), 6L, "a")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = Analytics.eventTransitions(events)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("a", "b", 1L, 0.5), ("a", "c", 1L, 0.5),
      ("b", "a", 2L, 1.0)))
  }

  test("funnelPaths: first-after hops, caps, dead stages, strict ties") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      // user 1: full path — view, click +2d, purchase +1d
      (1L, ts("2024-01-01 10:00:00"), 10L, "view"),
      (1L, ts("2024-01-03 10:00:00"), 11L, "click"),
      (1L, ts("2024-01-04 10:00:00"), 12L, "purchase"),
      // user 2: first click is beyond the 3-day cap → stage 1 dead,
      // and the purchase (within 3d of the VIEW) must NOT attach
      (2L, ts("2024-01-01 00:00:00"), 20L, "view"),
      (2L, ts("2024-01-05 00:00:00"), 21L, "click"),
      (2L, ts("2024-01-02 00:00:00"), 22L, "purchase"),
      // user 3: click at the EXACT view instant — strictly-after
      // excludes it; the later click attaches instead, with two
      // same-ts purchases tie-broken to the smaller event_id
      (3L, ts("2024-01-10 08:00:00"), 30L, "view"),
      (3L, ts("2024-01-10 08:00:00"), 31L, "click"),
      (3L, ts("2024-01-10 09:00:00"), 32L, "click"),
      (3L, ts("2024-01-10 10:00:00"), 34L, "purchase"),
      (3L, ts("2024-01-10 10:00:00"), 33L, "purchase"),
      // user 4: purchase BEFORE the click chain starts — stage 2
      // must be the first purchase AFTER the click, which is absent
      (4L, ts("2024-01-20 00:00:00"), 40L, "view"),
      (4L, ts("2024-01-19 00:00:00"), 41L, "purchase"),
      (4L, ts("2024-01-20 01:00:00"), 42L, "click")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = Analytics.funnelPaths(events,
        Seq("view", "click", "purchase"), maxGap = "3 days")
      .select("s0_id", "s1_id", "s2_id", "completed_stages")
      .as[(Long, Option[Long], Option[Long], Long)].collect().toSeq
    assert(got == Seq(
      (10L, Some(11L), Some(12L), 3L),
      (20L, None, None, 1L),
      (30L, Some(32L), Some(33L), 3L),
      (40L, Some(42L), None, 2L)))
    // both hops are union+window passes: no join operator anywhere,
    // so there is no O(matches) term on dense histories
    val plan = Analytics.funnelPaths(events,
        Seq("view", "click", "purchase"), maxGap = "3 days")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
  }

  test("typeCorrelationMatrix: ±1 extremes, zero-fill, zero variance, brute check") {
    import java.sql.Timestamp
    def ev(day: Int, typ: String, k: Int): Seq[(Long, Timestamp, String)] =
      (1 to k).map(i => ((day * 1000 + i).toLong,
        Timestamp.valueOf(f"2024-03-$day%02d 12:00:00"), typ))
    // over days 1..4: a = [1,2,3,4]; b = 2a (r=1); c = [4,3,2,1]
    // (r=-1 vs a); d fires ONLY on day 1 (zero-fill gives [5,0,0,0]);
    // e constant → zero variance → NULL r
    val rows = (1 to 4).flatMap { d =>
      ev(d, "a", d) ++ ev(d, "b", 2 * d) ++ ev(d, "c", 5 - d) ++
        (if (d == 1) ev(d, "d", 5) else Nil) ++ ev(d, "e", 3)
    }
    val got = Analytics.typeCorrelationMatrix(
        rows.toDF("event_id", "ts", "event_type"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    // ±1 up to the two sqrt roundings (√20·√80 is not exactly 40)
    assert(got(("a", "b"))._1 == 4L)
    assert(math.abs(got(("a", "b"))._2.get - 1.0) < 1e-12)
    assert(math.abs(got(("a", "c"))._2.get + 1.0) < 1e-12)
    assert(got(("a", "e"))._2 == None)     // constant series
    // zero-fill: d = [5,0,0,0] vs a = [1,2,3,4] — brute-force Pearson
    def pearson(x: Seq[Long], y: Seq[Long]): Double = {
      val n = x.size.toDouble
      val (sx, sy) = (x.sum.toDouble, y.sum.toDouble)
      val sxy = x.zip(y).map { case (p, q) => p.toDouble * q }.sum
      val sxx = x.map(p => p.toDouble * p).sum
      val syy = y.map(p => p.toDouble * p).sum
      (n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    }
    val expected = pearson(Seq(1L, 2L, 3L, 4L), Seq(5L, 0L, 0L, 0L))
    assert(math.abs(got(("a", "d"))._2.get - expected) < 1e-12)
    assert(got.keys.forall { case (x, y) => x < y })  // upper triangle
  }
}
