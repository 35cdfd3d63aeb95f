package graft.etl

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-based invariants (SURVEY §5.3). Uses raw ScalaCheck Gen
  * with fixed seeds (no scalatestplus bridge in the offline cache). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("money() output has at most 2 decimals and is within 0.01") {
    val xs = sample(Gen.listOfN(200, Gen.chooseNum(0.0, 1e6)), 1L)
    val out = xs.toDF("x").select(Curate.money($"x").as("m"), $"x")
      .collect()
    out.foreach { r =>
      val m = r.getDouble(0); val x = r.getDouble(1)
      assert(math.abs(m * 100 - math.rint(m * 100)) < 1e-6,
        s"$m not a 2dp value")
      assert(math.abs(m - x) <= 0.005 + 1e-9, s"money($x) = $m drifted")
    }
  }

  test("dedup is idempotent and bounded by input size") {
    val data = sample(Gen.listOfN(100,
      Gen.zip(Gen.chooseNum(1, 10), Gen.oneOf("a", "b"))), 2L)
    val df = data.toDF("k", "v")
    val once = Curate.dedup(df)
    assert(once.count() == Curate.dedup(once).count())
    assert(once.count() <= df.count())
  }

  test("binned range join ≡ naive for random points/intervals/bin widths") {
    import org.apache.spark.sql.functions.col
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z").getEpochSecond
    val pointGen = Gen.listOfN(120, Gen.chooseNum(0L, 40L * 86400))
    val ivGen = Gen.listOfN(15, Gen.zip(
      Gen.chooseNum(0L, 35L * 86400),        // start offset
      Gen.chooseNum(1L, 10L * 86400)))       // length (seconds)
    (10L to 12L).foreach { seed =>
      val points = sample(pointGen, seed).zipWithIndex.map { case (off, i) =>
        (i.toLong, new java.sql.Timestamp((base + off) * 1000))
      }.toDF("pid", "t")
      val intervals = sample(ivGen, seed + 100).zipWithIndex.map {
        case ((off, len), i) =>
          (i.toLong, new java.sql.Timestamp((base + off) * 1000),
            new java.sql.Timestamp((base + off + len) * 1000))
      }.toDF("iid", "start_t", "end_t")
      def key(df: org.apache.spark.sql.DataFrame) =
        df.select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
      val naive = key(graft.ops.RangeJoin.naive(
        points, intervals, "t", "start_t", "end_t"))
      Seq(3600L, 86400L, 7L * 86400).foreach { bin =>
        assert(key(graft.ops.RangeJoin.binned(
          points, intervals, "t", "start_t", "end_t", bin)) == naive,
          s"bin=$bin seed=$seed diverged")
      }
      assert(key(graft.ops.RangeJoin.broadcastIndexed(
        points, intervals, "t", "start_t", "end_t")) == naive,
        s"broadcastIndexed seed=$seed diverged")
    }
  }

  test("repeat-rate is within [0, 100] for random booking sets") {
    val gen = Gen.listOfN(60, Gen.zip(
      Gen.chooseNum(1L, 5L),                  // user
      Gen.chooseNum(0, 365)))                 // day offset
    (1L to 3L).foreach { seed =>
      val rows = sample(gen, seed)
      val df = rows.zipWithIndex.map { case ((u, d), i) =>
        (i.toLong, u, 100L, java.sql.Date.valueOf(
          java.time.LocalDate.of(2024, 1, 1).plusDays(d)), "confirmed")
      }.toDF("booking_id", "user_id", "apartment_id", "booking_date",
        "booking_status")
        .withColumn("checkin_date", $"booking_date")
        .withColumn("checkout_date", $"booking_date")
      Present.monthlyRepeatRate(df).collect().foreach { r =>
        val pct = r.getDouble(3)
        assert(pct >= 0.0 && pct <= 100.0)
        assert(r.getLong(1) <= r.getLong(2))
      }
    }
  }

  test("stratifiedSplit matches the clamped declared-order model " +
       "on random stratum sizes") {
    val fracs = Seq("t1" -> 0.22, "t2" -> 0.17, "t3" -> 0.31)
    for (seed <- 11L to 13L) {
      val sizes = sample(Gen.listOfN(6, Gen.chooseNum(1, 30)), seed)
      val docs = sizes.zipWithIndex.flatMap { case (n, si) =>
        (1 to n).map(i => (si * 1000L + i, s"s$si"))
      }.toDF("doc_id", "lang")
      val got = graft.ops.Split.stratifiedSplit(docs, fracs, Seq("lang"))
        .as[(Long, String, String, Long)].collect().toSeq
      assert(got.size == sizes.sum) // every row assigned exactly once
      sizes.zipWithIndex.foreach { case (n, si) =>
        val counts = got.filter(_._2 == s"s$si").groupBy(_._3)
          .view.mapValues(_.size.toLong).toMap
        val targets = fracs.map { case (_, f) =>
          math.floor(f * n + 0.5).toLong }
        val cums = targets.scanLeft(0L)(_ + _).tail
          .map(c => math.min(c, n.toLong))
        val perSplit = fracs.map(_._1).zip(
          cums.zip(0L +: cums.init).map { case (c, p) => c - p })
        perSplit.foreach { case (name, want) =>
          assert(counts.getOrElse(name, 0L) == want,
            s"split $name of s$si (n=$n, seed=$seed)") }
        assert(counts.getOrElse("train", 0L) == n - cums.last,
          s"train of s$si (n=$n, seed=$seed)")
      }
    }
  }

  test("epochMixture emits exactly the clamped target per source, " +
       "epochs contiguous, appearances within 1") {
    import graft.ops.TextOps
    val weights = Seq("s0" -> 0.5, "s1" -> 0.25, "s2" -> 0.05)
    for (seed <- 21L to 23L) {
      val sizes = sample(Gen.listOfN(4, Gen.chooseNum(1, 25)), seed)
      val docs = sizes.zipWithIndex.flatMap { case (n, si) =>
        (1 to n).map(i => (si * 1000L + i, s"s$si"))
      }.toDF("doc_id", "source")
      val got = TextOps.epochMixture(docs, weights,
          budget = 60L, maxEpochs = 3)
        .as[(String, Long, Long, Long)].collect().toSeq
      assert(!got.exists(_._1 == "s3")) // unlisted source excluded
      weights.foreach { case (s, w) =>
        val n = sizes(s.drop(1).toInt)
        val target = math.min(math.floor(60.0 * w + 0.5).toLong, 3L * n)
        val rows = got.filter(_._1 == s)
        assert(rows.size.toLong == target, s"$s total (n=$n, seed=$seed)")
        val perDoc = rows.groupBy(_._2)
          .view.mapValues(_.map(_._3).sorted).toMap
        // each doc's epochs are contiguous 1..m; appearance counts
        // across docs differ by at most 1 (full epochs + one top-up)
        perDoc.values.foreach(es =>
          assert(es.toList == (1L to es.size.toLong).toList))
        if (perDoc.nonEmpty) {
          val m = perDoc.values.map(_.size).toSet
          assert(m.max - m.min <= 1, s"$s appearances (seed=$seed)")
        }
      }
    }
  }
}
