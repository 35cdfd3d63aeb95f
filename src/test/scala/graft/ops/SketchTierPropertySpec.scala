package graft.ops

import java.sql.Date

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-based invariants for the r8 sketch-tier and basket-cap
  * operators over randomized inputs (fixed seeds, the PropertySpec
  * discipline — no scalatestplus bridge in the offline cache). */
class SketchTierPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val orderGen = Gen.listOfN(300, Gen.zip(
    Gen.chooseNum(1L, 40L),          // custkey (collisions intended)
    Gen.chooseNum(0, 600),           // order date offset (days)
    Gen.chooseNum(1.0, 90000.0)))    // price

  private def ordersDf(seed: Long) =
    sample(orderGen, seed).zipWithIndex.map { case ((c, off, p), i) =>
      (i.toLong, c, Date.valueOf(java.time.LocalDate
        .of(2023, 1, 1).plusDays(off)), p)
    }.toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")

  test("rfmSketch: tiers in [1,n], monotone in each metric, total rows") {
    (1L to 3L).foreach { seed =>
      val orders = ordersDf(seed)
      Seq(2, 4, 7).foreach { n =>
        val rows = Analytics.rfmSketch(orders, n = n, buckets = 64)
          .select("custkey", "r_days", "n_orders", "monetary",
            "r_tier", "f_tier", "m_tier")
          .as[(Long, Long, Long, Double, Long, Long, Long)]
          .collect().toSeq
        assert(rows.size ==
          orders.select("o_custkey").distinct().count())
        rows.foreach { r =>
          Seq(r._5, r._6, r._7).foreach(t =>
            assert(t >= 1 && t <= n, s"tier $t outside [1,$n]"))
        }
        // monotonicity: a strictly better metric can never get a
        // strictly worse (higher) tier — value cuts are monotone by
        // construction, this guards the direction conventions
        def mono(value: Long => Double, tier: Long => Long,
                 asc: Boolean): Unit = {
          val m = rows.map(r => r._1 -> r).toMap
          for (a <- m.keys; b <- m.keys if a != b) {
            val (va, vb) = (value(a), value(b))
            if (va < vb) {
              val (ta, tb) = (tier(a), tier(b))
              if (asc) assert(ta <= tb, s"asc monotonicity: $va->$ta vs $vb->$tb")
              else assert(ta >= tb, s"desc monotonicity: $va->$ta vs $vb->$tb")
            }
          }
        }
        val byId = rows.map(r => r._1 -> r).toMap
        mono(id => byId(id)._2.toDouble, id => byId(id)._5, asc = true)
        mono(id => byId(id)._3.toDouble, id => byId(id)._6, asc = false)
        mono(id => byId(id)._4, id => byId(id)._7, asc = false)
      }
    }
  }

  test("rfmSketch: every tier is hit when metrics are well-spread") {
    // 64 customers with distinct metrics → each quartile must be
    // non-empty (bounds error < spacing at buckets >> n)
    val orders = (1L to 64L).map { c =>
      (c, c, Date.valueOf(java.time.LocalDate.of(2023, 1, 1)
        .plusDays(c.toInt * 7)), 1000.0 * c)
    }.toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val tiers = Analytics.rfmSketch(orders, n = 4, buckets = 4096)
      .select("m_tier").as[Long].collect().toSeq
    assert(tiers.distinct.sorted == Seq(1L, 2L, 3L, 4L))
    // quartiles of 64 well-spread values: 16 ± 1 per tier
    tiers.groupBy(identity).values.foreach(g =>
      assert(math.abs(g.size - 16) <= 1, s"tier size ${g.size}"))
  }

  test("basketLift: capping never invents pairs and never raises counts") {
    // NOT a row-subset property: a pair living in both a small and an
    // over-cap basket keeps its row but with a LOWER pair count (the
    // cap removes the big basket's contribution only) — so the
    // invariants are key-subset and per-pair count dominance, plus
    // untouched denominators
    (5L to 7L).foreach { seed =>
      val li = sample(Gen.listOfN(400, Gen.zip(
        Gen.chooseNum(1L, 30L), Gen.chooseNum(1L, 25L))), seed)
        .toDF("l_orderkey", "l_partkey")
      def rows(cap: Int) =
        Analytics.basketLift(li, topN = 1000, maxBasket = cap)
          .select("item_a", "item_b", "pair_orders", "orders_a",
            "orders_b")
          .as[(Long, Long, Long, Long, Long)].collect()
          .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
      val all = rows(Int.MaxValue)
      Seq(2, 3, 8).foreach { cap =>
        val capped = rows(cap)
        assert(capped.keySet.subsetOf(all.keySet),
          s"cap=$cap invented pairs")
        capped.foreach { case (k, (pc, oa, ob)) =>
          val (pu, oau, obu) = all(k)
          assert(pc <= pu, s"cap=$cap raised $k's pair count $pc > $pu")
          // denominators count every order regardless of the cap
          assert(oa == oau && ob == obu,
            s"cap=$cap changed $k's item-order denominators")
        }
      }
    }
  }

  test("perplexity sketch: kept set is a subset of each bucket, " +
    "verdict covers every scored doc") {
    val docs = (1L to 120L).map { i =>
      (i, Seq.fill(6)(s"w${i % 9} w${(i * 7) % 11}").mkString(" "))
    }.toDF("doc_id", "text")
    val exact = TextOps.perplexityBucketSample(docs)
      .select("doc_id").as[Long].collect().toSet
    val sk = TextOps.perplexityBucketSampleSketch(docs)
      .select("doc_id").as[Long].collect().toSet
    assert(sk == exact) // same scored universe, bucketing aside
  }
}
