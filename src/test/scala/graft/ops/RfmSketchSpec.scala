package graft.ops

import java.sql.Date

import graft.SparkSpec

/** r7 verdict item 4: [[Analytics.rfmSketch]] must agree with the
  * exact ntile tiers within one histogram-bucket width. The spec
  * proves the claim's precise form on real orders: for every
  * customer whose tier differs between the two paths, the metric
  * value lies within one bucket width of the EXACT ntile boundary
  * (the extreme metric values of the two adjacent exact tiers), and
  * no tier ever differs by more than one. */
class RfmSketchSpec extends SparkSpec {
  import spark.implicits._

  private val orders =
    graft.io.Tables.orders(spark, "/root/testdata/sf0.001")

  test("rfmSketch tiers agree with ntile within one bucket width") {
    val n = 4
    val buckets = 256
    val exact = Analytics.rfm(orders, n = n)
      .select("custkey", "r_days", "n_orders", "monetary",
        "r_tier", "f_tier", "m_tier")
      .as[(Long, Long, Long, Double, Long, Long, Long)]
      .collect().toSeq
    val sk = Analytics.rfmSketch(orders, n = n, buckets = buckets)
      .select("custkey", "r_tier", "f_tier", "m_tier")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(exact.nonEmpty && exact.size == sk.size)

    // metric → (value extractor, exact-tier extractor, sketch-tier
    // extractor, ascending?)
    case class Axis(value: ((Long, Long, Long, Double, Long, Long, Long)) => Double,
                    tier: ((Long, Long, Long, Double, Long, Long, Long)) => Long,
                    skTier: ((Long, Long, Long)) => Long, asc: Boolean)
    val axes = Seq(
      "recency" -> Axis(_._2.toDouble, _._5, _._1, asc = true),
      "frequency" -> Axis(_._3.toDouble, _._6, _._2, asc = false),
      "monetary" -> Axis(_._4, _._7, _._3, asc = false))

    axes.foreach { case (name, ax) =>
      val vals = exact.map(ax.value)
      val w = (vals.max - vals.min) / buckets
      // exact boundary band between adjacent ntile tiers t and t+1:
      // [min over the better-value side, max over the worse side] —
      // any value within w of that band may legitimately flip
      val byTier = exact.groupBy(ax.tier).view
        .mapValues(_.map(ax.value)).toMap
      var flipped = 0
      exact.foreach { row =>
        val et = ax.tier(row)
        val st = ax.skTier(sk(row._1))
        if (st != et) {
          flipped += 1
          assert(math.abs(st - et) == 1,
            s"$name: tier skipped >1 (exact=$et sketch=$st)")
          // the boundary the customer sits on: between min(et,st) and
          // max(et,st); its exact location is pinched between the two
          // adjacent tiers' extreme values
          val lowTier = math.min(et, st)
          val hiTier = math.max(et, st)
          // ascending axis: tier t holds SMALLER values than t+1;
          // descending: tier t holds LARGER values
          val (aVals, bVals) = (byTier(lowTier), byTier(hiTier))
          val boundaryLo =
            if (ax.asc) aVals.max min bVals.min
            else bVals.max min aVals.min
          val boundaryHi =
            if (ax.asc) aVals.max max bVals.min
            else bVals.max max aVals.min
          val v = ax.value(row)
          assert(v >= boundaryLo - w && v <= boundaryHi + w,
            s"$name: flipped customer ${row._1} value $v outside " +
              s"boundary band [$boundaryLo, $boundaryHi] ± $w")
        }
      }
      info(s"$name: $flipped/${exact.size} boundary flips (w=$w)")
    }
  }

  test("rfmSketch plans NO single-partition exchange (the point)") {
    // the exact path's three ntile windows each force Exchange
    // SinglePartition; the sketch path must never — that is the
    // whole 10⁹-customer argument, asserted structurally
    val skPlan = Analytics.rfmSketch(orders)
      .queryExecution.executedPlan.toString
    assert(!skPlan.contains("SinglePartition"),
      s"sketch path contains a global sort:\n$skPlan")
    val exPlan = Analytics.rfm(orders)
      .queryExecution.executedPlan.toString
    assert(exPlan.contains("SinglePartition")) // the contrast is real
  }

  test("rfmSketch output schema and segment match the exact path's") {
    val a = Analytics.rfm(orders).schema.map(f => f.name -> f.dataType)
    val b = Analytics.rfmSketch(orders).schema
      .map(f => f.name -> f.dataType)
    assert(a == b)
    val row = Analytics.rfmSketch(orders).limit(1)
      .select("r_tier", "f_tier", "m_tier", "segment")
      .as[(Long, Long, Long, String)].head()
    assert(row._4 == s"${row._1}${row._2}${row._3}")
  }

  test("rfmSketch: tied metric values always share a tier") {
    // 8 customers, all with identical frequency — a value cut must
    // put them in ONE f-tier (ntile would split them 2/2/2/2)
    val rows = (1 to 8).map { i =>
      (i.toLong, d("2024-01-0" + ((i % 8) + 1)), 100.0 * i)
    }.toDF("o_custkey", "o_orderdate", "o_totalprice")
    val got = Analytics.rfmSketch(rows, n = 4)
      .select("f_tier").distinct().as[Long].collect().toSeq
    assert(got == Seq(1L)) // constant metric → no signal → tier 1
  }

  private def d(s: String) = Date.valueOf(s)
}
