package graft.ops

import graft.SparkSpec

class CentralitySpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: star center outranks leaves; hand-computed round 1") {
    // star: 1-2, 1-3, 1-4 (center 1, deg 3; leaves deg 1)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("src", "dst")
    val pr1 = Components.pageRank(edges, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // round 1: center gets 3 shares of 1e9/1 → (3e9*85)/100 + 0.15e9
    assert(pr1(1L) == 3000000000L * 85 / 100 + 150000000L)
    // each leaf gets 1 share of 1e9 div 3 = 333333333
    assert(pr1(2L) == 333333333L * 85 / 100 + 150000000L)
    assert(pr1(2L) == pr1(3L) && pr1(3L) == pr1(4L))
    val pr3 = Components.pageRank(edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr3(1L) > pr3(2L), "center must stay most central")
    // deterministic
    val again = Components.pageRank(edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == pr3)
  }

  test("pageRank: edge direction/duplication does not change the graph") {
    val a = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val b = Seq((2L, 1L), (1L, 2L), (3L, 2L)).toDF("src", "dst")
    val pa = Components.pageRank(a).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pb = Components.pageRank(b).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pa == pb)
  }

  test("centralitySurvivors: one survivor per cluster, the central one") {
    // two clusters: star {1,2,3,4} centered at 1; pair {10, 11}
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (10L, 11L))
      .toDF("src", "dst")
    val out = Components.centralitySurvivors(edges).collect()
    assert(out.length == 6)
    val byComp = out.groupBy(_.getAs[Long]("component"))
    assert(byComp.keySet == Set(1L, 10L))
    byComp.values.foreach { rows =>
      assert(rows.count(_.getAs[Boolean]("survivor")) == 1)
    }
    // star survivor is the center
    val starSurvivor = byComp(1L).filter(_.getAs[Boolean]("survivor"))
    assert(starSurvivor.head.getAs[Long]("id") == 1L)
    // equal-degree pair: tie broken to min id
    val pairSurvivor = byComp(10L).filter(_.getAs[Boolean]("survivor"))
    assert(pairSurvivor.head.getAs[Long]("id") == 10L)
  }
}
