package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Reference union-find, the independent model the distributed
    * algorithm must agree with. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap

  /** driverFinishEdges = 0 pins the PURE star-contraction path (the
    * adaptive driver tail never triggers). */
  private def runDistributed(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(edges.toDF("src", "dst"),
        driverFinishEdges = 0L)
      .as[(Long, Long)].collect().toMap

  test("chains, triangle, isolated pair, self-loop") {
    // chain 1-2-3-4-5 (diameter > 1 round), triangle 10-11-12,
    // pair 20-21, self-loop 30 (dropped), reversed-direction edge
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (12L, 10L), (21L, 20L), (30L, 30L))
    val got = run(edges)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("long path converges within O(log n) rounds (not diameter)") {
    // a 200-node path has diameter 199: linear label propagation
    // would need ~199 rounds; star contraction must finish well
    // inside maxIter=25 = default. runDistributed so the adaptive
    // driver tail can't answer for the contraction.
    val edges = (1L until 200L).map(i => (i, i + 1))
    val got = runDistributed(edges)
    assert(got == (1L to 200L).map(_ -> 1L).toMap)
  }

  test("adaptive driver tail == pure star contraction on every shape") {
    val shapes = Seq(
      Seq((2L, 1L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L),
        (11L, 12L), (12L, 10L), (21L, 20L), (30L, 30L)),
      (1L until 64L).map(i => (i, i + 1)),          // path
      (1L until 40L).map(i => (1L, i + 1)),         // star
      Seq.empty[(Long, Long)])                      // empty
    shapes.zipWithIndex.foreach { case (edges, i) =>
      assert(run(edges) == runDistributed(edges), s"shape $i diverged")
    }
  }

  test("agrees with union-find on pseudo-random graphs") {
    // deterministic LCG so the case is reproducible
    var seed = 0x5DEECE66DL
    def next(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (Math.floorMod(seed >>> 16, bound.toLong)).toInt
    }
    for (trial <- 1 to 3) {
      val n = 300
      val edges = (1 to 250).map(_ => (next(n).toLong, next(n).toLong))
        .filter { case (a, b) => a != b }
      assert(run(edges) == unionFind(edges), s"trial $trial mismatch")
    }
  }

  test("componentDedup over real MinHash candidates collapses dup CHAINS") {
    // a near-dup chain A~B~C where A and C differ enough to share no
    // band: pair-greedy (drop anyone with a smaller partner) would
    // keep A and might keep C if the (A,C) pair never surfaces;
    // component dedup keeps exactly one doc per transitive cluster.
    val base = "the quick brown fox jumps over the lazy dog again and " +
      "again until the evening comes down on the quiet field"
    val b = base.replace("quick", "swift")
    val c = b.replace("evening", "morning")
    val docs = Seq((1L, base), (2L, b), (3L, c),
      (10L, "completely unrelated text about spark physical plans " +
        "and shuffle exchanges in a distributed engine")
    ).toDF("doc_id", "text")
    val cands = Dedup.minHashCandidates(docs)
    val pairs = cands.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the chain links must exist; the far pair (1,3) may or may not
    assert(pairs.contains((1L, 2L)) && pairs.contains((2L, 3L)),
      s"expected chain candidates, got $pairs")
    val kept = Components.componentDedup(
      docs.select("doc_id"), cands, srcCol = "id_a", dstCol = "id_b")
      .as[Long].collect().toSeq
    assert(kept == Seq(1L, 10L),
      s"one representative per cluster expected, got $kept")
  }

  test("componentDedup keeps one representative per cluster") {
    val ids = (1L to 10L).toDF("doc_id")
    // clusters {1,2,3} (chain), {5,6}; 4,7..10 unpaired
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("src", "dst")
    val kept = Components.componentDedup(ids, pairs)
      .as[Long].collect().toSeq
    assert(kept == Seq(1L, 4L, 5L, 7L, 8L, 9L, 10L))
    // pair-greedy (drop anything with a smaller partner) keeps the
    // same set here, but on a chain a-b-c it keeps c; components do
    // not: transitive-dup c must go
    val chain = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val keptChain = Components.componentDedup(
      Seq(1L, 2L, 3L).toDF("doc_id"), chain).as[Long].collect().toSeq
    assert(keptChain == Seq(1L))
  }

  test("dedupAudit: cluster-size histogram plus singleton bucket") {
    val ids = (1L to 8L).toDF("doc_id")
    // cluster {1,2,3} (chain), cluster {5,6}; 4,7,8 singletons
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("src", "dst")
    val got = Components.dedupAudit(ids, pairs)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 3L, 3L, 0L), (2L, 1L, 2L, 1L),
      (3L, 1L, 3L, 2L)))
    // no pairs at all: every doc is a singleton
    val none = Components.dedupAudit(ids,
      Seq.empty[(Long, Long)].toDF("src", "dst"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(none == Seq((1L, 8L, 8L, 0L)))
  }

  test("componentStats: density and triangles per cluster shape") {
    // K4 on 1-4 (complete: 6 edges, 4 triangles, density 1),
    // path 10-11-12 (2 edges, 0 triangles, density 2/3),
    // triangle-plus-tail 20-21-22-20, 22-23 (4 edges, 1 triangle)
    val pairs = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (10L, 11L), (11L, 12L),
      (20L, 21L), (21L, 22L), (22L, 20L), (22L, 23L),
      (2L, 1L) // reversed duplicate must not double-count
    ).toDF("src", "dst")
    val got = Components.componentStats(pairs)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 4L, 6L, 4L, 1.0),
      (10L, 3L, 2L, 0L, 2.0 / 3.0),
      (20L, 4L, 4L, 1L, 4.0 * 2.0 / 12.0)))
  }

  test("dedupManifest maps every doc to its canonical; agrees with dedup") {
    val ids = (1L to 8L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("src", "dst")
    val got = Components.dedupManifest(ids, pairs)
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, false), (2L, 1L, true), (3L, 1L, true),
      (4L, 4L, false), (5L, 5L, false), (6L, 5L, true),
      (7L, 7L, false), (8L, 8L, false)))
    // survivors of the manifest == componentDedup's survivors
    val survivors = got.filter(!_._3).map(_._1)
    val dedup = Components.componentDedup(ids, pairs)
      .as[Long].collect().toSeq
    assert(survivors == dedup)
  }

  test("incrementalComponents ≡ full recompute on random splits of random graphs") {
    def lbl2(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long)].collect().sorted.toSeq
    for (seed <- 1 to 3) {
      // pseudo-random sparse graph over 60 nodes (chains + cross links)
      val edges = (1 to 80).map { i =>
        val a = ((i * 7919 + seed * 131) % 60).toLong
        val b = ((i * 104729 + seed * 37) % 60).toLong
        (a, b)
      }.filter { case (a, b) => a != b }
      val cut = 20 + (seed * 17) % 40
      val (day1, day2) = edges.splitAt(cut)
      val stored = Components.connectedComponents(day1.toDF("src", "dst"))
      val inc = lbl2(Components.incrementalComponents(
        stored, day2.toDF("src", "dst")))
      val full = lbl2(Components.connectedComponents(edges.toDF("src", "dst")))
      assert(inc == full, s"seed=$seed cut=$cut")
    }
  }

  test("incrementalComponents ≡ full recompute: merges, new nodes, singletons") {
    def lbl(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long)].collect().sorted.toSeq
    // day 1: {1,2,3}, {10,11}, singleton 50 (carried as a label row)
    val day1 = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("src", "dst")
    val stored = Components.connectedComponents(day1)
      .unionByName(Seq((50L, 50L)).toDF("id", "component"))
    // day 2: bridge the two components, attach a new node to 3,
    // a brand-new component {70,71}; 50 stays untouched
    val day2 = Seq((3L, 10L), (3L, 4L), (70L, 71L)).toDF("src", "dst")
    val inc = lbl(Components.incrementalComponents(stored, day2))
    val full = lbl(Components.connectedComponents(day1.unionByName(day2))
      .unionByName(Seq((50L, 50L)).toDF("id", "component")))
    assert(inc == full)
    assert(inc.contains((11L, 1L)))   // merged across the bridge
    assert(inc.contains((4L, 1L)))    // new node joins the merge
    assert(inc.contains((70L, 70L)) && inc.contains((50L, 50L)))
    // a second day of edges folds into the INCREMENTAL labels the
    // same way (re-increment ≡ recompute — the associativity that
    // makes daily maintenance safe)
    val day3 = Seq((50L, 71L)).toDF("src", "dst")
    val inc2 = lbl(Components.incrementalComponents(
      Components.incrementalComponents(stored, day2), day3))
    val full2 = lbl(Components.connectedComponents(
      day1.unionByName(day2).unionByName(day3)))
    assert(inc2 == full2)
    assert(inc2.contains((71L, 50L)))
  }
}
