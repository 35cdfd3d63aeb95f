package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the principled
  * tail of every near-dup dedup: candidate pairs (from MinHash /
  * SimHash / embedding LSH buckets) form a graph, and "keep one doc
  * per duplicate CLUSTER" means one representative per connected
  * component, not per pairwise match (pair-greedy keeps every local
  * minimum: for a chain a–b–c it keeps both a and c even though all
  * three are transitive dups).
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", ACM SoCC'14) —
  * each half-round is one groupBy-min plus a re-keyed edge emit (two
  * shuffles), and the edge set contracts onto stars rooted at the
  * component minimum in O(log n) rounds. No driver-side graph state,
  * no linear-diameter label chasing — this is the formulation that
  * survives 100 TB edge lists. Deterministic: pure min/groupBy
  * arithmetic, so the result is reproducible in SQL (the q58 oracle
  * is a DuckDB recursive CTE over the same edges).
  *
  * Reference scope note: the reference engine has no graph operator;
  * this extends the training-data surface (SURVEY.md north star).
  */
object Components {

  /** (id, component) for every edge endpoint, where component is the
    * minimum id in the node's connected component. Self-loops are
    * dropped; edges may appear in either or both directions.
    *
    * Adaptive tail (`driverFinishEdges`): once the (contracted) edge
    * set fits the byte-bounded threshold, the remaining rounds finish
    * as one driver-side union-find instead of O(log n) more Spark
    * rounds — each star round costs ~4 shuffles + a checkpoint of
    * fixed overhead, which dominates wall-clock on small graphs (the
    * common case: near-dup graphs are tiny relative to the corpus,
    * and Kiveris et al.'s own tail rounds contract almost nothing).
    * At 100 TB the first rounds still do the heavy lifting
    * distributed; the driver tail only ever sees ≤ threshold edges
    * (default 1M pairs = 16 MB). Result is IDENTICAL by
    * construction — min-id union-find IS the component labeling —
    * and spec-pinned against the pure-distributed path. */
  def connectedComponents(edges: DataFrame,
                          srcCol: String = "src", dstCol: String = "dst",
                          maxIter: Int = 25,
                          driverFinishEdges: Long = 1L << 20): DataFrame = {
    require(maxIter > 0, "maxIter must be positive")
    val spark = edges.sparkSession

    // canonical undirected edge set (small, large) — dedup'd so the
    // contraction never re-inflates multiplicity
    val canon = edges.select(
        least(col(srcCol), col(dstCol)).cast("long").as("src"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()

    // (A limit(budget+1).collect() fast path was tried here and
    // REVERTED: a global limit funnels every edge through one
    // CollectLimit partition — slower than the checkpoint + cheap
    // cached-block reads below. Measured q190 4.6 → 5.3 s.)
    var e = canon
      .localCheckpoint() // iterative joins: truncate lineage per round
                         // (cluster deployments: spark.checkpoint.dir)

    // large-star: for u's neighborhood Γ(u) (edges in both
    // directions), connect every v ∈ Γ(u) with v > u to
    // m = min(Γ(u) ∪ {u}); small-star: connect every v ∈ Γ(u) with
    // v ≤ u, plus u itself, to m (skipping m's self-loop).
    def star(large: Boolean)(edges0: DataFrame): DataFrame = {
      // symmetrize in ONE scan: union(e, e.reversed) plans the child
      // subtree twice — and in the small-star half that child is the
      // whole un-materialized large-star, so its window/shuffle work
      // would run 2-4× per round (explode is narrow: one pass)
      val sym = edges0.select(explode(array(
          struct(col("src"), col("dst")),
          struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
      val withM = sym.withColumn("m",
        least(col("src"), min(col("dst")).over(
          org.apache.spark.sql.expressions.Window.partitionBy("src"))))
      val out =
        if (large) withM.filter(col("dst") > col("src"))
          .select(col("dst").as("a"), col("m").as("b"))
        else withM.select(explode(array_compact(array(
            when(col("dst") <= col("src"),
              struct(col("dst").as("a"), col("m").as("b"))),
            struct(col("src").as("a"), col("m").as("b"))))).as("e"))
          .select(col("e.a").as("a"), col("e.b").as("b"))
      // NO distinct here: duplicate edges don't change neighborhood
      // minima, and growth within one round is bounded (each half-
      // round emits ≤ |sym| + |nodes| rows) — deduping once per full
      // round (in the iteration loop) halves the shuffles per round
      out.filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("src"),
          greatest(col("a"), col("b")).as("dst"))
    }

    // convergence check: deterministic edge-set signature (count +
    // bit_xor of pair hashes) — one cheap aggregate per round; the
    // fixpoint is stable so a stop is never premature (collision
    // probability 2^-64)
    def signature(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), bit_xor(xxhash64(col("src"), col("dst"))))
        .head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    var sig = signature(e)
    if (sig._1 <= driverFinishEdges)
      return driverUnionFind(spark, collectEdges(e))
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged && sig._1 > driverFinishEdges) {
      val next = star(large = false)(star(large = true)(e))
        .distinct().localCheckpoint()
      val nextSig = signature(next)
      converged = nextSig == sig
      e = next; sig = nextSig; iter += 1
    }
    if (!converged && sig._1 <= driverFinishEdges)
      return driverUnionFind(spark, collectEdges(e))
    // a non-fixpoint edge set is NOT a star set — extracting labels
    // from it would silently mislabel components (and componentDedup
    // would keep/drop the wrong docs), so an exhausted budget is an
    // error, never a warning. Rounds grow O(log n): the default 25
    // covers any realistic edge list; raise maxIter explicitly if a
    // pathological input ever needs more.
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not reach the star fixpoint in " +
        s"$maxIter rounds (${sig._1} edges remain) — raise maxIter")
    println(s"[components] converged after $iter round(s), " +
      s"${sig._1} star edges")
    // at the fixpoint every edge is (root, member): component(member)
    // = root, component(root) = root. min-agg guards the (impossible
    // at fixpoint, cheap anyway) case of residual multi-edges.
    val members = e.groupBy(col("dst").as("id")).agg(min("src").as("component"))
    val roots = e.select(col("src").as("id")).distinct()
      .join(members, Seq("id"), "left_anti")
      .select(col("id"), col("id").as("component"))
    members.unionByName(roots)
  }

  private def collectEdges(e: DataFrame): Array[(Long, Long)] = {
    import e.sparkSession.implicits._
    e.select(col("src"), col("dst")).as[(Long, Long)].collect()
  }

  /** The adaptive tail of [[connectedComponents]]: min-id union-find
    * (path-halving, min-root union) over a collected edge set. Only
    * reached when the edge set is ≤ `driverFinishEdges` — bounded
    * memory by contract. */
  private def driverUnionFind(spark: org.apache.spark.sql.SparkSession,
                              pairs: Array[(Long, Long)]): DataFrame = {
    import spark.implicits._
    val parent = new java.util.HashMap[Long, Long]()
    def find(x0: Long): Long = {
      var x = x0
      var p = parent.getOrDefault(x, x)
      while (p != x) { // path halving
        val gp = parent.getOrDefault(p, p)
        parent.put(x, gp); x = gp; p = parent.getOrDefault(x, x)
      }
      x
    }
    pairs.foreach { case (a, b) =>
      val ra = find(a); val rb = find(b)
      if (ra != rb) { // min root wins → labels are component minima
        if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb)
      }
    }
    val nodes = new java.util.HashSet[Long]()
    pairs.foreach { case (a, b) => nodes.add(a); nodes.add(b) }
    val out = new scala.collection.mutable.ArrayBuffer[(Long, Long)](nodes.size)
    nodes.forEach(n => out += ((n, find(n))))
    println(s"[components] driver union-find over ${pairs.length} " +
      s"edges, ${nodes.size} nodes")
    out.toSeq.toDF("id", "component")
  }

  /** Incremental component maintenance (r8-cont): fold NEW edges
    * into a STORED (id, component) labeling without replaying old
    * edges — the daily shape of a near-dup graph, where each ingest
    * batch adds edges but the accumulated edge list is 100 TB-scale
    * history nobody wants to rescan. The stored labeling IS a
    * lossless contraction of everything seen so far (a depth-1
    * star forest with the same node partition), so running
    * [[connectedComponents]] over label-edges ∪ new-edges yields
    * EXACTLY the full-recompute labels: the union graph has the same
    * connected node sets as old ∪ new, and min-id over the same node
    * set is the same label. New edges can merge stored components
    * (min of the mins wins), attach fresh nodes, or form new
    * components; stored singletons untouched by any new edge pass
    * through unchanged (they have no label-edge, so they are
    * re-attached by anti-join).
    *
    * Cost: the contraction input is |nodes seen| + |new edges| rows
    * — already depth-1, so the star rounds converge in O(log) of the
    * NEW merge chains only, and the adaptive driver tail usually
    * finishes it in one round. The q188 Gold-refresh argument, for
    * graphs. */
  def incrementalComponents(stored: DataFrame, newEdges: DataFrame,
                            srcCol: String = "src",
                            dstCol: String = "dst"): DataFrame = {
    val labelEdges = stored
      .filter(col("id") =!= col("component"))
      .select(col("id").cast("long").as("src"),
        col("component").cast("long").as("dst"))
    val merged = connectedComponents(
      labelEdges.unionByName(newEdges.select(
        col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))))
    // stored singletons (and isolated roots) touched by no new edge
    // never reach the edge list — carry their labels through
    val untouched = stored
      .select(col("id").cast("long").as("id"),
        col("component").cast("long").as("component"))
      .join(merged.select("id"), Seq("id"), "left_anti")
    merged.unionByName(untouched)
  }

  /** Dedup audit: the cluster-size histogram of the near-dup graph —
    * per cluster size, how many clusters, how many docs they hold and
    * how many a one-per-cluster dedup drops. Singleton (unpaired)
    * docs appear as cluster_size = 1. This is the monitoring artifact
    * a curation run ships next to its manifest: a fat tail of huge
    * clusters means boilerplate flooding; a dropped-doc total that
    * moves round-over-round means the dedup threshold drifted.
    * Everything derives from the same O(log n) star contraction —
    * the histogram itself is two tiny aggregates, no driver state. */
  def dedupAudit(ids: DataFrame, pairs: DataFrame,
                 idCol: String = "doc_id",
                 srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    val cc = connectedComponents(pairs, srcCol, dstCol)
    val sizes = cc.groupBy("component")
      .agg(count(lit(1)).as("cluster_size"))
    val hist = sizes.groupBy("cluster_size")
      .agg(count(lit(1)).as("n_clusters"))
    val singles = ids.select(col(idCol))
      .join(cc.select(col("id").as(idCol)), Seq(idCol), "left_anti")
      .agg(count(lit(1)).as("n_clusters"))
      .select(lit(1L).as("cluster_size"), col("n_clusters"))
    hist.unionByName(singles)
      .filter(col("n_clusters") > 0)
      .groupBy("cluster_size") // merge the singleton row with a
      .agg(sum("n_clusters").as("n_clusters")) // (possible) size-1 bucket
      .select(col("cluster_size"), col("n_clusters"),
        (col("cluster_size") * col("n_clusters")).as("n_docs"),
        ((col("cluster_size") - 1) * col("n_clusters")).as("n_dropped"))
      .orderBy("cluster_size")
  }

  /** Per-cluster GRAPH cohesion stats for the near-dup graph — the
    * audit that separates true duplicate families from chains of
    * borderline matches before a one-per-cluster dedup commits: a
    * template family is near-complete (density → 1, triangles ≈
    * C(n,3)), while a low-density chain through a hub is transitive
    * over-merging (one threshold notch away from collapsing distinct
    * docs). Per component: n_nodes, n_edges, n_triangles and density
    * = 2e/(n(n−1)).
    *
    * Triangles are counted once each via the canonical ordering
    * a<b<c: wedge join (a,b)⋈(b,c) then close with (a,c) — the
    * standard distributed triangle count; join volume is Σ_v C(deg v,
    * 2) over the DUP GRAPH only (tiny relative to the corpus; a
    * pathological hub is exactly what this audit exists to surface).
    * All counts are integers and the density division is one IEEE
    * op on exact integers — hash-exact, oracle-replayable. */
  def componentStats(pairs: DataFrame,
                     srcCol: String = "src",
                     dstCol: String = "dst"): DataFrame = {
    val cc = connectedComponents(pairs, srcCol, dstCol)
    val e = pairs.select(
        least(col(srcCol), col(dstCol)).cast("long").as("a"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val nodes = cc.groupBy("component").agg(count(lit(1)).as("n_nodes"))
    val edges = e.join(cc.select(col("id").as("a"), col("component")), "a")
      .groupBy("component").agg(count(lit(1)).as("n_edges"))
    val wedges = e.join(
      e.select(col("a").as("b"), col("b").as("c")), "b")
    val tris = wedges.join(
        e.select(col("a"), col("b").as("c")), Seq("a", "c"))
      .join(cc.select(col("id").as("a"), col("component")), "a")
      .groupBy("component").agg(count(lit(1)).as("n_triangles"))
    nodes.join(edges, Seq("component"), "left")
      .join(tris, Seq("component"), "left")
      .select(col("component"), col("n_nodes"),
        coalesce(col("n_edges"), lit(0L)).as("n_edges"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        (coalesce(col("n_edges"), lit(0L)).cast("double") * lit(2.0) /
          (col("n_nodes") * (col("n_nodes") - 1)).cast("double"))
          .as("density"))
      .orderBy("component")
  }

  /** Cluster-aware dedup: given the full id universe and near-dup
    * candidate pairs, keep ONE representative (the minimum id) per
    * connected component plus every unpaired id. This is the
    * transitive closure pair-greedy dedup approximates. */
  def componentDedup(ids: DataFrame, pairs: DataFrame,
                     idCol: String = "doc_id",
                     srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    val cc = connectedComponents(pairs, srcCol, dstCol)
    val dropped = cc.filter(col("id") =!= col("component"))
      .select(col("id").as(idCol))
    ids.select(col(idCol)).join(dropped, Seq(idCol), "left_anti")
      .orderBy(idCol)
  }

  /** [[componentDedup]] with a quality policy: per near-dup cluster
    * keep the member MAXIMIZING `scoreCol` in `scores` (ties → min
    * id) instead of blindly keeping the minimum id — what a curation
    * pipeline actually wants (among near-duplicates, retain the
    * longest / highest-quality copy). Unpaired ids always survive.
    *
    * `scores` must cover every id that appears in `pairs`; a
    * clustered id with no score row would silently drop (inner
    * join), so the contract is checked the cheap way — the caller
    * passes a projection of the same universe `ids` came from.
    *
    * Scale shape: the component labels come from the O(log n)
    * star-contraction in [[connectedComponents]]; the winner per
    * cluster is one row_number window over (component) — clusters
    * are tiny relative to the corpus, so the window shuffle moves
    * only the clustered ids, and the survivors anti-join moves ids
    * only. Integer scores + the id tie-break keep the winner
    * engine-exact. */
  def componentDedupBest(ids: DataFrame, pairs: DataFrame,
                         scores: DataFrame,
                         idCol: String = "doc_id",
                         scoreCol: String = "score",
                         srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cc = connectedComponents(pairs, srcCol, dstCol)
    val scored = cc.join(
      scores.select(col(idCol).as("id"), col(scoreCol).as("__score")),
      Seq("id"))
    val w = Window.partitionBy("component")
      .orderBy(col("__score").desc, col("id"))
    val keep = scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).select(col("id").as(idCol))
    val clustered = cc.select(col("id").as(idCol))
    ids.select(col(idCol)).join(clustered, Seq(idCol), "left_anti")
      .unionByName(keep)
      .orderBy(idCol)
  }

  /** Damped PageRank over an undirected edge list in EXACT integer
    * arithmetic — centrality for near-dup clusters. Scores are fixed
    * point at `Scale` = 10⁹ (initial mass `Scale` per node); one
    * iteration is r′(v) = (85·Σ_{u∼v} (r(u) div deg(u))) div 100 +
    * 0.15·Scale, i.e. the standard d=0.85 update with every divide
    * an integer `div` — no doubles anywhere, so 3 unrolled rounds
    * replay bit-exact as SQL CTEs (the k-means/BPE discipline).
    *
    * Scale shape: deg and the per-round contributions are (id, long)
    * rows — O(iters) edge-keyed shuffles, the same class as the CC
    * contraction; no driver state, no vertex program. Long bounds:
    * Σ mass ≈ N·10⁹, so per-node scores stay < 2⁶³ for any corpus
    * that fits a cluster (overflow needs a single component of
    * ~10⁹·avg_deg docs).
    *
    * Output: (id, pr_scaled) for every node of `pairs`. */
  def pageRank(pairs: DataFrame, iters: Int = 3,
               srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(iters > 0, "iters must be positive")
    val Scale = 1000000000L
    val base = Scale * 15 / 100 // 0.15·Scale, exact
    val e = pairs.select(
        least(col(srcCol), col(dstCol)).cast("long").as("src"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    val sym = e.select(explode(array(
        struct(col("src"), col("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    val symDeg = sym.join(
        sym.groupBy("src").agg(count(lit(1)).as("deg")), "src")
      .localCheckpoint() // reused every round: scan once, not iters×
    var r = symDeg.select(col("src").as("id")).distinct()
      .withColumn("pr", lit(Scale))
    for (_ <- 1 to iters) {
      r = symDeg.join(r.withColumnRenamed("id", "src"), "src")
        .select(col("dst"), expr("pr div deg").as("share"))
        .groupBy("dst").agg(sum("share").as("s"))
        .select(col("dst").as("id"),
          (expr("(s * 85) div 100") + lit(base)).as("pr"))
    }
    r.select(col("id"), col("pr").as("pr_scaled"))
  }

  /** Centrality-based dedup survivor choice: per near-dup cluster,
    * keep the [[pageRank]]-most-central member (ties → min id) — the
    * graph-aware alternative to [[componentDedupBest]]'s scalar
    * quality policy: the most-linked member is the one most
    * representative of what the cluster duplicates. Output covers
    * every CLUSTERED id: (id, component, pr_scaled, survivor);
    * unclustered docs don't need a policy. The survivor window
    * shuffles clustered ids only (clusters ≪ corpus). */
  def centralitySurvivors(pairs: DataFrame, iters: Int = 3,
                          srcCol: String = "src",
                          dstCol: String = "dst"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cc = connectedComponents(pairs, srcCol, dstCol)
    val pr = pageRank(pairs, iters, srcCol, dstCol)
    val w = Window.partitionBy("component")
      .orderBy(col("pr_scaled").desc, col("id"))
    cc.join(pr, "id")
      .withColumn("survivor", row_number().over(w) === 1)
      .select(col("id"), col("component"), col("pr_scaled"),
        col("survivor"))
      .orderBy("id")
  }

  /** Dedup LINEAGE manifest — for every input id, WHERE it went:
    * its cluster's canonical (minimum) id and whether it was the one
    * dropped. [[componentDedup]] answers "what survived"; audits and
    * takedown requests need the inverse ("doc X was folded into
    * canonical Y") — without this mapping a takedown of X leaves its
    * near-identical Y serving. One left join of the component labels
    * onto the id universe; singletons are their own canonical.
    * Output: (id, canonical_id, was_dropped). */
  def dedupManifest(ids: DataFrame, pairs: DataFrame,
                    idCol: String = "doc_id",
                    srcCol: String = "src",
                    dstCol: String = "dst"): DataFrame = {
    val cc = connectedComponents(pairs, srcCol, dstCol)
    ids.select(col(idCol))
      .join(cc.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("canonical_id"))
      .withColumn("was_dropped", col(idCol) =!= col("canonical_id"))
      .orderBy(idCol)
  }
}
