package graft.dev

import org.apache.spark.sql.functions.{col, lit}

/** r8 verdict ask #7: q196's 8-ary orderkey tree is shallow (~6
  * levels at sf0.1) — this measures the recursion at 10× the depth
  * and documents the `spark.sql.cteRecursionLevelLimit` contract.
  *
  * Fan-outs measured on the REPLICATED key set (1.5 M keys = sf0.1
  * orders × 10, contiguous):
  *  - DIV 8 (q196's shape): ~7 levels
  *  - DIV 2 (binary):      ~21 levels — 10× q196's sf0.1 depth
  * Each level is one equi-join of the previous LEVEL (shrinking
  * frontier) against the full table; cost per level is
  * scan + hash join, so total ≈ depth × per-level job overhead —
  * depth-bound, not size-bound.
  *
  * Limit behavior: a chain (parent = k − 1) deeper than
  * `cteRecursionLevelLimit` (default 100) fails LOUDLY with
  * "Recursion level limit ... reached" rather than looping —
  * demonstrated on a 200-node chain. Raising the conf is the
  * documented escape hatch for genuinely deeper hierarchies. */
object ProfileRecursion10x {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local()
    val orders = graft.io.Tables.orders(spark, sfDir)
      .select(col("o_orderkey"))
    val keys = (0 until 10).map { r =>
      orders.select((col("o_orderkey") + lit(r * 150000L)).as("k"))
    }.reduce(_ unionByName _).localCheckpoint(true)
    println(s"[rec10x] keys=${keys.count()}")
    keys.createOrReplaceTempView("keys_tree")
    // the OTHER guardrail: spark.sql.cteRecursionRowLimit (default
    // 1e6 total rows across all levels) trips before the level limit
    // on a 1.5M-node tree — raised here; documented in PLANS
    spark.conf.set("spark.sql.cteRecursionRowLimit", "40000000")

    def walk(div: Long): org.apache.spark.sql.DataFrame = spark.sql(s"""
      WITH RECURSIVE anc(k, depth) AS (
        SELECT k, CAST(0 AS BIGINT) AS depth FROM keys_tree WHERE k < $div
        UNION ALL
        SELECT t.k, a.depth + 1 FROM keys_tree t JOIN anc a
          ON t.k DIV $div = a.k WHERE t.k >= $div
      )
      SELECT depth, COUNT(*) AS n FROM anc GROUP BY depth ORDER BY depth""")

    for (div <- Seq(8L, 2L)) {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        walk(div).collect()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val levels = walk(div).count()
      println(f"[rec10x] DIV $div: levels=$levels " +
        f"median=${ts(2)}%.2f s runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    // recursion-limit contract on a 200-deep chain
    spark.range(200).select(col("id").as("k"))
      .createOrReplaceTempView("chain")
    try {
      spark.sql("""
        WITH RECURSIVE walk(k) AS (
          SELECT CAST(0 AS BIGINT) AS k
          UNION ALL
          SELECT c.k FROM chain c JOIN walk w ON c.k = w.k + 1
        ) SELECT COUNT(*) FROM walk""").collect()
      println("[rec10x] chain-200: completed under default limit?!")
    } catch {
      case e: Exception =>
        println(s"[rec10x] chain-200 (default limit 100): LOUD failure — " +
          e.getMessage.linesIterator.next())
    }
    spark.conf.set("spark.sql.cteRecursionLevelLimit", "300")
    val n = spark.sql("""
      WITH RECURSIVE walk(k) AS (
        SELECT CAST(0 AS BIGINT) AS k
        UNION ALL
        SELECT c.k FROM chain c JOIN walk w ON c.k = w.k + 1
      ) SELECT COUNT(*) AS n FROM walk""").head().getLong(0)
    println(s"[rec10x] chain-200 at limit=300: $n rows (completes)")
    spark.stop()
  }
}
