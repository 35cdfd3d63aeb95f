package graft

/** Every `SparkEntry.queries` entry must EXECUTE — not just build a
  * plan — on real testdata. Verify.scala swallows per-query failures
  * (so one broken query can't zero the whole round's artifact), which
  * means a query that throws at runtime silently vanishes from
  * CORRECTNESS instead of failing loudly; round 5 shipped q32/q36
  * crashing on unresolvable columns that no spec ran end-to-end. This
  * suite is the structural guard: one test per query, smallest SF.
  *
  * Row-count assertions are deliberately weak (> 0) — hash-level
  * correctness is the DuckDB oracle's job; this gate is "it runs and
  * returns something".
  */
class AllQueriesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes end-to-end at sf0.001") {
      val n = fn(spark, sfDir).count()
      assert(n > 0, s"$name returned no rows at sf0.001")
    }
  }

  test("entry() smoke-checks like the driver") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries twin") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql without queries: $orphans")
  }

  test("every rows-only query names an oracle-gated twin") {
    // r8 structural guard: the no-oracle set must be EXACTLY the
    // rowsOnlyTwins ledger (a new query without an oracle fails here
    // until it either gets one or documents its twin), and every twin
    // must itself be oracle-gated
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == SparkEntry.rowsOnlyTwins.keySet,
      s"rows-only vs ledger mismatch: ${
        (rowsOnly diff SparkEntry.rowsOnlyTwins.keySet) ++
          (SparkEntry.rowsOnlyTwins.keySet diff rowsOnly)}")
    val badTwins =
      SparkEntry.rowsOnlyTwins.values.toSet -- SparkEntry.oracleSql.keySet
    assert(badTwins.isEmpty, s"twins without oracles: $badTwins")
  }
}
