package graft.dev

import graft.{GraftSession, SparkEntry}

/** Plan-shape audit: for every SparkEntry query, count parquet scan
  * nodes in the formatted physical plan. A query should scan each of
  * its input tables a small constant number of times; a big count
  * means a subtree is being cloned into every branch of a union /
  * self-join (the q72 pathology, fixed in 446d012) instead of built
  * once. Usage: runMain graft.dev.AuditScans <sfDir> [minScans]
  */
object AuditScans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val min = args.lift(1).map(_.toInt).getOrElse(0)
    val spark = GraftSession.local()
    val rows = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val plan = fn(spark, sfDir).queryExecution.executedPlan.toString()
          val scans = "Scan parquet".r.findAllIn(plan).length +
            "LocalTableScan".r.findAllIn(plan).length
          if (scans >= min) Some((name, scans)) else None
        } catch {
          case e: Exception =>
            Some((name + " ERROR:" + e.getClass.getSimpleName, -1))
        }
    }
    rows.sortBy(-_._2).foreach { case (n, c) => println(f"[scans] $c%4d  $n") }
    spark.stop()
  }
}
