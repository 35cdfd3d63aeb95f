package graft

import java.nio.file.Files

import graft.SparkSpec

class PipelineSpec extends SparkSpec {

  test("pipeline writes partitioned Silver; month metrics prune partitions") {
    val out = Files.createTempDirectory("graft_pipe").toString
    val res = Pipeline.run(spark, "/root/testdata/sf0.001", out)
    assert(res.curated.count() == 1500)
    assert(res.metrics.size == 7)

    val m = Pipeline.monthMetrics(spark, out, "1995-06")
    val occ = m("occupancy_rate")
    // the month predicate must reach the scan as a partition filter
    val plan = occ.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("booking_month"),
      s"expected partition pruning on booking_month:\n$plan")
    // booking_month=1995-06 bookings can check in during June or (for
    // late-June bookings) July — never outside that window
    val months = occ.collect().map(_.getDate(0).toString).toSeq
    assert(months.nonEmpty &&
      months.forall(m => m == "1995-06-01" || m == "1995-07-01"))
  }
}
