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
    // incremental rows must be VALUE-identical to the full-run rows
    // for the same month keys (not just correctly labeled)
    val fullOcc = res.metrics("occupancy_rate").collect()
      .map(r => r.getDate(0).toString -> r.toSeq).toMap
    val incOcc = occ.collect().map(r => r.getDate(0).toString -> r.toSeq).toMap
    assert(incOcc.keySet == Set("1995-06-01"))
    assert(incOcc("1995-06-01") == fullOcc("1995-06-01"))
    val fullDur = res.metrics("avg_booking_duration").collect()
      .map(r => r.getDate(0).toString -> r.toSeq).toMap
    val incDur = m("avg_booking_duration").collect()
      .map(r => r.getDate(0).toString -> r.toSeq).toMap
    assert(incDur.keySet == Set("1995-06-01"))
    assert(incDur("1995-06-01") == fullDur("1995-06-01"))
  }
}
