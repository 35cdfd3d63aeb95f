package graft

import org.apache.spark.sql.SparkSession

/** One local-session builder for every main (Verify/Bench/Smoke/
  * Explain/Pipeline) — the engine's required session config lives in
  * exactly one place: UTC, right-sized shuffle partitions, AQE,
  * TIMESTAMP(NANOS) handling, and the graft SQL extensions. */
object GraftSession {
  def local(cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"),
            logLevel: String = "WARN"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel(logLevel)
    spark
  }
}
