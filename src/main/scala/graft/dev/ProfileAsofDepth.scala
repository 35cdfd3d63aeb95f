package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, date_format}

import graft.{GraftSession, Pipeline}
import graft.etl.Analog

/** r13 verdict ask #7 evidence: `asof_wall`'s expected SHAPE vs
  * anchor depth, so a future gauge-drift flag can be judged against a
  * documented bound instead of one lone number.
  *
  * The time-travel cost model ([[Pipeline.goldAsOf]]): reconstruct
  * each state by starting from the nearest retained full snapshot
  * at/above the anchor (or live state when no snapshot intervenes)
  * and applying the undo deltas of every later fold in reverse — so
  * the wall is (one bucketed state read) + k undo applications, with
  * k ≤ SnapEvery under snapshot mode and k ≤ UndoKeep−1 under
  * pruning mode. This harness builds one warehouse per mode at the
  * given SF and times `goldAsOf(...)("top_performing_listing")
  * .count()` at every legal depth, median of 3.
  *
  * Usage: `runMain graft.dev.ProfileAsofDepth /root/testdata/sf0.1`
  */
object ProfileAsofDepth {

  private def timed(body: => Unit): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }
  private def med3(body: => Unit): Double = {
    val xs = (1 to 3).map(_ => timed(body)).sorted
    xs(1)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark: SparkSession = GraftSession.local()
    import spark.implicits._
    val months = (Analog.curated(spark, sfDir)
        .select(date_format(col("booking_date"), "yyyy-MM").as("m"))
        .distinct().as[String].collect() ++
      Analog.apartmentsConverted(spark, sfDir)
        .select(date_format(col("listing_created_on"), "yyyy-MM").as("m"))
        .distinct().as[String].collect()).toSet.toSeq.sorted

    def build(root: String, snapEvery: Int): Unit = {
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(root))
      Pipeline.snapEveryOverride.set(snapEvery)
      try months.grouped(24).foreach { w =>
        Pipeline.runIncrementalWindow(spark, sfDir, root, w,
          writeGold = false): Unit
      } finally Pipeline.snapEveryOverride.set(-1)
    }
    def probe(root: String, snapEvery: Int, mode: String): Unit = {
      Pipeline.snapEveryOverride.set(snapEvery)
      try {
        val entries = Pipeline.ledgerEntries(spark, root)
        val wm = Pipeline.undoWatermark(spark, s"$root/state")
        val anchors = entries.filter(_._2 >= math.max(0L, wm)).takeRight(12)
        anchors.foreach { case (label, seq) =>
          val depth = entries.last._2 - seq
          val w = med3(Pipeline.goldAsOf(spark, root, sfDir, label)(
            "top_performing_listing").count(): Unit)
          println(f"[asofdepth:$mode] anchor=$label seq=$seq " +
            f"depth_from_live=$depth wall=$w%.2f s")
        }
      } finally Pipeline.snapEveryOverride.set(-1)
    }

    val base = s"${sys.props("java.io.tmpdir")}/graft_asof_depth"
    // pruning mode (bench default): horizon = last UndoKeep-1 folds
    build(s"$base/prune", 0)
    probe(s"$base/prune", 0, "prune")
    // snapshot mode: rewind bounded by the cadence — anchors between
    // snapshots pay up to SnapEvery-1 undo applications
    build(s"$base/snap", 4)
    probe(s"$base/snap", 4, "snap4")
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(base))
    spark.stop()
  }
}
