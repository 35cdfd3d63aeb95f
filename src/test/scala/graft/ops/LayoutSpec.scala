package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def fileStats(path: String, cols: Seq[String]) = {
    val dir = new java.io.File(path)
    dir.listFiles().filter(_.getName.endsWith(".parquet")).map { f =>
      val agg = cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"),
        max(col(c)).as(s"max_$c")))
      spark.read.parquet(f.getAbsolutePath)
        .agg(agg.head, agg.tail: _*).head()
    }
  }

  test("writeRangeClustered produces files with disjoint key ranges") {
    val dir = Files.createTempDirectory("graft_layout").toString + "/t"
    val df = (1 to 4000).map(i => ((i * 2654435761L) % 1000, i))
      .toDF("k", "v")
    Layout.writeRangeClustered(df, dir, numFiles = 4, sortCols = Seq("k"))
    val stats = fileStats(dir, Seq("k"))
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(stats.length == 4)
    // disjoint [min,max] per file -> a point filter overlaps exactly
    // one file's range: file-level skipping is possible
    stats.sliding(2).foreach { case Array((_, hi), (lo, _)) =>
      assert(hi <= lo, s"overlapping file ranges: $stats")
    }
    // data intact
    assert(spark.read.parquet(dir).count() == 4000)
  }

  test("zValue2 interleaves bits (model check)") {
    def model(a: Long, b: Long): Long = {
      var z = 0L
      for (i <- 0 until 32) {
        z |= ((a >> i) & 1L) << (2 * i)
        z |= ((b >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (5L, 3L),
      (0xFFFFFFFFL, 0L), (123456789L, 987654321L))
    val got = cases.toDF("a", "b")
      .select(Layout.zValue2(col("a"), col("b"))).as[Long].collect().toSeq
    assert(got == cases.map { case (a, b) => model(a, b) })
  }

  test("z ordering covers the full 32-bit domain (sign-bit flip)") {
    // raw Morton code of b = 2^31 lands in the long sign bit; the
    // XOR writeZOrdered applies must keep the unsigned order
    val df = Seq((0L, (1L << 31) - 1), (0L, 1L << 31)).toDF("a", "b")
    val z = df.select(Layout.zValue2(col("a"), col("b"))
        .bitwiseXOR(lit(Long.MinValue)).as("z"))
      .as[Long].collect()
    assert(z(0) < z(1), s"2^31-1 must order before 2^31: ${z.toSeq}")
  }

  test("writeZOrdered clusters BOTH dimensions") {
    val dir = Files.createTempDirectory("graft_z").toString + "/t"
    // 64x64 grid; z-order into 4 files -> each file is one quadrant,
    // so BOTH a and b spans per file are half the global span.
    // repartitionByRange samples boundaries with a per-run seed
    // (default 100 rows/partition) — sample ≥ all 4096 rows so the
    // boundaries are the exact z quantiles and the quadrant assertion
    // is deterministic, not a sampling gamble.
    val sampleKey = "spark.sql.execution.rangeExchange.sampleSizePerPartition"
    val prevSample = spark.conf.get(sampleKey)
    spark.conf.set(sampleKey, 8192)
    val df = (0 until 4096).map(i => (i % 64, i / 64)).toDF("a", "b")
    try Layout.writeZOrdered(df, dir, numFiles = 4, "a", "b")
    finally spark.conf.set(sampleKey, prevSample)
    val stats = fileStats(dir, Seq("a", "b")).map(r =>
      (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(stats.length == 4)
    // files carry DISJOINT z ranges by construction (exact, however
    // the sampled range boundaries land)
    val zOf = (a: Int, b: Int) => {
      var z = 0L
      for (i <- 0 until 32) {
        z |= ((a.toLong >> i) & 1L) << (2 * i)
        z |= ((b.toLong >> i) & 1L) << (2 * i + 1)
      }
      z ^ Long.MinValue
    }
    val zRanges = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map { f =>
        val zs = spark.read.parquet(f.getAbsolutePath)
          .as[(Int, Int)].collect().map((zOf.apply _).tupled)
        (zs.min, zs.max)
      }.sortBy(_._1)
    zRanges.sliding(2).foreach { case Array((_, hi), (lo, _)) =>
      assert(hi <= lo, s"overlapping z ranges: ${zRanges.toSeq}")
    }
    // with exact (full-sample) boundaries each file is one true
    // quadrant: both spans are half the 63-wide global span (±1 row
    // at a boundary tie)
    stats.foreach { case (minA, maxA, minB, maxB) =>
      assert(maxA - minA <= 33, s"a span too wide: ${stats.toSeq}")
      assert(maxB - minB <= 33, s"b span too wide: ${stats.toSeq}")
    }
    assert(spark.read.parquet(dir).count() == 4096)
  }
}
