package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical data layout for scan pruning — the write-side half of
  * "push down and prune". Parquet footers carry per-file and
  * per-row-group min/max; a reader's predicate can skip whole files
  * ONLY if the writer clustered the data so those ranges are narrow.
  * At 100 TB the difference between a clustered and an unclustered
  * table is reading 1 file vs 10 000 for the same point query.
  */
object Layout {

  /** Range-cluster `df` on `sortCols` and write parquet: global
    * range partitioning (one sampling pass, as in any global sort)
    * gives files DISJOINT key ranges, then an intra-partition sort
    * tightens row-group stats. A point/range filter on the leading
    * sort column then prunes to the files whose [min,max] overlap —
    * verified in `LayoutSpec` by reading footers back. */
  def writeRangeClustered(df: DataFrame, path: String, numFiles: Int,
                          sortCols: Seq[String]): Unit = {
    val cols = sortCols.map(col)
    df.repartitionByRange(numFiles, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Z-value (Morton code) of two non-negative int columns: bit
    * interleave via pure codegen'd expressions (no UDF). Sorting by
    * the z-value clusters BOTH dimensions at once — the multi-column
    * layout when queries filter on either column (range clustering
    * on (a, b) only prunes on `a`). 32 bits per dimension; the raw
    * code's SIGNED order is correct only while b < 2³¹ (b's bit 31
    * maps to the long sign bit) — [[writeZOrdered]] flips the sign
    * bit to order the full domain unsigned. */
  def zValue2(a: Column, b: Column): Column = {
    // spread the low 32 bits of x to even bit positions (classic
    // Morton spreading with shift/mask steps — all long arithmetic,
    // whole-stage-codegen'd)
    def spread(x: Column): Column = {
      val masks = Seq(
        (16, lit(0x0000FFFF0000FFFFL)),
        (8,  lit(0x00FF00FF00FF00FFL)),
        (4,  lit(0x0F0F0F0F0F0F0F0FL)),
        (2,  lit(0x3333333333333333L)),
        (1,  lit(0x5555555555555555L)))
      masks.foldLeft(x.cast("long").bitwiseAND(lit(0xFFFFFFFFL))) {
        case (acc, (s, m)) =>
          (acc.bitwiseOR(shiftleft(acc, s))).bitwiseAND(m)
      }
    }
    spread(a).bitwiseOR(shiftleft(spread(b), 1))
  }

  /** Z-order-cluster on two int columns and write: range partition +
    * sort by the z-value, so files are clustered in BOTH dimensions
    * and min/max pruning works for filters on either column.
    *
    * Ordering uses the z-value with the sign bit flipped: for inputs
    * with bit 31 set, `spread(b) << 1` lands in the long's sign bit,
    * so the RAW Morton code sorts negative-first — the XOR restores
    * the unsigned order across the full 32-bit domain. */
  def writeZOrdered(df: DataFrame, path: String, numFiles: Int,
                    colA: String, colB: String): Unit = {
    require(!df.columns.contains("__z"), "__z is reserved")
    val z = zValue2(col(colA), col(colB)).bitwiseXOR(lit(Long.MinValue))
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
