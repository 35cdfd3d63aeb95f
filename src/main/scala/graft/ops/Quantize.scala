package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Embedding quantization for storage/bandwidth-bound similarity at
  * scale: symmetric per-vector int8. Each vector stores one double
  * scale plus one byte per dimension — 4× smaller than float32, 8×
  * smaller than the double-precision scoring arrays, which at 10^9
  * embeddings is the difference between an ANN candidate-scoring
  * shuffle that fits in cluster memory and one that spills.
  *
  * Determinism: scale = max|v|/127 and q_i = floor(v_i/scale + 0.5)
  * are IEEE-exact single operations in fixed order (the money()
  * rounding rule — never round(), whose half-even/decimal behavior
  * differs across engines), so quantized values replay bit-identically
  * in any engine. |v_i| ≤ max|v| guarantees q_i ∈ [−127, 127] with no
  * clamp (v_i = ±max|v| lands exactly on ±127 after the floor).
  *
  * Columnar transforms only — no explode until the caller asks for
  * row form, no shuffle, no UDFs.
  */
object Quantize {

  /** Add `scale` (double) and `q` (int array) columns for a float/
    * double array column. All-zero vectors take scale 0 and an
    * all-zero q (the 0/0 division never runs). */
  def int8(vectors: DataFrame, idCol: String = "vec_id",
           vecCol: String = "embedding"): DataFrame = {
    val v = transform(col(vecCol), _.cast(DoubleType))
    val mx = array_max(transform(v, x => abs(x)))
    val scale = mx / lit(127.0)
    vectors.select(col(idCol), v.as("v"),
        when(mx === 0.0, lit(0.0)).otherwise(scale).as("scale"))
      .withColumn("q",
        when(col("scale") === 0.0,
          transform(col("v"), _ => lit(0L)))
        .otherwise(transform(col("v"),
          x => floor(x / col("scale") + 0.5).cast(LongType))))
      .select(col(idCol), col("scale"), col("q"))
  }

  /** Row form (id, pos, qval, scale) — the parquet/oracle-friendly
    * layout; pos is 0-based. */
  def int8Rows(vectors: DataFrame, idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame =
    int8(vectors, idCol, vecCol)
      .select(col(idCol), col("scale"), posexplode(col("q")))
      .select(col(idCol), col("pos").cast(LongType).as("pos"),
        col("col").as("qval"), col("scale"))
      .orderBy(idCol, "pos")

  /** 1-bit sign quantization: bit i of word w is set iff
    * v[64·w + i] > 0 — 64 dimensions per BIGINT word, 32× smaller
    * than float32. The compressed form supports Hamming-distance
    * search (bit_count over XOR, see
    * [[Similarity.hammingTopK]]): for random hyperplane-ish
    * embeddings the Hamming distance between sign words is a
    * monotone estimator of angular distance, so a Hamming top-C
    * prefilter plus exact re-rank of C candidates recovers cosine
    * top-k at a fraction of the scan bandwidth — at 10^9 vectors the
    * word column is 8 GB where the float32 column is 256 GB.
    *
    * Determinism: bits 0..62 accumulate through bitwise OR (pure
    * integer ops — no overflow even under ANSI mode); bit 63 is the
    * BIGINT sign bit and is OR'd in as the min-long constant, because
    * a `1 << 63` shift is engine-defined (DuckDB raises, Java wraps).
    * Exactly replayable in any engine with 64-bit integers. */
  def signPack(vectors: DataFrame, idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame =
    vectors.select(col(idCol), expr(
      s"""transform(sequence(0, int((size($vecCol) - 1) div 64)), w ->
            aggregate(sequence(0, 62), 0L, (acc, i) ->
              CASE WHEN w * 64 + i < size($vecCol)
                    AND element_at($vecCol, int(w * 64 + i + 1)) > 0
                   THEN acc | shiftleft(1L, i) ELSE acc END)
            | CASE WHEN w * 64 + 63 < size($vecCol)
                    AND element_at($vecCol, int(w * 64 + 64)) > 0
                   THEN cast('-9223372036854775808' as bigint)
                   ELSE 0L END)""").as("words"))

  /** Hamming distance between two sign-word arrays (bit_count of the
    * XOR, summed across words) — integer-exact. */
  def hamming(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)).cast(LongType)),
      lit(0L), (acc, v) => acc + v)

  /** Reconstruction: q_i · scale. Max absolute error is scale/2 by
    * construction (QuantizeSpec asserts it); cosine distortion on unit
    * vectors is O(1/127) — small enough that int8 candidate scoring
    * preserves ANN ranking almost everywhere, with exact re-scoring of
    * the top candidates as the standard recovery. */
  def dequantize(quantized: DataFrame, idCol: String = "vec_id"): DataFrame =
    quantized.select(col(idCol),
      transform(col("q"), x => x.cast(DoubleType) * col("scale")).as("v"))
}
