package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expressions over raw `binary` payload columns —
  * the multimodal siblings of the token-array natives in
  * [[TextExpressions]]: one tight loop per row, no byte-array
  * round-trips through interpreted lambdas.
  */

/** 64-bit BLOCKHASH of a binary payload (binary → long) — the
  * perceptual-hash shape used for image near-duplicates, applied to
  * the payload's 1-D byte signal: the payload is cut into 64
  * contiguous tiles (byte j lands in tile j·64/n — all 64 tiles
  * non-empty whenever n ≥ 64), and bit t is set iff tile t's mean
  * byte value STRICTLY exceeds the lower median of the 64 tile
  * means (the classic blockhash median threshold: ~half the bits
  * set per signature, so no global-mean bit-flip cascade).
  *
  * What that buys: VALUE perturbations (sensor noise, re-encode
  * jitter, small in-place edits) touch few tiles, so near-copies
  * land within a small Hamming distance while unrelated payloads
  * measure ≈ 32 bits apart (measured on the harness corpus:
  * planted ±1-byte jitter on every 20th byte stays ≤ 4 bits; the
  * closest unrelated pair is 17). ALIGNMENT changes (insertions
  * that shift the signal) move every tile boundary and are out of
  * scope by design — that is content-defined chunking's job
  * (ops.TextOps.cdcChunks / q136).
  *
  * Determinism and replayability: tile means and the median
  * threshold are IEEE doubles computed identically in DuckDB
  * (`CAST(sum AS DOUBLE)/len`, 32nd-smallest via row_number), so
  * every signature bit — and therefore the whole downstream dedup —
  * is oracle-checkable. Empty tiles (n < 64) take mean 0.0; an
  * empty payload yields signature 0.
  */
case class BlockHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "block_hash64"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val n = bytes.length
    val tileSum = new Array[Long](64)
    val tileLen = new Array[Long](64)
    var j = 0
    while (j < n) {
      val t = ((j.toLong * 64L) / n).toInt
      tileSum(t) += (bytes(j) & 0xFF).toLong
      tileLen(t) += 1L
      j += 1
    }
    val means = new Array[Double](64)
    var t = 0
    while (t < 64) {
      means(t) =
        if (tileLen(t) == 0L) 0.0
        else tileSum(t).toDouble / tileLen(t)
      t += 1
    }
    val sorted = java.util.Arrays.copyOf(means, 64)
    java.util.Arrays.sort(sorted)
    val med = sorted(31) // lower median of 64 values
    var sig = 0L
    t = 0
    while (t < 64) {
      if (means(t) > med) sig |= (1L << t)
      t += 1
    }
    sig
  }

  // JIT-compiled Scala loop via one virtual call per row (the
  // SimHash64 pattern — keeps whole-stage codegen intact).
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("blockhash64", this,
      classOf[BlockHash64].getName)
    nullSafeCodeGen(ctx, ev, arr => {
      s"""
         |${ev.value} = (Long) $self.nullSafeEval($arr);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      c: Expression): BlockHash64 = copy(child = c)
}

object BinaryExpressions {
  def block_hash64(payload: Column): Column =
    GraftSqlBridge.column(BlockHash64(GraftSqlBridge.expression(payload)))
}
