package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expressions for the text-dedup hot loops. Spark's
  * higher-order functions (`transform`/`aggregate`) interpret their
  * lambda bodies per element — for MinHash that is
  * |shingles| × k interpreted expression evaluations per document.
  * These expressions run the same arithmetic as a generated tight
  * loop (and a matching interpreted `eval` for non-codegen paths).
  */

/** k-permutation MinHash signature from pre-hashed shingles
  * (array<long> → array<long>). Parameter derivation (SplitMix64,
  * 31-bit) matches ops.Dedup.minHashSignature exactly — identical
  * signatures, ~k× less interpretation overhead. */
case class MinHashFromHashes(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_from_hashes"

  @transient lazy val aParams: Array[Long] = DeterministicHash.minhashA(numHashes)
  @transient lazy val bParams: Array[Long] = DeterministicHash.minhashB(numHashes)

  private val Mask31 = (1L << 31) - 1  // pmod(h, 2^31) == h & mask

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val h = hs.getLong(j) & Mask31
      var i = 0
      while (i < numHashes) {
        // the % MinhashP is load-bearing: see DeterministicHash.MinhashP
        val v = (aParams(i) * h + bParams(i)) % DeterministicHash.MinhashP
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val a = ctx.addReferenceObj("minhashA", aParams, "long[]")
      val b = ctx.addReferenceObj("minhashB", bParams, "long[]")
      val mins = ctx.freshName("mins")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |int $n = $hs.numElements();
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $j = 0; $j < $n; $j++) {
         |  long $h = $hs.getLong($j) & ${Mask31}L;
         |  for (int $i = 0; $i < $numHashes; $i++) {
         |    long $v = ($a[$i] * $h + $b[$i]) % ${DeterministicHash.MinhashP}L;
         |    if ($v < $mins[$i]) $mins[$i] = $v;
         |  }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): MinHashFromHashes =
    copy(child = c)
}

/** MinHash LSH band hashes straight from the TOKEN array, in one
  * evaluation per document: per-token xxhash64 (computed once each),
  * rolling `shingleLen`-token window hashes, k affine permutations
  * into a running-min signature, then per-band combined hashes.
  * Output: array<long> of `bands` band hashes.
  *
  * Why one expression: the composable formulation
  * (`transform(shingles(text), xxhash64)` feeding a signature
  * expression) spends its time building shingle STRINGS in
  * interpreted higher-order lambdas (slice+array_join per window) —
  * measured ~0.6ms/doc, dominating the whole dedup. Here tokens are
  * hashed once and windows combine hashes — no string building.
  * Window-hash semantics (vs hashing the joined string) only change
  * bucket assignment, never verification results. */
case class MinHashBands(child: Expression, numHashes: Int, bands: Int,
                        shingleLen: Int) extends UnaryExpression {
  require(numHashes % bands == 0, "bands must divide numHashes")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_bands"

  private val rows = numHashes / bands
  private val Mask31 = (1L << 31) - 1

  @transient private lazy val aParams: Array[Long] = DeterministicHash.minhashA(numHashes)
  @transient private lazy val bParams: Array[Long] = DeterministicHash.minhashB(numHashes)

  override def nullSafeEval(input: Any): Any = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    // hash every token once
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      val u = toks.getUTF8String(i)
      th(i) = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset,
        u.numBytes(), 42L)
      i += 1
    }
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val nWindows = math.max(n - shingleLen, 0) + 1
    var w = 0
    while (w < nWindows) {
      // rolling window combine (order-sensitive mix)
      var h = 0x9E3779B97F4A7C15L
      var t = w
      val end = math.min(w + shingleLen, n)
      while (t < end) {
        h = (h ^ th(t)) * 0xBF58476D1CE4E5B9L
        h ^= (h >>> 29)
        t += 1
      }
      val h31 = h & Mask31
      var k = 0
      while (k < numHashes) {
        // the % MinhashP is load-bearing: see DeterministicHash.MinhashP
        val v = (aParams(k) * h31 + bParams(k)) % DeterministicHash.MinhashP
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      w += 1
    }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 0x9E3779B97F4A7C15L * (b + 1)
      var r = 0
      while (r < rows) {
        acc ^= mins(b * rows + r)
        acc *= 0xBF58476D1CE4E5B9L
        acc ^= (acc >>> 29)
        r += 1
      }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }

  // JIT-compiled Scala loop via one virtual call per row; keeps the
  // operator inside whole-stage codegen (unlike CodegenFallback).
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("minhashBands", this,
      classOf[MinHashBands].getName)
    nullSafeCodeGen(ctx, ev, arr => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $self.nullSafeEval($arr);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): MinHashBands =
    copy(child = c)
}

/** Candidate pairs (x < y) from a long-id array — the in-bucket
  * expansion, as one tight loop instead of nested interpreted
  * `transform`/`slice` lambdas. Buckets up to `maxAll` ids emit every
  * pair; LARGER buckets emit star pairs to the minimum id — O(n)
  * instead of O(n²), and still links every member to the bucket's
  * canonical document (sufficient for dedup-by-canonical: a
  * mass-duplicate flood all verifies against one doc). Dropping
  * oversized buckets outright — the obvious cap — would exempt
  * boilerplate floods, the single most duplicate-rich case, from
  * dedup entirely. Output: array<struct<id_a:long, id_b:long>>. */
case class LongArrayPairs(child: Expression, maxAll: Int)
    extends UnaryExpression {
  import org.apache.spark.sql.types.{StructField, StructType}

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("id_a", LongType, nullable = false),
      StructField("id_b", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "long_array_pairs"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val ids = new Array[Long](n)
    var i = 0
    while (i < n) { ids(i) = arr.getLong(i); i += 1 }
    java.util.Arrays.sort(ids)
    val out =
      if (n <= maxAll) {
        val o = new Array[Any](n * (n - 1) / 2)
        var k = 0; i = 0
        while (i < n) {
          var j = i + 1
          while (j < n) {
            o(k) = org.apache.spark.sql.catalyst.InternalRow(ids(i), ids(j))
            k += 1; j += 1
          }
          i += 1
        }
        o
      } else {
        val o = new Array[Any](n - 1)
        var j = 1
        while (j < n) {
          o(j - 1) = org.apache.spark.sql.catalyst.InternalRow(ids(0), ids(j))
          j += 1
        }
        o
      }
    new GenericArrayData(out)
  }

  // Interpreted eval is already a tight loop over tiny (≤ maxBucket)
  // arrays; fall back to it instead of generating row-building code.
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pairsExpr", this,
      classOf[LongArrayPairs].getName)
    nullSafeCodeGen(ctx, ev, arr => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $self.nullSafeEval($arr);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): LongArrayPairs =
    copy(child = c)
}

/** Intersection size of two SORTED string arrays (merge count).
  * Inputs must be `array_sort(array_distinct(...))` — array_sort's
  * UTF8String binary ordering matches the compare used here. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var n = 0L
    while (i < a.numElements() && j < b.numElements()) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      s"""
         |int $i = 0; int $j = 0; long $n = 0L;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  int $c = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($c == 0) { $n++; $i++; $j++; }
         |  else if ($c < 0) $i++;
         |  else $j++;
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** Intersection size of two SORTED long arrays — the dictionary-
  * encoded sibling of [[SortedIntersectCount]]. The similarity-join
  * verify stage maps shingle strings to dense long ids first
  * (Vernica et al. 2010's token ordering): intersection COUNTS are
  * invariant under any bijective re-encoding, and the long arrays
  * are ~3× lighter than UTF8String arrays through the two verify
  * joins — the stage's cost is carried array bytes, not compares. */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_long_intersect_count"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var n = 0L
    while (i < a.numElements() && j < b.numElements()) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $i = 0; int $j = 0; long $n = 0L;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  long $x = $a.getLong($i); long $y = $b.getLong($j);
         |  if ($x == $y) { $n++; $i++; $j++; }
         |  else if ($x < $y) $i++;
         |  else $j++;
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** [[SimHash64]]'s ORACLE-REPLAYABLE twin: identical ±1 bit-vote
  * aggregation, but the per-token 64 bits come from the FIRST 16 hex
  * digits of the standard md5 — bit i = (value of hex digit ⌊i/4⌋)
  * >> (i mod 4) & 1 — which DuckDB replays verbatim with
  * `strpos('0123456789abcdef', substr(md5(tok), i//4+1, 1)) - 1`
  * (DuckDB has no xxhash64, which is what kept the q26/q65 family
  * rows-only). xxhash64 stays the production default (one 64-bit
  * mix vs a full MD5 per token); SimHashMd5Spec asserts both paths
  * drop every planted dup with only a quantified sketch-boundary
  * residual, so the md5 oracle gate covers the production path's
  * pipeline logic. */
case class SimHashMd5(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_md5"

  // MessageDigest is stateful and not thread-safe — one per thread
  @transient private lazy val mdLocal =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val contrib = new Array[Int](64)
    val md = mdLocal.get()
    var j = 0
    while (j < n) {
      md.reset()
      val dig = md.digest(toks.getUTF8String(j).getBytes)
      var i = 0
      while (i < 64) {
        val d = i >> 2                      // hex digit index 0..15
        val b = dig(d >> 1)                 // md5 byte 0..7
        // hex prints the high nibble first: even digits = high nibble
        val v = if ((d & 1) == 0) (b >> 4) & 0xF else b & 0xF
        contrib(i) += (if (((v >> (i & 3)) & 1) != 0) 1 else -1)
        i += 1
      }
      j += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) { if (contrib(i) > 0) sig |= (1L << i); i += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("simhashMd5", this,
      classOf[SimHashMd5].getName)
    nullSafeCodeGen(ctx, ev, arr => {
      s"""
         |${ev.value} = (Long) $self.nullSafeEval($arr);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): SimHashMd5 =
    copy(child = c)
}

/** 64-bit SimHash of a token array (array<string> → long): per token
  * one xxhash64 (seed 42, matching the builtin), each signature bit's
  * counter moves ±1 with the token hash's bit, and the final bit is
  * set where the counter is positive — semantically identical to the
  * composable aggregate/zip_with formulation in ops.Dedup, but one
  * tight loop instead of a 64-mask interpreted lambda tree per token
  * (which also bloats the plan: 64 array lambdas per reference). */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val contrib = new Array[Long](64)
    var j = 0
    while (j < n) {
      val u = toks.getUTF8String(j)
      val h = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset,
        u.numBytes(), 42L)
      var i = 0
      while (i < 64) {
        contrib(i) += (if (((h >>> i) & 1L) != 0L) 1L else -1L)
        i += 1
      }
      j += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (contrib(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  // JIT-compiled Scala loop via one virtual call per row (same
  // pattern as MinHashBands — keeps whole-stage codegen intact).
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("simhash64", this,
      classOf[SimHash64].getName)
    nullSafeCodeGen(ctx, ev, arr => {
      s"""
         |${ev.value} = (Long) $self.nullSafeEval($arr);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
}

/** SORTED DISTINCT n-token shingle strings of a token array
  * (array<string> → array<string>) — the exact-verification item set
  * of the whole near-dup stack (jaccardVerify, decontaminate,
  * dedupAgainstIndex), in one pass: each window's tokens are joined
  * with a single space (byte-identical to
  * `array_join(slice(toks,...), " ")` and to the DuckDB oracles'
  * `array_to_string(toks[i:j], ' ')`), deduped and sorted via a
  * TreeSet of UTF8Strings (binary compareTo — the same ordering
  * `array_sort` applies to strings). Replaces the interpreted
  * transform(sequence)+slice+array_join+array_distinct+array_sort
  * chain, which was the dominant per-doc cost of the q67/q27/q66
  * verification scans. */
case class SortedDistinctShingles(child: Expression, shingleLen: Int)
    extends UnaryExpression {
  import org.apache.spark.sql.types.StringType
  require(shingleLen > 0, "shingleLen must be positive")

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "sorted_distinct_shingles"

  override def nullSafeEval(input: Any): Any = {
    import org.apache.spark.unsafe.types.UTF8String
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    // empty array → [""] — the composable chain's result for zero
    // tokens (sequence(0,0) window over nothing joins to one empty
    // string); current callers never pass one (tokens() of "" is
    // [""]), but byte-identity with the model must not depend on that
    if (n == 0)
      return new GenericArrayData(
        Array[AnyRef](UTF8String.fromString("")))
    val set = new java.util.TreeSet[UTF8String]()
    val space = UTF8String.fromString(" ")
    val nWindows = math.max(n - shingleLen, 0) + 1
    var w = 0
    while (w < nWindows) {
      val end = math.min(w + shingleLen, n)
      val parts = new Array[UTF8String](2 * (end - w) - 1)
      var t = w
      var k = 0
      while (t < end) {
        if (t > w) { parts(k) = space; k += 1 }
        parts(k) = toks.getUTF8String(t); k += 1
        t += 1
      }
      set.add(UTF8String.concat(parts: _*))
      w += 1
    }
    new GenericArrayData(set.toArray(new Array[AnyRef](set.size())))
  }

  // JIT-compiled Scala loop via one virtual call per row (the
  // MinHashBands pattern — stays inside whole-stage codegen).
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("sortedShingles", this,
      classOf[SortedDistinctShingles].getName)
    nullSafeCodeGen(ctx, ev, arr => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $self.nullSafeEval($arr);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): SortedDistinctShingles =
    copy(child = c)
}

/** Multiset sibling of [[SortedDistinctShingles]]: every k-token
  * window in DOCUMENT order, duplicates kept — total n-gram counts
  * (type-token ratios, collocation denominators) need the multiset,
  * which the distinct variant cannot serve. Exists for the same
  * reason it does: the composable `transform(sequence(...), i =>
  * array_join(slice(toks, …)))` chain re-evaluates its token input
  * per window once CollapseProject inlines it — measured 2.9-3.7 s
  * for one explode over sf0.1's 5000 docs vs 0.4 s native. Window
  * rule matches `TextOps.shingles` byte-for-byte: max(n−k, 0)+1
  * windows, the trailing short window kept, zero tokens → [""]. */
case class ShinglesMultiset(child: Expression, shingleLen: Int)
    extends UnaryExpression {
  import org.apache.spark.sql.types.StringType
  require(shingleLen > 0, "shingleLen must be positive")

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles_multiset"

  override def nullSafeEval(input: Any): Any = {
    import org.apache.spark.unsafe.types.UTF8String
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    if (n == 0)
      return new GenericArrayData(
        Array[AnyRef](UTF8String.fromString("")))
    val space = UTF8String.fromString(" ")
    val nWindows = math.max(n - shingleLen, 0) + 1
    val out = new Array[AnyRef](nWindows)
    var w = 0
    while (w < nWindows) {
      val end = math.min(w + shingleLen, n)
      val parts = new Array[UTF8String](2 * (end - w) - 1)
      var t = w
      var k = 0
      while (t < end) {
        if (t > w) { parts(k) = space; k += 1 }
        parts(k) = toks.getUTF8String(t); k += 1
        t += 1
      }
      out(w) = UTF8String.concat(parts: _*)
      w += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("shinglesMultiset", this,
      classOf[ShinglesMultiset].getName)
    nullSafeCodeGen(ctx, ev, arr => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $self.nullSafeEval($arr);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): ShinglesMultiset =
    copy(child = c)
}

/** Greedy longest-match tokenizer encode (WordPiece-style, string →
  * array<struct<piece:string, vocab_id:int>>): starting at the front
  * of the word, repeatedly emit the LONGEST vocab entry that prefixes
  * the remainder and advance past it; a remainder no entry prefixes
  * becomes one OOV piece (vocab_id 0) and ends the word. The vocab is
  * embedded in the expression pre-sorted by length descending — first
  * prefix hit in scan order IS the longest match (two same-length
  * prefixes of one position would be the same string, so the order is
  * total without a tie-break). A tokenizer vocabulary is a bounded
  * model artifact (tens of k entries), so shipping it inside the
  * expression is the standard distribution shape — every executor
  * encodes locally, no join, no shuffle. */
case class GreedyPieces(child: Expression, vocabTokens: Array[String],
                        vocabIds: Array[Int]) extends UnaryExpression {
  import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
  require(vocabTokens.length == vocabIds.length, "tokens/ids must align")
  require(vocabTokens.forall(_.nonEmpty), "empty vocab entries never advance")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("piece", StringType, nullable = false),
      StructField("vocab_id", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "greedy_pieces"

  /** First-character index into the length-desc vocab: a prefix match
    * must share its first char with the position, so each greedy step
    * scans only that bucket (order within a bucket preserves the
    * longest-first scan). Without it every piece pays an O(|vocab|)
    * startsWith sweep — at a tens-of-k-entry vocab that sweep, not
    * the encode, would dominate. */
  @transient private lazy val byFirstChar: java.util.HashMap[Character, Array[Int]] = {
    val m = new java.util.HashMap[Character, Array[Int]]()
    vocabTokens.indices.groupBy(i => vocabTokens(i).charAt(0))
      .foreach { case (c, is) => m.put(c, is.toArray) }
    m
  }

  override def nullSafeEval(input: Any): Any = {
    val word = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toString
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var pos = 0
    while (pos < word.length) {
      var found = -1
      val bucket = byFirstChar.get(word.charAt(pos))
      var i = 0
      while (bucket != null && i < bucket.length && found < 0) {
        if (word.startsWith(vocabTokens(bucket(i)), pos)) found = bucket(i)
        i += 1
      }
      if (found < 0) {
        out += org.apache.spark.sql.catalyst.InternalRow(
          org.apache.spark.unsafe.types.UTF8String
            .fromString(word.substring(pos)), 0)
        pos = word.length
      } else {
        out += org.apache.spark.sql.catalyst.InternalRow(
          org.apache.spark.unsafe.types.UTF8String
            .fromString(vocabTokens(found)), vocabIds(found))
        pos += vocabTokens(found).length
      }
    }
    new GenericArrayData(out.toArray)
  }

  // JIT-compiled Scala loop via one virtual call per row (the
  // MinHashBands pattern — stays inside whole-stage codegen).
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("greedyPieces", this,
      classOf[GreedyPieces].getName)
    nullSafeCodeGen(ctx, ev, w => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $self.nullSafeEval($w);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): GreedyPieces =
    copy(child = c)
}

object TextExpressions {
  def simhash64(tokens: Column): Column =
    GraftSqlBridge.column(SimHash64(GraftSqlBridge.expression(tokens)))

  def simhash_md5(tokens: Column): Column =
    GraftSqlBridge.column(SimHashMd5(GraftSqlBridge.expression(tokens)))

  def minhash_from_hashes(hashes: Column, k: Int): Column =
    GraftSqlBridge.column(
      MinHashFromHashes(GraftSqlBridge.expression(hashes), k))

  def minhash_bands(tokens: Column, k: Int, bands: Int,
                    shingleLen: Int): Column =
    GraftSqlBridge.column(
      MinHashBands(GraftSqlBridge.expression(tokens), k, bands, shingleLen))

  def long_array_pairs(ids: Column, maxAll: Int): Column =
    GraftSqlBridge.column(
      LongArrayPairs(GraftSqlBridge.expression(ids), maxAll))

  def sorted_intersect_count(a: Column, b: Column): Column =
    GraftSqlBridge.column(SortedIntersectCount(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  def sorted_long_intersect_count(a: Column, b: Column): Column =
    GraftSqlBridge.column(SortedLongIntersectCount(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  def sorted_distinct_shingles(tokens: Column, n: Int): Column =
    GraftSqlBridge.column(SortedDistinctShingles(
      GraftSqlBridge.expression(tokens), n))

  def shingles_multiset(tokens: Column, n: Int): Column =
    GraftSqlBridge.column(ShinglesMultiset(
      GraftSqlBridge.expression(tokens), n))

  /** `vocab` as (token, vocab_id) pairs; sorted by length descending
    * here so the expression's scan order realizes longest-match. */
  def greedy_pieces(word: Column, vocab: Seq[(String, Int)]): Column = {
    val sorted = vocab.sortBy { case (t, _) => (-t.length, t) }
    GraftSqlBridge.column(GreedyPieces(GraftSqlBridge.expression(word),
      sorted.map(_._1).toArray, sorted.map(_._2).toArray))
  }
}
