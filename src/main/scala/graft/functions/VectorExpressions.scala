package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the vector dot product — the hot
  * inner loop of similarity search. A codegen'd tight loop over the
  * two `ArrayData`s: no lambda-function interpretation (unlike
  * `aggregate`/`zip_with`), no per-element boxing.
  *
  * Semantics are IDENTICAL to the sequential fold
  * `aggregate(zip_with(a,b,*), 0.0, +)` — ascending index order,
  * double accumulation, and NULL when the array lengths differ
  * (zip_with null-pads the shorter side, which nulls the sum). On
  * equal-length inputs results are bit-exact with DuckDB's
  * `list_dot_product` (verified empirically); on mismatched lengths
  * DuckDB errors ("list dimensions must be equal") while this
  * returns NULL, so oracle queries must keep dimensions equal.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  /** Both inputs must be array<double> — ArrayData.getDouble on a
    * float-backed array mis-reads memory, so reject at analysis time
    * (SQL callers must cast: `transform(v, x -> cast(x as double))`). */
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    import org.apache.spark.sql.types.ArrayType
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) null
    else {
      var acc = 0.0
      var i = 0
      while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Sign-LSH bucket ids for `tables` independent hyperplane families
  * in ONE evaluation (array<double> → array<long> of `tables` bucket
  * ids). Plane components are derived from SplitMix64 — the "model"
  * is a hash function, zero stored state. The composable HOF
  * formulation interprets planes × dims lambda evals per vector; this
  * is a JIT'd loop (delegated eval, stays inside whole-stage
  * codegen). */
case class SignLshBuckets(child: Expression, numPlanes: Int, tables: Int)
    extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "sign_lsh_buckets"

  /** Component of plane p (within family t) at dimension i,
    * in [-1, 1). */
  private def component(t: Int, p: Int, i: Int): Double = {
    val h = DeterministicHash.splitmix64(((t.toLong * 1000 + p) << 20) ^ i.toLong)
    ((h & 0xFFFFFL).toDouble / 524288.0) - 1.0
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var p = 0
      while (p < numPlanes) {
        var proj = 0.0
        var i = 0
        while (i < n) { proj += v.getDouble(i) * component(t, p, i); i += 1 }
        if (proj > 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("signLsh", this,
      classOf[SignLshBuckets].getName)
    nullSafeCodeGen(ctx, ev, arr => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $self.nullSafeEval($arr);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): SignLshBuckets =
    copy(child = c)
}

/** Multi-probe sign-LSH buckets (Lv et al. 2007, VLDB): per plane
  * family, the base bucket PLUS the `probes − 1` buckets reached by
  * flipping the query's lowest-confidence plane signs — the planes
  * whose projection margin |v·h| is smallest are the ones a true
  * neighbor most likely lands on the other side of, so probing those
  * buckets multiplies effective tables without re-hashing the corpus
  * (corpus vectors keep ONE bucket per table via [[SignLshBuckets]]).
  * Perturbation sets are all 1- and 2-plane flips ranked by
  * Σ margin² ascending (the standard query-directed score); ties
  * break on plane indices, so the probe sequence is deterministic.
  * Output: array<long> of `tables × probes` bucket ids, table-major,
  * base bucket first within each table — callers recover the table id
  * as `pos / probes`. Plane components are IDENTICAL to
  * [[SignLshBuckets]] (same SplitMix64 derivation), so corpus-side
  * buckets need no change. */
case class SignLshProbes(child: Expression, numPlanes: Int, tables: Int,
                         probes: Int)
    extends UnaryExpression {
  require(probes >= 1, "probes must be >= 1")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "sign_lsh_probes"

  private def component(t: Int, p: Int, i: Int): Double = {
    val h = DeterministicHash.splitmix64(((t.toLong * 1000 + p) << 20) ^ i.toLong)
    ((h & 0xFFFFFL).toDouble / 524288.0) - 1.0
  }

  /** Flip sets (bitmasks over planes) of size 1 and 2, precomputed
    * once per expression instance — scored per query by Σ margin².
    * Long masks: [[SignLshBuckets]] accepts up to 63 planes, and an
    * Int `1 << a` silently aliases planes ≥ 32 back onto 0-7. */
  @transient private lazy val flipSets: Array[Long] = {
    val sets = scala.collection.mutable.ArrayBuffer.empty[Long]
    var a = 0
    while (a < numPlanes) {
      sets += (1L << a)
      var b = a + 1
      while (b < numPlanes) { sets += ((1L << a) | (1L << b)); b += 1 }
      a += 1
    }
    sets.toArray
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val out = new Array[Long](tables * probes)
    val margins = new Array[Double](numPlanes)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var p = 0
      while (p < numPlanes) {
        var proj = 0.0
        var i = 0
        while (i < n) { proj += v.getDouble(i) * component(t, p, i); i += 1 }
        if (proj > 0) bucket |= (1L << p)
        margins(p) = proj * proj
        p += 1
      }
      out(t * probes) = bucket
      if (probes > 1) {
        // rank flip sets by summed squared margin (asc); stable sort +
        // the fixed enumeration order makes ties deterministic
        val scored = flipSets.map { m =>
          var s = 0.0
          var q = 0
          while (q < numPlanes) { if ((m & (1L << q)) != 0L) s += margins(q); q += 1 }
          (s, m)
        }.sortBy(_._1)
        var k = 1
        while (k < probes) {
          // fewer flip sets than probes (tiny numPlanes): repeat the
          // base bucket — harmless duplicate, candidates distinct later
          out(t * probes + k) =
            if (k - 1 < scored.length) bucket ^ scored(k - 1)._2
            else bucket
          k += 1
        }
      }
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("signLshProbes", this,
      classOf[SignLshProbes].getName)
    nullSafeCodeGen(ctx, ev, arr => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $self.nullSafeEval($arr);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): SignLshProbes =
    copy(child = c)
}

/** IVF probe assignment: the `nProbe` coarse-quantizer cells nearest
  * to the vector (by cosine against `numCentroids` deterministic
  * pseudo-random centroids). Corpus vectors use nProbe=1 (their home
  * cell); queries probe several cells for recall. The centroid
  * "codebook" is a hash function — zero trained state, identical on
  * every executor and every run. Output: array<int> of cell ids,
  * best first. */
case class IvfProbes(child: Expression, numCentroids: Int, nProbe: Int)
    extends UnaryExpression {
  require(nProbe <= numCentroids)

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "ivf_probes"

  private def component(c: Int, i: Int): Double = {
    val h = DeterministicHash.splitmix64((c.toLong << 32) ^ i.toLong)
    ((h & 0xFFFFFL).toDouble / 524288.0) - 1.0
  }

  // centroid norms depend on dim — computed once per (expression
  // instance, dim), deterministically. Published as ONE (dim, norms)
  // pair through a volatile so concurrent evaluators never observe a
  // dim from one write paired with norms from another; recomputation
  // races are benign (both threads compute identical values).
  @transient @volatile private var cached: (Int, Array[Double]) = _
  private def norms(dim: Int): Array[Double] = {
    val c0 = cached
    if (c0 != null && c0._1 == dim) c0._2
    else {
      val ns = new Array[Double](numCentroids)
      var c = 0
      while (c < numCentroids) {
        var s = 0.0; var i = 0
        while (i < dim) { val x = component(c, i); s += x * x; i += 1 }
        ns(c) = math.sqrt(s)
        c += 1
      }
      cached = (dim, ns)
      ns
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = v.numElements()
    val cn = norms(dim)
    val scores = new Array[Double](numCentroids)
    var c = 0
    while (c < numCentroids) {
      var dot = 0.0; var i = 0
      while (i < dim) { dot += v.getDouble(i) * component(c, i); i += 1 }
      scores(c) = if (cn(c) == 0) 0.0 else dot / cn(c)
      c += 1
    }
    // top-nProbe by (score desc, id asc) — selection without full sort
    val out = new Array[Int](nProbe)
    val taken = new Array[Boolean](numCentroids)
    var p = 0
    while (p < nProbe) {
      var best = -1
      var c2 = 0
      while (c2 < numCentroids) {
        if (!taken(c2) && (best < 0 || scores(c2) > scores(best))) best = c2
        c2 += 1
      }
      taken(best) = true
      out(p) = best
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("ivfProbes", this,
      classOf[IvfProbes].getName)
    nullSafeCodeGen(ctx, ev, arr => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $self.nullSafeEval($arr);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): IvfProbes =
    copy(child = c)
}

/** Argmax-cosine assignment against a FIXED centroid matrix — the
  * k-means inner loop as one codegen'd O(k·dim) pass. The naive
  * formulation (`array_max` over k struct(cosine, -cluster) columns)
  * builds a k×dim-literal expression tree that degrades sharply with
  * k (21 s at k=80/20k vectors vs 4 s at k=8 — ProfileCluster10x);
  * this loop is flat in expression size, so k can scale with the
  * corpus (SemDeDup wants cell count ∝ N).
  *
  * Arithmetic is IDENTICAL per centroid to
  * `dot(e,c) / (sqrt(dot(e,e)) * sqrt(dot(c,c)))` with sequential
  * index-order accumulation: ‖e‖ computed once per row, ‖c_j‖
  * precomputed once at construction with the same fold. Selection is
  * strict `>` over ascending row order, so ties keep the FIRST
  * (lowest) index — the caller orders centroids by cluster id,
  * making this identical to `array_max` over (sim, -cluster).
  * Returns `[bestSim, bestIdx]` as array<double>; NULL only when the
  * vector's length differs from the centroids'. When EVERY sim is
  * NaN (a zero-norm vector against every centroid) the result is
  * `[NaN, 0]` — the lowest index — matching both the `array_max`
  * formulation it replaced (NaN compares equal, tie falls to the
  * lowest cluster) and the DuckDB oracle (NaN sorts first under
  * `ORDER BY sim DESC`, tie to cluster asc), so degenerate vectors
  * assign deterministically instead of nulling the cluster column. */
case class ArgmaxCosine(child: Expression, cents: Array[Array[Double]])
    extends UnaryExpression {

  private val norms: Array[Double] = cents.map { c =>
    var acc = 0.0
    var i = 0
    while (i < c.length) { acc += c(i) * c(i); i += 1 }
    math.sqrt(acc)
  }

  override def dataType: DataType = ArrayType(DoubleType, false)
  override def nullable: Boolean = true
  override def prettyName: String = "argmax_cosine"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<double>, got ${other.simpleString}")
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val e = input.asInstanceOf[ArrayData]
    val n = e.numElements()
    if (cents.exists(_.length != n)) null
    else {
      var na = 0.0
      var i = 0
      while (i < n) { val x = e.getDouble(i); na += x * x; i += 1 }
      na = math.sqrt(na)
      var bestSim = Double.NegativeInfinity
      var bestJ = -1
      var j = 0
      while (j < cents.length) {
        val c = cents(j)
        var dot = 0.0
        var ii = 0
        while (ii < n) { dot += e.getDouble(ii) * c(ii); ii += 1 }
        val sim = dot / (na * norms(j))
        if (sim > bestSim) { bestSim = sim; bestJ = j }
        j += 1
      }
      if (bestJ < 0) // every sim NaN: lowest index, like the oracle
        new GenericArrayData(Array(Double.NaN, 0.0))
      else new GenericArrayData(Array(bestSim, bestJ.toDouble))
    }
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("cents", cents, "double[][]")
    val nRef = ctx.addReferenceObj("norms", norms, "double[]")
    nullSafeCodeGen(ctx, ev, e => {
      val n = ctx.freshName("n")
      val na = ctx.freshName("na")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val ii = ctx.freshName("ii")
      val dot = ctx.freshName("dot")
      val sim = ctx.freshName("sim")
      val bestSim = ctx.freshName("bestSim")
      val bestJ = ctx.freshName("bestJ")
      val c = ctx.freshName("c")
      val ok = ctx.freshName("ok")
      val x = ctx.freshName("x")
      s"""
         |int $n = $e.numElements();
         |boolean $ok = true;
         |for (int $j = 0; $j < $cRef.length; $j++) {
         |  if ($cRef[$j].length != $n) { $ok = false; }
         |}
         |if (!$ok) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $na = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $x = $e.getDouble($i);
         |    $na += $x * $x;
         |  }
         |  $na = Math.sqrt($na);
         |  double $bestSim = Double.NEGATIVE_INFINITY;
         |  int $bestJ = -1;
         |  for (int $j = 0; $j < $cRef.length; $j++) {
         |    double[] $c = $cRef[$j];
         |    double $dot = 0.0;
         |    for (int $ii = 0; $ii < $n; $ii++) {
         |      $dot += $e.getDouble($ii) * $c[$ii];
         |    }
         |    double $sim = $dot / ($na * $nRef[$j]);
         |    if ($sim > $bestSim) { $bestSim = $sim; $bestJ = $j; }
         |  }
         |  if ($bestJ < 0) {
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util
         |      .GenericArrayData(new double[]{Double.NaN, 0.0});
         |  } else {
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util
         |      .GenericArrayData(new double[]{$bestSim, (double) $bestJ});
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): ArgmaxCosine = copy(child = newChild)
}

object VectorExpressions {
  /** Column API for [[DotProduct]]. */
  def dot_product(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      DotProduct(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Codegen'd cosine similarity built on [[DotProduct]]. */
  def cosine_sim(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    dot_product(a, b) / (sqrt(dot_product(a, a)) * sqrt(dot_product(b, b)))
  }

  /** Sign-LSH bucket ids (one per plane family). */
  def sign_lsh_buckets(v: Column, numPlanes: Int, tables: Int): Column =
    GraftSqlBridge.column(
      SignLshBuckets(GraftSqlBridge.expression(v), numPlanes, tables))

  /** Multi-probe sign-LSH bucket ids (`probes` per plane family,
    * table-major, base first — see [[SignLshProbes]]). */
  def sign_lsh_probes(v: Column, numPlanes: Int, tables: Int,
                      probes: Int): Column =
    GraftSqlBridge.column(
      SignLshProbes(GraftSqlBridge.expression(v), numPlanes, tables, probes))

  /** IVF probe cell ids (best first). */
  def ivf_probes(v: Column, numCentroids: Int, nProbe: Int): Column =
    GraftSqlBridge.column(
      IvfProbes(GraftSqlBridge.expression(v), numCentroids, nProbe))

  /** `[bestSim, bestIdx]` of the argmax-cosine centroid (see
    * [[ArgmaxCosine]]). */
  def argmax_cosine(e: Column, cents: Array[Array[Double]]): Column =
    GraftSqlBridge.column(
      ArgmaxCosine(GraftSqlBridge.expression(e), cents))
}
