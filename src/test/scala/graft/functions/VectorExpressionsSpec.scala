package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Similarity

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  def vecs = Seq(
    (1L, Array(1.0, 2.0, 3.0)), (2L, Array(4.0, 5.0, 6.0)))
    .toDF("id", "v")

  test("DotProduct matches the built-in sequential fold bit-exactly") {
    val both = vecs.as("a").crossJoin(vecs.as("b"))
      .select(
        VectorExpressions.dot_product($"a.v", $"b.v").as("native"),
        Similarity.dotFold($"a.v", $"b.v").as("fold"))
      .collect()
    both.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    assert(both.map(_.getDouble(0)).contains(32.0)) // 1*4+2*5+3*6
  }

  test("DotProduct handles nulls and codegen/interpreted parity") {
    val withNull = Seq((1L, Array(1.0, 2.0)), (2L, null))
      .toDF("id", "v")
    val out = withNull.as("a").crossJoin(withNull.as("b"))
      .select(VectorExpressions.dot_product($"a.v", $"b.v").as("d"))
      .collect()
    assert(out.count(_.isNullAt(0)) == 3)   // any null side -> null
    assert(out.filter(!_.isNullAt(0)).map(_.getDouble(0)).toSeq == Seq(5.0))
  }

  test("DotProduct is null on mismatched array lengths (zip_with parity)") {
    val mixed = Seq(
      (1L, Array(1.0, 2.0, 3.0)), (2L, Array(1.0, 2.0)))
      .toDF("id", "v")
    val out = mixed.as("a").crossJoin(mixed.as("b"))
      .select(
        $"a.id", $"b.id",
        VectorExpressions.dot_product($"a.v", $"b.v").as("native"),
        Similarity.dotFold($"a.v", $"b.v").as("fold"))
      .collect()
    out.foreach { r =>
      assert(r.isNullAt(2) == r.isNullAt(3)) // matches zip_with fold
      assert(r.isNullAt(2) == (r.getLong(0) != r.getLong(1)))
    }
  }

  test("dot_product registers for SQL via GraftExtensions") {
    // injectFunction path, applied to the live session's registry
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product",
      exprs => DotProduct(exprs.head, exprs(1)), "scala_udf")
    vecs.createOrReplaceTempView("vecs_tmp")
    val r = spark.sql(
      "SELECT dot_product(a.v, b.v) AS d FROM vecs_tmp a, vecs_tmp b " +
        "WHERE a.id = 1 AND b.id = 2").head()
    assert(r.getDouble(0) == 32.0)
  }

  test("cosine_sim of a vector with itself is 1") {
    val c = vecs.select(
      VectorExpressions.cosine_sim($"v", $"v").as("c")).collect()
    c.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-15))
  }

  test("sign_lsh_probes flips only valid planes past 32 (Long masks)") {
    // with numPlanes > 32, Int-shift flip masks would alias planes
    // >= 32 back onto planes 0-7; every probe bucket must differ from
    // the base bucket in at most 2 bits, all within [0, numPlanes)
    val planes = 40
    val out = vecs.select(VectorExpressions.sign_lsh_probes(
        $"v", numPlanes = planes, tables = 2, probes = 8).as("bs"))
      .collect()
    out.foreach { r =>
      val bs = r.getSeq[Long](0)
      assert(bs.length == 16)
      for (t <- 0 until 2) {
        val base = bs(t * 8)
        for (k <- 1 until 8) {
          val diff = base ^ bs(t * 8 + k)
          assert(java.lang.Long.bitCount(diff) <= 2,
            s"probe $k flips ${java.lang.Long.bitCount(diff)} bits")
          assert((diff >>> planes) == 0L,
            s"probe $k flips a plane >= $planes: ${diff.toBinaryString}")
        }
      }
    }
  }
}
