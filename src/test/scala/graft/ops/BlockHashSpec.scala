package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.BinaryExpressions

/** The blockhash binary near-dup family (q157): (1) the codegen'd
  * expression matches an independent in-test Scala model byte-for-
  * byte on real payloads, including the n < 64 empty-tile and empty-
  * payload edges the corpus never exercises; (2) planted value-jitter
  * copies land within the Hamming-3 dedup radius while NO unrelated
  * doc is dropped (the measured inter-doc floor is ~17 bits); (3) the
  * drop rule keeps the lower asset id of an identical-payload pair.
  */
class BlockHashSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference model of the 64-tile median blockhash. */
  private def model(bytes: Array[Byte]): Long = {
    val n = bytes.length
    val ts = new Array[Long](64); val tl = new Array[Long](64)
    bytes.zipWithIndex.foreach { case (b, j) =>
      val t = ((j.toLong * 64L) / n).toInt
      ts(t) += (b & 0xFF); tl(t) += 1
    }
    val means = (0 until 64).map(t =>
      if (tl(t) == 0) 0.0 else ts(t).toDouble / tl(t)).toArray
    val med = means.sorted.apply(31)
    (0 until 64).foldLeft(0L)((sig, t) =>
      if (means(t) > med) sig | (1L << t) else sig)
  }

  private def assets = Multimodal.asBinaryAssets(
    graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text"))

  test("block_hash64 matches the independent model on real payloads") {
    val got = assets
      .select($"asset_id", $"payload",
        BinaryExpressions.block_hash64($"payload").as("sig"))
      .as[(Long, Array[Byte], Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (id, payload, sig) =>
      assert(sig == model(payload), s"asset $id diverges from model")
    }
  }

  test("n < 64 (empty tiles) and empty payload edges match the model") {
    val edge = Seq(
      (1L, "tiny"), (2L, "a slightly longer but still sub-64 string"),
      (3L, ""), (4L, "x" * 63), (5L, "y" * 64), (6L, "z" * 65))
      .toDF("doc_id", "text")
    val got = Multimodal.asBinaryAssets(edge)
      .select($"asset_id", $"payload",
        BinaryExpressions.block_hash64($"payload").as("sig"))
      .as[(Long, Array[Byte], Long)].collect()
    got.foreach { case (id, payload, sig) =>
      assert(sig == model(payload), s"edge asset $id diverges")
    }
    assert(got.find(_._1 == 3L).get._3 == 0L,
      "empty payload must hash to 0")
  }

  test("value-jitter plants are dropped; no unrelated doc is") {
    val d = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")
    // the q157 salt: +1 on every 20th non-space char, capped at 125
    val t = $"text"
    def charAt(j: org.apache.spark.sql.Column) = t.substr(j + lit(1), lit(1))
    val jittered = d.filter($"doc_id" % 25 === 0)
      .select(($"doc_id" + 10000).as("doc_id"),
        array_join(transform(sequence(lit(0), length(t) - 1), j =>
          when(j % 20 === 0 && charAt(j) =!= " ",
            call_function("char", least(lit(125), ascii(charAt(j)) + 1)))
            .otherwise(charAt(j))), "").as("text"))
    val corp = d.unionByName(jittered)
    val survivors = Multimodal.blockHashDedup(
        Multimodal.asBinaryAssets(corp))
      .as[Long].collect().toSet
    val plants = jittered.select($"doc_id").as[Long].collect()
    val originals = d.select($"doc_id").as[Long].collect()
    val caught = plants.count(p => !survivors.contains(p))
    assert(caught >= (plants.length * 8) / 10,
      s"only $caught/${plants.length} jitter plants dropped")
    // jitter never flips a bit far enough to delete an original
    assert(originals.forall(survivors.contains),
      "an unrelated original was dropped")
  }

  test("identical payloads: lower asset id survives") {
    val corp = Seq((7L, "same exact payload bytes"),
      (3L, "same exact payload bytes"), (9L, "another thing entirely"))
      .toDF("doc_id", "text")
    val survivors = Multimodal.blockHashDedup(
        Multimodal.asBinaryAssets(corp))
      .as[Long].collect().toSet
    assert(survivors == Set(3L, 9L))
  }
}
