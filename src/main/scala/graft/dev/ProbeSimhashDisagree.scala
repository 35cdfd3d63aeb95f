package graft.dev

import org.apache.spark.sql.functions._

/** Quantify md5-vs-xxhash64 SimHash dedup disagreements: for each doc
  * the two paths decide differently, print its min Hamming distance
  * to any lower-id doc under BOTH signature functions. */
object ProbeSimhashDisagree {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    import spark.implicits._
    val d = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")
    val corpus = d.unionByName(d.filter($"doc_id" % 25 === 0)
      .select(($"doc_id" + 10000).as("doc_id"), $"text"))
    val viaMd5 = graft.ops.Dedup.simHashDedupMd5(corpus)
      .as[Long].collect().toSet
    val viaXx = graft.ops.Dedup.simHashDedup(corpus)
      .as[Long].collect().toSet
    val disagree = (viaMd5 diff viaXx) union (viaXx diff viaMd5)
    println(s"[probe] disagreements: ${disagree.size} -> " +
      disagree.toSeq.sorted.mkString(","))
    val sigs = corpus.select($"doc_id",
      graft.ops.Dedup.simHash($"text").as("xx"),
      graft.ops.Dedup.simHashMd5($"text").as("m5")).cache()
    val a = sigs.select($"doc_id".as("id_a"), $"xx".as("xa"), $"m5".as("ma"))
    val b = sigs.select($"doc_id".as("id_b"), $"xx".as("xb"), $"m5".as("mb"))
    val mins = a.crossJoin(b).filter($"id_b" < $"id_a")
      .groupBy($"id_a")
      .agg(min(bit_count($"xa".bitwiseXOR($"xb"))).as("min_xx"),
        min(bit_count($"ma".bitwiseXOR($"mb"))).as("min_md5"))
      .filter($"id_a".isin(disagree.toSeq: _*))
      .orderBy("id_a").collect()
    mins.foreach(r => println(
      s"[probe] doc ${r.getLong(0)}: minHam xx=${r.get(1)} md5=${r.get(2)}"))
    spark.stop()
  }
}
