package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.ops.Dedup

/** Dev-only: stage timings for the MinHash dedup pipeline. */
object ProfileQ25 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](n: String)(b: => A): A = {
      val t0 = System.nanoTime(); val r = b
      println(f"[prof] $n: ${(System.nanoTime()-t0)/1e9}%.2fs"); r
    }
    val docs = Tables.documents(spark, dir)
    time("warmup")(docs.count())
    val sig = docs.select(col("doc_id"),
      Dedup.minHashSignature(col("text")).as("minhash"))
    time("signatures")(sig.count())
    val banded = Dedup.lshBands(sig, 16, 4)
    time("banded")(banded.count())
    val cand = Dedup.minHashCandidates(docs)
    val nc = time("candidates")(cand.count())
    println(s"[prof] n_candidates=$nc")
    val ver = Dedup.jaccardVerify(cand, docs, shingleLen = Dedup.ShingleLen)
    time("verify")(ver.count())
    time("full_dedup")(Dedup.minHashDedup(docs).count())
    spark.stop()
  }
}
