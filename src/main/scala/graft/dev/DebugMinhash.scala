package graft.dev
import org.apache.spark.sql.functions._
object DebugMinhash {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(logLevel = "ERROR")
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and " +
      "again until the evening comes down on the quiet field"
    val b = base.replace("quick", "swift")
    val c = b.replace("evening", "morning")
    val docs = Seq((1L, base), (2L, b), (3L, c)).toDF("doc_id", "text")
    println("[dbg] candidates:")
    graft.ops.Dedup.minHashCandidates(docs).collect().foreach(r => println(s"[dbg]   $r"))
    import graft.functions.TextExpressions._
    val bands = docs.select($"doc_id",
      minhash_bands(graft.ops.TextOps.tokens($"text"), 64, 16, 3).as("b")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    println(s"[dbg] shared bands 1-2: ${bands(1L).zip(bands(2L)).count(p => p._1 == p._2)}")
    println(s"[dbg] shared bands 2-3: ${bands(2L).zip(bands(3L)).count(p => p._1 == p._2)}")
    println(s"[dbg] shared bands 1-3: ${bands(1L).zip(bands(3L)).count(p => p._1 == p._2)}")
    spark.stop()
  }
}
