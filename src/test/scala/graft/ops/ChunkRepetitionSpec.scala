package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Context-window chunking and repetition-signal specs: exact chunk
  * boundaries including the overlap and tail rules, and exact repeat
  * counting on crafted documents. */
class ChunkRepetitionSpec extends SparkSpec {
  import spark.implicits._

  test("chunkDocs: stride windows with overlap, tail chunk, short doc") {
    val docs = Seq(
      (0L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 toks
      (1L, "a b c")                                   // shorter than max
    ).toDF("doc_id", "text")
    // maxTokens=4, stride=3: extra = ceil((10-4)/3) = 2 -> 3 chunks
    val out = TextOps.chunkDocs(docs, maxTokens = 4, stride = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
    assert(out.toSeq == Seq(
      (0L, 0, 0L, 4L, "t1 t2 t3 t4"),
      (0L, 1, 3L, 4L, "t4 t5 t6 t7"),   // 1-token overlap
      (0L, 2, 6L, 4L, "t7 t8 t9 t10"),
      (1L, 0, 0L, 3L, "a b c")))
  }

  test("chunkDocs: every token is covered and budgets are respected") {
    val real = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
    val chunks = TextOps.chunkDocs(real, maxTokens = 64, stride = 48)
    val bad = chunks.filter(col("n_chunk_tokens") > 64 ||
      col("n_chunk_tokens") <= 0).count()
    assert(bad == 0)
    // coverage: last chunk of each doc must reach the doc's end
    val toks = TextOps.tokens(col("text"))
    val lastEnd = chunks.groupBy("doc_id")
      .agg(max(col("start_tok") + col("n_chunk_tokens")).as("covered"))
      .join(real.select(col("doc_id"), size(toks).cast("long").as("n")),
        "doc_id")
    assert(lastEnd.filter(col("covered") =!= col("n")).count() == 0)
  }

  test("repetitionScore counts repeats exactly") {
    val docs = Seq(
      (0L, "a b a b a b"),  // toks 6/2 distinct; 3-shingles: a b a, b a b, a b a, b a b -> 4 total 2 distinct
      (1L, "x y z")         // no repeats: 1 shingle, 3 distinct toks
    ).toDF("doc_id", "text")
    val out = TextOps.repetitionScore(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4), r.getLong(5), r.getDouble(6)))
    assert(out.toSeq == Seq(
      (0L, 4L, 2L, 0.5, 6L, 2L, 1.0 - 2.0 / 6.0),
      (1L, 1L, 1L, 0.0, 3L, 3L, 0.0)))
  }
}
