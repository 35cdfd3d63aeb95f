package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurriculumDiversitySpec extends SparkSpec {
  import spark.implicits._

  test("tokenConcentration: hand-computed Herfindahl, flag semantics") {
    val docs = Seq(
      (1L, "a a a b"),                 // counts [3,1]: sum_sq=10, conc=10/16
      (2L, "a b c d e f g h")          // 8 distinct: conc=8/64=0.125
    ).toDF("doc_id", "text")
    val out = TextOps.tokenConcentration(docs)
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getAs[Long]("n_tokens") == 4)
    assert(r1.getAs[Long]("n_distinct") == 2)
    assert(r1.getAs[Long]("sum_sq") == 10)
    assert(r1.getAs[Long]("max_count") == 3)
    assert(r1.getAs[Double]("concentration") == 0.625)
    assert(r1.getAs[Double]("top_frac") == 0.75)
    assert(r1.getAs[Boolean]("repetitive"))
    val r2 = out(2L)
    assert(r2.getAs[Long]("sum_sq") == 8)
    assert(r2.getAs[Double]("concentration") == 0.125)
    assert(!r2.getAs[Boolean]("repetitive"))
  }

  test("ngramDiversity: hand counts per source and n, short-doc clamp") {
    val docs = Seq(
      (1L, "a b a b", "s1"),
      (2L, "a b c", "s1"),
      (3L, "x", "s2")                   // shorter than n: clamped gram
    ).toDF("doc_id", "text", "source")
    val out = TextOps.ngramDiversity(docs)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r).toMap
    // s1 unigrams: 7 total, {a,b,c} distinct
    assert(out(("s1", 1)).getAs[Long]("total_ngrams") == 7)
    assert(out(("s1", 1)).getAs[Long]("distinct_ngrams") == 3)
    assert(out(("s1", 1)).getAs[Double]("ttr") == 3.0 / 7.0)
    // s1 bigrams: "a b","b a","a b" + "a b","b c" → 5 total, 3 distinct
    assert(out(("s1", 2)).getAs[Long]("total_ngrams") == 5)
    assert(out(("s1", 2)).getAs[Long]("distinct_ngrams") == 3)
    // s1 trigrams: "a b a","b a b","a b c" → all distinct
    assert(out(("s1", 3)).getAs[Double]("ttr") == 1.0)
    // s2: single 1-token doc clamps every n to one gram "x"
    Seq(1, 2, 3).foreach { n =>
      assert(out(("s2", n)).getAs[Long]("total_ngrams") == 1)
      assert(out(("s2", n)).getAs[Long]("distinct_ngrams") == 1)
    }
  }

  test("curriculumOrder: equal tiers, quality-ordered, rank ≡ global sort") {
    // stopword share drives the q89 score: more stopwords → higher
    val docs = (0 until 8).map { i =>
      val stop = Seq.fill(8 - i)("the")
      val rare = (0 until i).map(j => s"tok${i}_$j")
      (i.toLong, (stop ++ rare).mkString(" "))
    }.toDF("doc_id", "text")
    val out = TextOps.curriculumOrder(docs, stages = 4)
      .collect()
    assert(out.length == 8)
    // 4 equal tiers of 2
    val byStage = out.groupBy(_.getAs[Long]("stage"))
    assert(byStage.keySet == Set(0L, 1L, 2L, 3L))
    assert(byStage.values.forall(_.length == 2))
    // rank agrees with a global (score desc, id) sort
    val globalOrder = out.sortBy(r =>
      (-r.getAs[Double]("score"), r.getAs[Long]("doc_id")))
    globalOrder.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("rank") == i + 1)
    }
    // stage 0 holds the 2 highest-score docs
    val s0 = byStage(0L).map(_.getAs[Long]("rank")).toSet
    assert(s0 == Set(1L, 2L))
    // output sorted by (stage, order_key); keys are md5 hex
    assert(out.map(r => (r.getAs[Long]("stage"),
      r.getAs[String]("order_key"))).toSeq ==
      out.map(r => (r.getAs[Long]("stage"),
        r.getAs[String]("order_key"))).toSeq.sorted)
    assert(out.forall(_.getAs[String]("order_key").matches("[0-9a-f]{32}")))
    // epoch changes the within-stage order key but not the tiers
    val e1 = TextOps.curriculumOrder(docs, stages = 4, epoch = 1).collect()
    assert(e1.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("stage"))
      .toMap == out.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("stage")).toMap)
    assert(e1.map(_.getAs[String]("order_key")).toSet !=
      out.map(_.getAs[String]("order_key")).toSet)
  }

  test("docNovelty: hand-computed shares, duplicates zero each other out") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c d e"),        // grams: abc bcd cde
      (2L, "a b c x y"),        // grams: abc bcx cxy — shares abc with 1
      (3L, "p q r s t"),        // all novel
      (4L, "p q r s t"))        // exact dup of 3 — all grams df=2
      .toDF("doc_id", "text")
    val out = TextOps.docNovelty(d).collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_novel"),
          r.getAs[Double]("novelty"))).toMap
    assert(out(1L) === ((3L, 2L, 2.0 / 3.0)))  // abc shared
    assert(out(2L) === ((3L, 2L, 2.0 / 3.0)))
    assert(out(3L) === ((3L, 0L, 0.0)))        // dup kills all novelty
    assert(out(4L) === ((3L, 0L, 0.0)))
  }

  test("docNovelty: repeated gram within one doc counts once (distinct per doc)") {
    import spark.implicits._
    val d = Seq((1L, "a b a b a b"), (2L, "z z z z"))
      .toDF("doc_id", "text")
    val out = TextOps.docNovelty(d).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_grams")).toMap
    // doc 1: windows aba bab aba bab -> distinct {aba, bab} = 2
    assert(out(1L) === 2L)
    // doc 2: windows zzz zzz -> distinct {zzz} = 1
    assert(out(2L) === 1L)
  }
}
