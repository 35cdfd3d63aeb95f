package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BM25 hard-negative mining (q156): the exclusion contract (neither
  * the query itself nor an md5-identical copy may appear as a
  * negative — made observable by planted exact copies), the ranking
  * contract (contiguous ranks, non-increasing scores, tie-broken),
  * and the candidate contract (every negative shares at least one of
  * the query's rare terms — scores can't appear from nowhere). */
class Bm25NegativesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corp = {
    val d = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")
    d.unionByName(d.filter($"doc_id" % 25 === 0)
      .select(($"doc_id" + 10000).as("doc_id"), $"text"))
  }

  private lazy val negs = TextOps.bm25Negatives(
    corp, corp.filter($"doc_id" < 20), m = 5, k = 5)

  test("self and exact copies are excluded from the negatives") {
    val texts = corp.as[(Long, String)].collect().toMap
    val rows = negs.select($"qid", $"neg_id").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (qid, neg) =>
      assert(neg != qid, s"query $qid returned itself")
      assert(texts(neg) != texts(qid),
        s"query $qid returned exact copy $neg")
    }
    // the plant makes the exclusion binding: qid 0's +10000 copy
    // would rank #1 on identical text if the md5 gate were absent
    assert(!rows.contains((0L, 10000L)))
  }

  test("ranks are contiguous and scores non-increasing per query") {
    val byQ = negs.select($"qid", $"rank", $"bm25")
      .as[(Long, Int, Double)].collect().groupBy(_._1)
    byQ.foreach { case (qid, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length),
        s"query $qid ranks not contiguous")
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3 >= b._3,
          s"query $qid scores increase at rank ${b._2}")
        case _ =>
      }
      assert(sorted.length <= 5)
    }
  }

  test("every negative shares a rare query term with its query") {
    val toks = corp
      .select($"doc_id", TextOps.tokens($"text").as("toks"))
      .as[(Long, Seq[String])].collect().toMap
    // recompute the rarest-5 term choice independently
    val df = toks.values.flatMap(_.distinct).groupBy(identity)
      .map { case (t, xs) => t -> xs.size }
    val rows = negs.select($"qid", $"neg_id").as[(Long, Long)].collect()
    rows.foreach { case (qid, neg) =>
      val qt = toks(qid).distinct.sortBy(t => (df(t), t)).take(5).toSet
      assert(toks(neg).exists(qt.contains),
        s"negative $neg shares no rare term with query $qid")
    }
  }
}
