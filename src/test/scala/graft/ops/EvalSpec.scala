package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EvalSpec extends SparkSpec {
  import spark.implicits._

  /** 8 vectors in 4 dims, two labels; geometry chosen so label-0
    * queries retrieve label-0 neighbors first. */
  private def labeled() = {
    val rows = Seq(
      // label 0 cluster near e1
      (0L, Seq(1.0f, 0.1f, 0.0f, 0.0f), 0),
      (1L, Seq(0.9f, 0.2f, 0.0f, 0.0f), 0),
      (2L, Seq(1.0f, 0.0f, 0.1f, 0.0f), 0),
      (3L, Seq(0.8f, 0.1f, 0.1f, 0.0f), 0),
      // label 1 cluster near e3 (first dim kept nonzero: dimAblation
      // prefixes must have nonzero norm — see its scaladoc)
      (4L, Seq(-0.01f, 0.0f, 1.0f, 0.1f), 1),
      (5L, Seq(-0.1f, 0.0f, 0.9f, 0.2f), 1),
      (6L, Seq(-0.02f, 0.1f, 1.0f, 0.0f), 1),
      (7L, Seq(-0.1f, 0.0f, 0.8f, 0.1f), 1))
    rows.toDF("vec_id", "embedding", "label")
  }

  test("retrievalEval: clean clusters give perfect metrics") {
    val emb = labeled()
    val out = Eval.retrievalEval(emb, emb.filter(col("vec_id") < 2), k = 3)
      .collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getAs[Long]("n_rel") == 3)
      assert(r.getAs[Long]("hits") == 3)       // all top-3 same-label
      assert(r.getAs[Double]("mrr") == 1.0)    // first result relevant
      assert(r.getAs[Double]("precision_at_k") == 1.0)
      // all relevant → dcg == idcg → ndcg exactly 1
      assert(r.getAs[Double]("ndcg") == 1.0)
    }
  }

  test("retrievalEval: metrics degrade with a planted irrelevant hit") {
    // query 0 with k=7 must see all 4 label-1 docs (irrelevant):
    // hits=3 (its own cluster minus self), precision=3/7
    val emb = labeled()
    val out = Eval.retrievalEval(emb, emb.filter(col("vec_id") === 0), 7)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("hits") == 3)
    assert(r.getAs[Double]("precision_at_k") == 3.0 / 7.0)
    assert(r.getAs[Double]("mrr") == 1.0) // nearest is still label 0
    val ndcg = r.getAs[Double]("ndcg")
    assert(ndcg > 0.9 && ndcg < 1.0 + 1e-12,
      s"relevant docs rank 1-3 of 7 → high but imperfect-or-1 ndcg=$ndcg")
  }

  test("retrievalEval: mrr=0 when nothing relevant is retrievable") {
    // single member of label 2 → n_rel=0, idcg=0 → ndcg=0, mrr=0
    val emb = labeled().unionByName(
      Seq((8L, Seq(0.5f, 0.5f, 0.5f, 0.5f), 2)).toDF(
        "vec_id", "embedding", "label"))
    val r = Eval.retrievalEval(emb, emb.filter(col("vec_id") === 8), 3)
      .collect().head
    assert(r.getAs[Long]("n_rel") == 0)
    assert(r.getAs[Long]("hits") == 0)
    assert(r.getAs[Double]("mrr") == 0.0)
    assert(r.getAs[Double]("dcg") == 0.0)
    assert(r.getAs[Double]("ndcg") == 0.0)
  }

  test("discounts match the DCG definition and render round-trip") {
    val d = Eval.discounts(3)
    assert(d.head == 1.0) // 1/log2(2)
    assert(math.abs(d(1) - 1.0 / (math.log(3) / math.log(2))) == 0.0)
    d.foreach(x =>
      assert(java.lang.Double.parseDouble(Eval.fmtDouble(x)) == x))
  }

  test("dimAblation: full width has recall 1, prefix degrades or ties") {
    // make dim 1 carry ALL the signal so a 1-dim prefix ties full
    val emb = labeled()
    val out = Eval.dimAblation(emb, emb.filter(col("vec_id") < 4), k = 2,
      dims = Seq(1, 4))
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(out(4).getAs[Double]("recall") == 1.0)
    assert(out(4).getAs[Long]("possible") == 8)
    val r1 = out(1).getAs[Double]("recall")
    assert(r1 >= 0.0 && r1 <= 1.0)
    // deterministic
    val again = Eval.dimAblation(emb, emb.filter(col("vec_id") < 4), 2,
      Seq(1, 4)).collect().map(r => r.getInt(0) -> r.getAs[Double]("recall"))
      .toMap
    assert(again(1) == r1 && again(4) == 1.0)
  }

  test("calibrationReport: perfectly calibrated bins have gap 0; Σ ece_term = ECE") {
    import spark.implicits._
    // bin 2 (p=0.25): 1 of 4 positive, mean_pred 0.25 → gap 0
    // bin 7 (p=0.75): 3 of 4 positive, mean_pred 0.75 → gap 0
    val pred = (0 until 8).map(i =>
      (i.toLong, if (i < 4) 0.25 else 0.75)).toDF("doc_id", "clf_prob")
    val truth = (0 until 8).map(i =>
      (i.toLong, i == 0 || i > 4)).toDF("doc_id", "passes")
    val out = Eval.calibrationReport(pred, truth)
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(out.keySet === Set(2, 7))
    assert(out(2).getAs[Long]("n") === 4)
    assert(out(2).getAs[Double]("frac_pos") === 0.25)
    assert(out(2).getAs[Double]("mean_pred") === 0.25)
    assert(out(2).getAs[Double]("gap") === 0.0)
    assert(out(7).getAs[Double]("gap") === 0.0)
    assert(out.values.map(_.getAs[Double]("ece_term")).sum === 0.0)
  }

  test("calibrationReport: miscalibrated bin reports its gap, weighted by mass") {
    import spark.implicits._
    // all predictions 0.95 but only half positive → gap ≈ 0.45
    val pred = (0 until 10).map(i => (i.toLong, 0.95))
      .toDF("doc_id", "clf_prob")
    val truth = (0 until 10).map(i => (i.toLong, i % 2 == 0))
      .toDF("doc_id", "passes")
    val out = Eval.calibrationReport(pred, truth).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getInt(0) === 9)
    assert(math.abs(r.getAs[Double]("gap") - 0.45) < 1e-9)
    // single bin holds all mass → ece_term == gap
    assert(r.getAs[Double]("ece_term") === r.getAs[Double]("gap"))
  }

  test("calibrationReport: p = 1.0 clamps into the top bin") {
    import spark.implicits._
    val pred = Seq((1L, 1.0), (2L, 0.0)).toDF("doc_id", "clf_prob")
    val truth = Seq((1L, true), (2L, false)).toDF("doc_id", "passes")
    val bins = Eval.calibrationReport(pred, truth)
      .collect().map(_.getInt(0)).toSet
    assert(bins === Set(0, 9))
  }
}
