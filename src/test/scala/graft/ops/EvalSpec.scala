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

  test("rocAuc: hand-computed tie case, extremes, degenerate groups") {
    import spark.implicits._
    val scored = Seq(
      // g1: scores 1,2,2,3 labels F,T,F,T — avg ranks 1, 2.5, 2.5, 4
      // R+ = 6.5 → AUC = (6.5 − 3)/(2·2) = 0.875
      ("g1", 1.0, false), ("g1", 2.0, true),
      ("g1", 2.0, false), ("g1", 3.0, true),
      // g2: perfect separation → 1.0
      ("g2", 0.1, false), ("g2", 0.2, false), ("g2", 0.9, true),
      // g3: perfectly wrong → 0.0
      ("g3", 0.9, false), ("g3", 0.1, true),
      // g4: every score tied → 0.5
      ("g4", 5.0, true), ("g4", 5.0, false), ("g4", 5.0, false),
      // g5: no negatives → NULL
      ("g5", 1.0, true), ("g5", 2.0, true)
    ).toDF("g", "score", "y")
    val out = Eval.rocAuc(scored, Seq("g"), "score", "y")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    assert(out("g1") === Some(0.875))
    assert(out("g2") === Some(1.0))
    assert(out("g3") === Some(0.0))
    assert(out("g4") === Some(0.5))
    assert(out("g5") === None)
    val g1 = Eval.rocAuc(scored, Seq("g"), "score", "y")
      .filter(col("g") === "g1").head()
    assert((g1.getLong(1), g1.getLong(2), g1.getLong(3)) == ((4L, 2L, 2L)))
  }

  test("averagePrecision: hand case, tie order, fixed-point bound, degenerate") {
    import spark.implicits._
    val scored = Seq(
      // g1 ranking by (score desc, id asc): T(3.0,#1) F(2.0,#2)
      // T(1.0,#3) → AP = (1/1 + 2/3)/2 = 5/6
      ("g1", 3.0, 1L, true), ("g1", 2.0, 2L, false), ("g1", 1.0, 3L, true),
      // g2: equal scores — id asc puts the positive FIRST → AP = 1
      ("g2", 5.0, 10L, true), ("g2", 5.0, 11L, false),
      // g3: no positives → NULL
      ("g3", 1.0, 20L, false)
    ).toDF("g", "score", "id", "y")
    val got = Eval.averagePrecision(scored, Seq("g"), "score", "y", "id")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(math.abs(got("g1").get - 5.0 / 6.0) <= math.pow(2, -20))
    assert(got("g2") === Some(1.0)) // 2^20/2^20 — exact
    assert(got("g3") === None)
    // fixed-point quantization bound vs exact-rational AP on a
    // pseudo-random ranking
    val rows = (1 to 200).map(i =>
      ("g", ((i * 7919) % 97).toDouble, i.toLong, (i * 104729) % 3 == 0))
    val ap = Eval.averagePrecision(rows.toDF("g", "score", "id", "y"),
      Seq("g"), "score", "y", "id").head().getDouble(3)
    val ranked = rows.sortBy(r => (-r._2, r._3))
    var cumPos = 0; var rank = 0; var total = 0.0; var nPos = 0
    ranked.foreach { r =>
      rank += 1
      if (r._4) { cumPos += 1; nPos += 1; total += cumPos.toDouble / rank }
    }
    val brute = total / nPos
    assert(math.abs(ap - brute) <= math.pow(2, -20) + 1e-12,
      s"ap=$ap brute=$brute")
  }

  test("classifierPr: confusion counts and NULL-guarded ratios") {
    import spark.implicits._
    val df = Seq(
      // g1: tp=2 fp=1 fn=1 tn=1 → P=2/3 R=2/3 F1=2/3
      ("g1", true, true), ("g1", true, true), ("g1", true, false),
      ("g1", false, true), ("g1", false, false),
      // g2: never predicts → precision NULL, recall 0
      ("g2", false, true), ("g2", false, false),
      // g3: perfect → all 1.0
      ("g3", true, true), ("g3", false, false)
    ).toDF("g", "pred", "y")
    val got = Eval.classifierPr(df, Seq("g"), "pred", "y")
      .collect().map(r => r.getString(0) -> r).toMap
    val g1 = got("g1")
    assert((g1.getLong(1), g1.getLong(2), g1.getLong(3), g1.getLong(4))
      == ((2L, 1L, 1L, 1L)))
    assert(g1.getAs[Double]("precision") == 2.0 / 3.0 &&
      g1.getAs[Double]("f1") == 2.0 / 3.0)
    assert(got("g2").isNullAt(5) && got("g2").getAs[Double]("recall") == 0.0)
    assert(got("g3").getAs[Double]("f1") == 1.0)
  }

  test("rocAuc equals brute-force pair counting on pseudo-random data") {
    import spark.implicits._
    val rows = (1 to 400).map { i =>
      val g = s"g${i % 3}"
      // deterministic pseudo-scores with many ties (11 levels)
      val score = ((i * 7919) % 11).toDouble
      val y = ((i * 104729) % 5) < 2
      (g, score, y)
    }
    val got = Eval.rocAuc(rows.toDF("g", "score", "y"),
      Seq("g"), "score", "y")
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val pos = rs.filter(_._3).map(_._2)
      val neg = rs.filterNot(_._3).map(_._2)
      val wins = (for (p <- pos; q <- neg)
        yield if (p > q) 1.0 else if (p == q) 0.5 else 0.0).sum
      assert(math.abs(got(g) - wins / (pos.size * neg.size)) < 1e-12, g)
    }
  }
}
