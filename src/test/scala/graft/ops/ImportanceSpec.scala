package graft.ops

import graft.SparkSpec

/** DSIR-style importance weights — the q127 oracle replays the full
  * arithmetic at corpus scale; these pin the semantics. */
class ImportanceSpec extends SparkSpec {
  import spark.implicits._

  test("target == raw collapses every weight to exactly 1.0") {
    // c_t(b) = c_r(b) and n_t = n_r for every bucket, so each
    // per-feature ratio is x/x = 1.0 (IEEE-exact), and the mean of
    // ones is 1.0 — a bit-level identity, not an approximation
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "delta epsilon"),
      (3L, "zeta")
    ).toDF("doc_id", "text")
    val got = Importance.importanceWeights(docs, docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._3).forall(_ == 1.0))
    // n_feats = unigrams + bigrams = 2·len − 1
    assert(got.map(x => (x._1, x._2)).toSeq ==
      Seq((1L, 5L), (2L, 3L), (3L, 1L)))
  }

  test("docs sharing the target's vocabulary outscore disjoint ones") {
    val target = Seq(
      (101L, "spark shuffle join broadcast partition"),
      (102L, "spark join partition shuffle codegen")
    ).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "spark shuffle join partition broadcast"), // target-like
      (2L, "banana apple cherry mango papaya"),       // disjoint
      (3L, "spark join codegen shuffle partition")    // target-like
    ).toDF("doc_id", "text")
    val w = Importance.importanceWeights(raw, target).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(w(1L) > w(2L) && w(3L) > w(2L))
  }

  test("importanceResample: exactly k systematic picks, tilted " +
       "toward the target domain") {
    val target = Seq(
      (901L, "spark shuffle join broadcast partition codegen"),
      (902L, "spark join partition shuffle broadcast exchange"))
      .toDF("doc_id", "text")
    // half the raw corpus is target-like, half vocabulary-disjoint
    val raw = ((1L to 20L).map(i =>
        (i, "spark shuffle join broadcast partition exchange")) ++
      (21L to 40L).map(i =>
        (i, "banana apple cherry mango papaya guava")))
      .toDF("doc_id", "text")
    val got = Importance.importanceResample(raw, target, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    // Madow's method: multiplicities sum to exactly k
    assert(got.map(_._2).sum == 10L)
    // the target-like half outweighs the disjoint half in the sample
    val (likeT, notT) = got.partition(_._1 <= 20L)
    assert(likeT.map(_._2).sum > notT.map(_._2).sum)
  }

  test("weights are partitioning-invariant (ordered fold, not " +
       "parallel sum)") {
    val target = Seq((201L, "aa bb cc dd"), (202L, "bb cc dd ee"))
      .toDF("doc_id", "text")
    val raw = (1L to 30L).map(i => (i, s"aa bb tok$i cc dd ee ff$i"))
      .toDF("doc_id", "text")
    val a = Importance.importanceWeights(raw, target).collect().toSeq
    val b = Importance.importanceWeights(raw.repartition(7), target)
      .collect().toSeq
    assert(a == b)
  }
}
