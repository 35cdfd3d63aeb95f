package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Benchmark-decontamination specs: planted contamination at graded
  * overlap levels, the drop form, short-doc edge, and the broadcast
  * plan shape. */
class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  // eval doc: 10 tokens -> 6 distinct 5-shingles
  private val evalText = "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10"
  private def evalSet = Seq((100L, evalText)).toDF("doc_id", "text")

  private def corpus = Seq(
    (0L, evalText),                         // exact eval copy: 6/6
    (1L, "q1 q2 q3 q4 q5 q6 q7 n1 n2 n3"),  // prefix 7 tokens: shares
                                            // shingles at pos 1..3 -> 3/6
    (2L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10")  // clean: 0/6
  ).toDF("doc_id", "text")

  test("decontaminate reports exact graded overlap against the eval pool") {
    val rep = TextOps.decontaminate(corpus, evalSet, n = 5, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4)))
    assert(rep.toSeq == Seq(
      (0L, 6L, 6L, 1.0, true),
      (1L, 6L, 3L, 0.5, true),   // >= threshold is contaminated
      (2L, 6L, 0L, 0.0, false)))
  }

  test("threshold gates the flag, not the counts") {
    val rep = TextOps.decontaminate(corpus, evalSet, n = 5, threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getBoolean(4)))
    assert(rep.toSeq == Seq((0L, true), (1L, false), (2L, false)))
  }

  test("dropContaminated removes exactly the flagged documents") {
    val kept = TextOps.dropContaminated(corpus, evalSet, n = 5,
      threshold = 0.6).select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 2L))
  }

  test("documents shorter than n still participate (one truncated shingle)") {
    val shortCorpus = Seq((0L, "a b"), (1L, "c d")).toDF("doc_id", "text")
    val shortEval = Seq((9L, "a b")).toDF("doc_id", "text")
    val rep = TextOps.decontaminate(shortCorpus, shortEval, n = 5,
      threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(4)))
    assert(rep.toSeq == Seq((0L, 1L, 1L, true), (1L, 1L, 0L, false)))
  }

  test("plan probes the pool via broadcast — no corpus-side merge join") {
    val plan = TextOps.decontaminate(corpus, evalSet)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("decontaminateMulti attributes overlap per eval set") {
    val evals = Seq(
      (0L, evalText),                          // set 0: the q-shingles
      (1L, "r1 r2 r3 r4 r5 r6 r7 r8 r9 r10")   // set 1: the r-shingles
    ).toDF("eval_id", "text")
    val probe = Seq(
      (0L, evalText),                          // full hit on set 0 only
      (1L, "r1 r2 r3 r4 r5 r6 r7 n1 n2 n3"),   // 3/6 on set 1 only
      (2L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10")   // clean: absent
    ).toDF("doc_id", "text")
    val got = TextOps.decontaminateMulti(probe, evals, n = 5,
        threshold = 0.5)
      .as[(Long, Long, Long, Long, Double, Boolean)].collect().toSeq
    assert(got == Seq(
      (0L, 0L, 6L, 6L, 1.0, true),
      (1L, 1L, 6L, 3L, 0.5, true)))
    // single-set agreement with the mono-set operator
    val mono = TextOps.decontaminate(probe, evals.filter($"eval_id" === 0)
        .select($"eval_id".as("doc_id"), $"text"), n = 5, threshold = 0.5)
      .filter($"n_matched" > 0)
      .select($"doc_id", $"n_shingles", $"n_matched", $"overlap")
      .as[(Long, Long, Long, Double)].collect().toSeq
    val multi0 = got.filter(_._2 == 0L).map(r => (r._1, r._3, r._4, r._5))
    assert(mono == multi0)
  }
}
