package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Specs for the r6 quality/dedup additions: duplicated-span audit
  * (TextOps.dupSpans), the Gopher rule battery (TextOps.gopherRules),
  * and quality-policy cluster dedup (Components.componentDedupBest).
  */
class QualitySpansSpec extends SparkSpec {
  import spark.implicits._

  // --- dupSpans -------------------------------------------------

  private def spanDocs = Seq(
    // doc 1 and 2 share the exact 10-token prefix -> with k=8 the
    // 3 windows at positions 0..2 are duplicated in both docs
    (1L, "a b c d e f g h i j unique1 x1 y1 z1"),
    (2L, "a b c d e f g h i j unique2 x2 y2 z2"),
    // doc 3: no overlap with anyone
    (3L, "p q r s t u v w aa bb cc dd"),
    // doc 4: shorter than k=8 tokens -> zero windows
    (4L, "s1 s2 s3"),
    // doc 5: internal repeat of one window (distinct-per-doc rule
    // counts it once, and it is NOT cross-document duplicated)
    (5L, "m1 m2 m3 m4 m5 m6 m7 m8 m1 m2 m3 m4 m5 m6 m7 m8")
  ).toDF("doc_id", "text")

  test("dupSpans counts cross-document duplicated windows exactly") {
    val got = TextOps.dupSpans(spanDocs, k = 8, minDf = 2, flagRatio = 0.4)
      .as[(Long, Long, Long, Double, Boolean)].collect().toSeq
    // doc 1/2: 14 tokens -> 7 windows each, 3 shared (positions 0-2)
    assert(got(0) == ((1L, 7L, 3L, 3.0 / 7, true)))
    assert(got(1) == ((2L, 7L, 3L, 3.0 / 7, true)))
    // doc 3: 12 tokens -> 5 windows, none duplicated
    assert(got(2) == ((3L, 5L, 0L, 0.0, false)))
    // doc 4: too short -> zero windows, ratio 0, not flagged
    assert(got(3) == ((4L, 0L, 0L, 0.0, false)))
    // doc 5: 16 tokens -> 9 windows, 2 distinct repeats of the same
    // 8 distinct window strings... positions 0..8 give 9 windows of
    // which "m1..m8" appears twice (pos 0 and 8) -> 8 distinct; none
    // occur in another doc
    assert(got(4) == ((5L, 8L, 0L, 0.0, false)))
  }

  test("dupSpans window frequency is by distinct documents") {
    // the shared window appears TWICE in doc 10 but only once across
    // other docs -> df counts documents (2), not occurrences (3)
    val docs = Seq(
      (10L, "w1 w2 w3 w4 w5 w6 w7 w8 filler w1 w2 w3 w4 w5 w6 w7 w8"),
      (11L, "w1 w2 w3 w4 w5 w6 w7 w8 other11 other12 other13")
    ).toDF("doc_id", "text")
    val got = TextOps.dupSpans(docs, k = 8, minDf = 3, flagRatio = 0.5)
      .as[(Long, Long, Long, Double, Boolean)].collect()
    // with minDf=3 nothing qualifies: per-doc distinct windows cap
    // the count at 2 documents
    assert(got.forall(_._3 == 0L))
  }

  // --- gopherRules ----------------------------------------------

  test("gopherRules verdicts and first-failing reject reason") {
    val docs = Seq(
      // passes everything: 23 tokens, mean len 90/23 ~ 3.91 in
      // [3.5, 10], five stopword hits, 22/23 distinct
      (1L, "the quick brown fox jumps over a lazy dog and then runs " +
        "far away to the deep green forest before dusk settles in"),
      // too short (5 tokens) AND no stopwords -> first reason wins
      (2L, "alpha beta gamma delta epsilon"),
      // mean word length too small: mostly 1-char tokens
      (3L, "a " * 12 + "the b c d e f g h i j k l"),
      // repetition: spam token 29x (distinct ratio 3/31 < 0.35);
      // two stopwords so the earlier stopword rule passes
      (4L, "the a " + ("spam " * 29).trim),
      // no stopwords but otherwise healthy -> stopword reason
      (5L, "alpha1 beta2 gamma3 delta4 epsilon5 zeta6 eta7 theta8 " +
        "iota9 kappa0 lambda1 mu2")
    ).toDF("doc_id", "text")
    val got = TextOps.gopherRules(docs,
        minTokens = 10, maxTokens = 90, minMeanLen = 3.5)
      .select("doc_id", "passes", "reject_reason")
      .as[(Long, Boolean, Option[String])].collect().toSeq
    assert(got(0) == ((1L, true, None)))
    assert(got(1) == ((2L, false, Some("word_count"))))
    assert(got(2) == ((3L, false, Some("word_len"))))
    assert(got(3) == ((4L, false, Some("repetition"))))
    assert(got(4) == ((5L, false, Some("stopword"))))
  }

  // --- componentDedupBest ---------------------------------------

  test("componentDedupBest keeps the argmax-score member per cluster") {
    val ids = (1L to 10L).toDF("doc_id")
    // clusters {1,2,3} (chain) and {7,8}; 4,5,6,9,10 unpaired
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("src", "dst")
    // scores: 3 wins its cluster; 7/8 tie -> min id 7 wins
    val scores = Seq((1L, 5L), (2L, 9L), (3L, 11L), (7L, 4L), (8L, 4L))
      .toDF("doc_id", "score")
    val got = Components.componentDedupBest(ids, pairs, scores)
      .as[Long].collect().toSeq
    assert(got == Seq(3L, 4L, 5L, 6L, 7L, 9L, 10L))
  }

  test("componentDedupBest with equal scores reduces to componentDedup") {
    val ids = (1L to 6L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (4L, 5L)).toDF("src", "dst")
    val flat = ids.select(col("doc_id"), lit(1L).as("score"))
    val best = Components.componentDedupBest(ids, pairs, flat)
      .as[Long].collect().toSeq
    val min = Components.componentDedup(ids, pairs)
      .as[Long].collect().toSeq
    assert(best == min)
  }

  // --- curateCorpusV2 -------------------------------------------

  test("curateCorpusV2 chains rule gate, longest-of-cluster, sampling") {
    // healthy 30-token base text with stopwords and high diversity
    def words(seed: Int, n: Int): String =
      (0 until n).map(i => s"word${seed}x$i").mkString(" ")
    val healthy = "the quick brown fox jumps over a lazy dog and "
    val docs = Seq(
      // near-dup pair: 2 is 1 plus a longer tail -> SAME shingle core,
      // Jaccard >= 0.8, and 2 is longer so the quality policy keeps 2
      // (min-id policy would keep 1)
      (1L, "en", healthy + words(1, 20)),
      (2L, "en", healthy + words(1, 20) + " tailextra"),
      // rule-gate reject: token soup with no stopwords never reaches
      // the cluster or sampling stages
      (3L, "en", words(3, 30)),
      // healthy unpaired docs in a second stratum
      (4L, "fr", healthy + words(4, 20)),
      (5L, "fr", healthy + words(5, 20))
    ).toDF("doc_id", "lang", "text")
    val got = TextOps.curateCorpusV2(docs, budget = 4)
      .as[(String, Long, Long)].collect().toSeq
    val sampled = got.map(_._2).toSet
    // doc 3 rejected by the rule gate; doc 1 dropped as the SHORTER
    // member of its near-dup cluster
    assert(!sampled.contains(3L) && !sampled.contains(1L))
    assert(sampled.contains(2L))
    // strata: en has 1 survivor, fr has 2; sqrt weights 1 and
    // sqrt(2) -> targets floor(4*1/2.414+0.5)=2 (capped by the 1
    // available) and floor(4*1.414/2.414+0.5)=2
    assert(got.count(_._1 == "en") == 1)
    assert(got.count(_._1 == "fr") == 2)
  }

  test("curationManifest labels every doc and agrees with curateCorpusV2") {
    def words(seed: Int, n: Int): String =
      (0 until n).map(i => s"word${seed}x$i").mkString(" ")
    val healthy = "the quick brown fox jumps over a lazy dog and "
    val docs = Seq(
      (1L, "en", healthy + words(1, 20)),
      (2L, "en", healthy + words(1, 20) + " tailextra"),
      (3L, "en", words(3, 30)), // no stopwords -> rule reject
      (4L, "fr", healthy + words(4, 20)),
      (5L, "fr", healthy + words(5, 20))
    ).toDF("doc_id", "lang", "text")
    val manifest = TextOps.curationManifest(docs, budget = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getString(2), Option(r.getString(3)))).toMap
    assert(manifest.keySet == Set(1L, 2L, 3L, 4L, 5L)) // total function
    assert(manifest(3L) == ("rejected_rule", Some("stopword")))
    assert(manifest(1L)._1 == "near_dup") // shorter member lost
    assert(manifest(2L)._1 == "kept")
    // the manifest's kept set IS the q81 sample
    val sampled = TextOps.curateCorpusV2(docs, budget = 4)
      .select("doc_id").as[Long].collect().toSet
    val kept = manifest.collect { case (id, ("kept", _)) => id }.toSet
    assert(kept == sampled)
  }

  test("qualityClassifier: monotone in stopwords, prob in (0,1), " +
    "label tracks the sign") {
    val docs = Seq(
      (1L, "the a of and is to the a of and is to"), // all stopwords
      (2L, "the quick brown fox jumps over a lazy dog again today"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa")
    ).toDF("doc_id", "text")
    val out = TextOps.qualityClassifier(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getString(3))).toMap
    assert(out.values.forall { case (_, p, _) => p > 0.0 && p < 1.0 })
    // stopword weight dominates: all-stopword > mixed > none
    assert(out(1L)._1 > out(2L)._1 && out(2L)._1 > out(3L)._1)
    assert(out.values.forall { case (s, _, l) =>
      (s >= 0.0) == (l == "keep") })
    // rational sigmoid is exactly (s/(1+|s|)+1)/2
    out.values.foreach { case (s, p, _) =>
      assert(p == (s / (1.0 + math.abs(s)) + 1.0) * 0.5) }
  }

  // --- spanScrub ------------------------------------------------

  test("spanScrub drops later duplicate blocks, keeps first occurrence") {
    val docs = Seq(
      // doc 1: 2 full blocks (k=4) + remainder "i j"
      (1L, "a b c d e f g h i j"),
      // doc 2: first block equals doc 1's first block -> dropped;
      // second block is novel -> kept
      (2L, "a b c d n1 n2 n3 n4"),
      // doc 3: shorter than k -> untouched, zero blocks
      (3L, "s1 s2 s3"),
      // doc 4: internal repeat -> second instance dropped
      (4L, "m1 m2 m3 m4 m1 m2 m3 m4 tail1")
    ).toDF("doc_id", "text")
    val got = TextOps.spanScrub(docs, k = 4)
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "a b c d e f g h i j", 2L, 0L),
      (2L, "n1 n2 n3 n4", 2L, 1L),
      (3L, "s1 s2 s3", 0L, 0L),
      (4L, "m1 m2 m3 m4 tail1", 2L, 1L)))
  }

  test("spanScrub keeps surviving blocks in original order") {
    val docs = Seq(
      (1L, "x1 x2 x3 x4"),
      // doc 2: blocks [dup, novel, dup-of-own-first, novel] + rem
      (2L, "x1 x2 x3 x4 k1 k2 k3 k4 k1 k2 k3 k4 k5 k6 k7 k8 r1")
    ).toDF("doc_id", "text")
    val got = TextOps.spanScrub(docs, k = 4)
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "x1 x2 x3 x4", 1L, 0L),
      (2L, "k1 k2 k3 k4 k5 k6 k7 k8 r1", 4L, 2L)))
  }

  test("spanScrub is idempotent") {
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d z1 z2 z3 z4")
    ).toDF("doc_id", "text")
    val once = TextOps.spanScrub(docs, k = 4)
      .select(col("doc_id"), col("text"))
    val twice = TextOps.spanScrub(once, k = 4)
      .select(col("doc_id"), col("text"))
    assert(once.collect().toSeq == twice.collect().toSeq)
  }

  // --- budgetSelect ---------------------------------------------

  private def budgetDocs = Seq(
    (1L, "the cat sat on the mat and it is a fine day to nap"),
    (2L, "zz yy xx ww vv uu tt ss rr qq"),
    (3L, "the quick brown fox jumps over a lazy dog of the farm"),
    (4L, "one two three"),
    (5L, "the a of and is to the a of and is to")
  ).toDF("doc_id", "text")

  test("budgetSelect equals the local greedy over classifier scores") {
    val scores = TextOps.qualityClassifier(budgetDocs).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val nTok = TextOps.tokenStats(budgetDocs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // local reference: (score desc, id asc), keep while cum <= budget
    val budget = 30L
    val order = scores.toSeq.sortBy { case (id, s) => (-s, id) }
    val expected = order.scanLeft((0L, 0L, 0L)) {
      case ((_, _, cum), (id, _)) => (id, nTok(id), cum + nTok(id))
    }.drop(1).takeWhile(_._3 <= budget)
      .map { case (id, n, cum) => (id, scores(id), n, cum) }
    val got = TextOps.budgetSelect(budgetDocs, budget).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == expected)
    assert(got.nonEmpty && got.last._4 <= budget)
  }

  test("budgetSelect is bucket-count invariant (exact prefix sum)") {
    val one = TextOps.budgetSelect(budgetDocs, 40L, buckets = 1)
      .collect().toSeq
    val many = TextOps.budgetSelect(budgetDocs, 40L, buckets = 4096)
      .collect().toSeq
    assert(one == many)
  }

  test("budgetSelect: budget below the best doc selects nothing") {
    assert(TextOps.budgetSelect(budgetDocs, 2L).count() == 0L)
  }
}
