package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Specs for the pretraining-pipeline ops added in round 4: sequence
  * packing, vocabulary building, weighted corpus interleave. */
class TextPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "en", "a b c d"),          // 4 tokens
    (1L, "en", "a b c d e f"),      // 6
    (2L, "en", "a b"),              // 2
    (3L, "en", "a b c d e"),        // 5
    (4L, "en", "a"),                // 1
    (5L, "de", "x y z"),            // 3
    (6L, "de", "x y"),              // 2
    (7L, "de", "x")                 // 1
  ).toDF("doc_id", "lang", "text")

  test("packSequences follows the streaming-fill rule per shard") {
    // shards=1 so the fill order is just doc_id order per lang;
    // budget=6: en cumsum(excl) = 0,4,10,12,17 -> bins 0,0,1,2,2
    val out = TextOps.packSequences(docs, budget = 6L, shards = 1)
      .collect().map(r => (r.getString(0), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.toSeq == Seq(
      ("de", 0L, 3L, 6L, 5L, 7L),            // all de docs, 6 tokens
      ("en", 0L, 2L, 10L, 0L, 1L),           // docs 0,1 (overflow tail)
      ("en", 1L, 1L, 2L, 2L, 2L),
      ("en", 2L, 2L, 6L, 3L, 4L)))
    // every bin except a group's last starts because the budget was
    // consumed: its exclusive start total is >= bin * budget
    out.groupBy(_._1).foreach { case (_, bins) =>
      assert(bins.map(_._2).sorted.toSeq == bins.indices.map(_.toLong))
    }
  }

  test("packMaterialize concatenates each bin in packing order") {
    val out = TextOps.packMaterialize(docs, budget = 6L, shards = 1,
        sep = " | ")
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
    // same bin assignment as the q59 spec above; each bin's members
    // concatenate in id (packing) order
    assert(out.toSeq == Seq(
      ("de", 0L, 3L, 6L, "x y z | x y | x"),
      ("en", 0L, 2L, 10L, "a b c d | a b c d e f"),
      ("en", 1L, 1L, 2L, "a b"),
      ("en", 2L, 2L, 6L, "a b c d e | a")))
  }

  test("collocations: fixed pair outranks frequent-word pair; exact lift") {
    // "new york" always adjacent (5x, rare words); "the end" also 5x
    // but "the" is everywhere, so its lift is 3x lower; every other
    // bigram varies per doc (the trailing x$i breaks the "york ..."
    // and "end ..." chains)
    val d = (1L to 5L).map { i =>
      (i, s"the a$i new york x$i the b$i the end y$i")
    }.toDF("doc_id", "text")
    val got = TextOps.collocations(d, k = 10, minCount = 5)
      .as[(Long, String, Long, Long, Long, Double)].collect().toSeq
    assert(got.map(_._2) == Seq("new york", "the end"))
    val ny = got.head
    // N = 5 docs x 10 tokens = 50; c(new)=c(york)=5
    assert(ny._3 == 5L && ny._4 == 5L && ny._5 == 5L)
    assert(ny._6 == 5.0 * 50.0 / (5.0 * 5.0))
    // "the end": c(the)=15, c(end)=5 -> 3x lower lift, ranked after
    val te = got(1)
    assert(te._4 == 15L && te._6 == 5.0 * 50.0 / (15.0 * 5.0))
    assert(ny._6 > te._6)
  }

  test("packSequences shards bound the window partitions") {
    val out = TextOps.packSequences(docs, budget = 4L, shards = 4)
    // doc_id % 4 spreads en's 5 docs over 4 independent streams
    assert(out.select("shard").distinct().count() == 4)
    // token totals are conserved across the sharding
    assert(out.agg(sum("n_tokens")).head().getLong(0) == 24L)
  }

  test("buildVocab ranks by count desc then token, contiguous ids") {
    val out = TextOps.buildVocab(docs, minCount = 3L)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    // counts: a=5, b=4, c=3, d=3, x=3, (e=2, f=1, y=2, z=1 pruned)
    assert(out.toSeq == Seq((1, "a", 5L), (2, "b", 4L), (3, "c", 3L),
      (4, "d", 3L), (5, "x", 3L)))
  }

  test("ppsSample picks proportional to weight, libm-free deterministic") {
    // one stratum, weights 1,1,1,1,96 (total 100), k=4 -> step 25:
    // grid points 25,50,75,100 all land inside the heavy doc's
    // interval (4,100] -> it is picked 4 times, light docs never
    val docs = Seq((1L, "en", 1L), (2L, "en", 1L), (3L, "en", 1L),
      (4L, "en", 1L), (5L, "en", 96L)).toDF("doc_id", "lang", "w")
    val out = TextOps.ppsSample(docs, k = 4, weightCol = "w")
      .collect().map(r => (r.getLong(1), r.getLong(3))).toSeq
    assert(out == Seq((5L, 4L)))
    // balanced weights -> one pick per doc
    val even = Seq((1L, "en", 10L), (2L, "en", 10L), (3L, "en", 10L),
      (4L, "en", 10L)).toDF("doc_id", "lang", "w")
    val picks = TextOps.ppsSample(even, k = 4, weightCol = "w")
      .collect().map(r => (r.getLong(1), r.getLong(3))).toSeq
    assert(picks == Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L)))
    // total picks per stratum == k (grid has k points on (0, total])
    val real = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
    val sums = TextOps.ppsSample(real, k = 8, weightCol = "n_chars")
      .groupBy("lang").agg(sum("n_picks").as("s"))
      .select("s").as[Long].collect()
    assert(sums.nonEmpty && sums.forall(s => s >= 7 && s <= 9),
      s"per-stratum picks should be ~k: ${sums.toSeq}")
    // deterministic: same input -> identical sample
    val a = TextOps.ppsSample(real, 8, "n_chars").collect().map(_.toSeq)
    val b = TextOps.ppsSample(real, 8, "n_chars").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("piiScrub redacts emails then digit runs, counts for audit") {
    val pii = Seq(
      (1L, "mail a.b+c@ex-1.co and 12345678 done"),
      (2L, "short 12345 stays; 123456 goes"),
      (3L, "two bob@x.io carol@y.org"),
      (4L, "clean text")
    ).toDF("doc_id", "text")
    val out = TextOps.piiScrub(pii).collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == (("mail <EMAIL> and <NUM> done", 1L, 1L)))
    // 5-digit run is below the threshold, 6-digit run is redacted
    assert(out(2L) == (("short 12345 stays; <NUM> goes", 0L, 1L)))
    assert(out(3L) == (("two <EMAIL> <EMAIL>", 2L, 0L)))
    assert(out(4L) == (("clean text", 0L, 0L)))
    // idempotent: scrubbing scrubbed text changes nothing
    val scrubbed = TextOps.piiScrub(pii)
      .select($"doc_id", $"scrubbed".as("text"))
    val twice = TextOps.piiScrub(scrubbed).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(twice.view.mapValues(v => (v._1, v._2, v._3)).toMap ==
      out.map { case (k, (s, _, _)) => k -> ((s, 0L, 0L)) })
  }

  test("weightedInterleave honors proportions and is deterministic") {
    val mix = TextOps.weightedInterleave(docs,
      Map("en" -> 0.5, "de" -> 0.25), k = 6)
    val rows = mix.collect().map(r =>
      (r.getInt(0), r.getLong(1), r.getString(2)))
    // vft: en ranks 1..5 -> 2,4,6,8,10; de ranks 1..3 -> 4,8,12
    // merged (ties lang asc): en@2, de@4, en@4, en@6, de@8, en@8
    assert(rows.toSeq == Seq(
      (1, 0L, "en"), (2, 5L, "de"), (3, 1L, "en"),
      (4, 2L, "en"), (5, 6L, "de"), (6, 3L, "en")))
    // 2:1 weight ratio -> 4 en / 2 de in the first 6
    assert(rows.count(_._3 == "en") == 4 && rows.count(_._3 == "de") == 2)
    // sources without a weight are excluded
    val noZh = TextOps.weightedInterleave(docs, Map("de" -> 1.0), k = 10)
    assert(noZh.select("lang").distinct().as[String].collect().toSeq == Seq("de"))
  }

  test("scoreQuantileNorm: per-group ranks make one threshold fair") {
    // source a scores high (0.6-0.9), source b low (0.1-0.4): a global
    // 0.5 cutoff would keep all of a, none of b; per-group pct_rank
    // drops exactly the bottom 20% of EACH
    val scored = Seq(
      (1L, "a", 0.6), (2L, "a", 0.7), (3L, "a", 0.8), (4L, "a", 0.85),
      (5L, "a", 0.9), (10L, "b", 0.1), (11L, "b", 0.2), (12L, "b", 0.3),
      (13L, "b", 0.35), (14L, "b", 0.4)
    ).toDF("doc_id", "source", "score")
    val got = TextOps.scoreQuantileNorm(scored, dropFrac = 0.2)
      .as[(Long, String, Double, Double, Boolean)].collect().toSeq
    val dropped = got.filter(!_._5).map(_._1)
    assert(dropped == Seq(1L, 10L)) // each group's single worst (rank 0)
    // pct_rank is (rank-1)/(n-1): 0, .25, .5, .75, 1 within each group
    assert(got.filter(_._2 == "a").map(_._4) ==
      Seq(0.0, 0.25, 0.5, 0.75, 1.0))
    // ties break by id: equal scores get distinct ranks
    val tied = Seq((1L, "a", 0.5), (2L, "a", 0.5), (3L, "a", 0.5))
      .toDF("doc_id", "source", "score")
    val tr = TextOps.scoreQuantileNorm(tied, dropFrac = 0.4)
      .as[(Long, String, Double, Double, Boolean)].collect().toSeq
    assert(tr.map(_._4) == Seq(0.0, 0.5, 1.0))
    intercept[IllegalArgumentException] {
      TextOps.scoreQuantileNorm(scored, dropFrac = 1.0)
    }
    // a singleton group survives outright — its pct_rank is 0.0, and
    // annihilating a one-document source is the opposite of fairness
    val withSingle = Seq((1L, "a", 0.9), (2L, "a", 0.1), (3L, "b", 0.5))
      .toDF("doc_id", "source", "score")
    val ws = TextOps.scoreQuantileNorm(withSingle, dropFrac = 0.5)
      .as[(Long, String, Double, Double, Boolean)].collect().toSeq
    assert(ws.find(_._1 == 3L).get._5)  // singleton kept
    assert(!ws.find(_._1 == 2L).get._5) // two-doc group still gated
  }

  test("curationV3: stages compose into a complete, consistent manifest") {
    val docs = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
    val got = TextOps.curationV3(docs, dropFrac = 0.2,
        evalFracs = Seq("test" -> 0.1, "val" -> 0.1),
        weights = Seq("src0" -> 0.22, "src1" -> 0.06, "src2" -> 0.02),
        maxEpochs = 2)
      .as[(Long, String, String, String, Long)].collect().toSeq
    // exactly one decision per input doc, from the closed domain
    assert(got.size == docs.count())
    assert(got.map(_._4).toSet ==
      Set("dropped_quality", "test", "val", "train"))
    // uniform 25-doc sources: pct_rank >= 0.2 keeps ranks 6..25 →
    // exactly 5 dropped per source, 100 of 500
    assert(got.count(_._4 == "dropped_quality") == 100)
    // per-source drop is balanced (the reason this op exists)
    assert(got.filter(_._4 == "dropped_quality").groupBy(_._2)
      .forall(_._2.size == 5))
    // epochs only in train, only for listed sources, bounded by cap
    val listed = Set("src0", "src1", "src2")
    assert(got.filter(_._4 != "train").forall(_._5 == 0L))
    assert(got.filter(r => r._4 == "train" && !listed(r._2))
      .forall(_._5 == 0L))
    // listed train docs carry 0..maxEpochs appearances — 0 means "in
    // the mix universe but under the source's target" (the q104 cap
    // semantics); the totals check below pins the exact allocation
    val trainListed = got.filter(r => r._4 == "train" && listed(r._2))
    assert(trainListed.nonEmpty && trainListed.exists(_._5 >= 1L) &&
      trainListed.forall(_._5 <= 2L))
    // mix totals reconcile with the stage-3 arithmetic: per source,
    // sum(n_epochs) == min(floor(|train|·w + 0.5), maxEpochs·inv)
    val nTrain = got.count(_._4 == "train").toDouble
    val bySrc = trainListed.groupBy(_._2)
    for ((src, w) <- Seq("src0" -> 0.22, "src1" -> 0.06, "src2" -> 0.02);
         rows <- bySrc.get(src)) {
      val target = math.min(math.floor(nTrain * w + 0.5).toLong,
        2L * rows.size)
      assert(rows.map(_._5).sum == target, s"$src mix total")
    }
  }
}
