package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bloom-filter membership + bloom-prefiltered exact dedup, int8
  * quantization, temperature resampling, and rational-idf TF-IDF. */
class BloomQuantizeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")

  test("bloom has no false negatives: every inserted text might-contain") {
    val bloom = Bloom.build(docs, $"text")
    val flags = Bloom.mightContain(docs, $"text", bloom, "doc_id")
    assert(flags.filter(!$"might_contain").count() == 0)
  }

  test("bloom prefilter screens out novel texts (fp rate < 1%)") {
    val bloom = Bloom.build(docs, $"text")
    val novel = docs.select($"doc_id",
      concat($"text", lit(" utterly novel suffix "),
        $"doc_id".cast("string")).as("text"))
    val fp = Bloom.mightContain(novel, $"text", bloom, "doc_id")
      .filter($"might_contain").count()
    assert(fp.toDouble / docs.count() < 0.01, s"$fp false positives")
  }

  test("dedupAgainstCorpus ≡ plain exact rule on a salted shard") {
    // same salt as q72: exact corpus dups, novel docs, within-shard dups
    val shard = docs.filter($"doc_id" % 10 === 3)
      .select(($"doc_id" + 1000000).as("doc_id"), $"text")
      .unionByName(docs.filter($"doc_id" % 10 === 7)
        .select(($"doc_id" + 2000000).as("doc_id"),
          concat($"text", lit(" shardnew "), $"doc_id".cast("string"))
            .as("text")))
      .unionByName(docs.filter($"doc_id" % 10 === 7)
        .select(($"doc_id" + 3000000).as("doc_id"),
          concat($"text", lit(" shardnew "), $"doc_id".cast("string"))
            .as("text")))
    val kept = Bloom.dedupAgainstCorpus(docs, shard)
      .as[Long].collect().toSet
    // plain rule, no bloom: anti-join on corpus text + min-id-per-text
    val inCorpus = shard.join(docs.select($"text"), Seq("text"), "left_semi")
      .select($"doc_id")
    val withinKeep = shard.groupBy($"text").agg(min($"doc_id").as("doc_id"))
    val expected = shard.select($"doc_id")
      .join(inCorpus, Seq("doc_id"), "left_anti")
      .join(withinKeep.select($"doc_id"), Seq("doc_id"), "left_semi")
      .as[Long].collect().toSet
    assert(kept == expected)
    // non-vacuous: both drop branches and the survivor branch fire
    assert(kept.nonEmpty && kept.forall(id => id >= 2000000 && id < 3000000))
    assert(shard.count() > kept.size)
  }

  test("int8 quantization: reconstruction error ≤ scale/2, range bound") {
    val emb = graft.io.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = Quantize.int8(emb)
    val joined = q.join(
      emb.select($"vec_id",
        transform($"embedding", _.cast("double")).as("orig")), "vec_id")
    val bad = joined.select(
      exists(zip_with($"q", $"orig",
        (qi, vi) => abs(qi.cast("double") * $"scale" - vi) >
          $"scale" / 2 + lit(1e-12)),
        x => x).as("bad"))
      .filter($"bad").count()
    assert(bad == 0, s"$bad vectors violate the error bound")
    val outOfRange = q.select(
      exists($"q", x => abs(x) > 127).as("oor")).filter($"oor").count()
    assert(outOfRange == 0)
  }

  test("quantized cosine preserves near-neighbor ranking on real vectors") {
    val emb = graft.io.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val exact = Similarity.bruteForceTopK(emb, emb.filter($"vec_id" < 10), 5)
    val deq = Quantize.dequantize(Quantize.int8(emb))
      .select($"vec_id", $"v".as("embedding"))
    val approx = Similarity.bruteForceTopK(deq, deq.filter($"vec_id" < 10), 5)
    val recall = Similarity.recallAtK(exact, approx)
    assert(recall >= 0.9, s"int8 recall@5 = $recall")
  }

  test("temperatureSample: α=0.5 targets and deterministic selection") {
    val all = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = TextOps.temperatureSample(all, budget = 100)
    val perLang = out.groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // replay the target arithmetic in scala (same IEEE ops)
    val counts = all.groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    val s = counts.map { case (_, n) => math.sqrt(n.toDouble) }
      .foldLeft(0.0)(_ + _)
    counts.foreach { case (lang, n) =>
      val target = math.floor(100.0 * math.sqrt(n.toDouble) / s + 0.5).toLong
      assert(perLang.getOrElse(lang, 0L) == math.min(target, n),
        s"$lang: got ${perLang.getOrElse(lang, 0L)}, want $target (n=$n)")
    }
    // α=0.5 up-weights small languages: the largest lang's sampled
    // share must sit below its raw corpus share
    val (bigLang, bigN) = counts.maxBy(_._2)
    val sampled = perLang.values.sum.toDouble
    assert(perLang(bigLang) / sampled < bigN.toDouble / all.count(),
      "temperature mixing must down-weight the dominant language")
    // reruns identical (md5 order, no randomness)
    assert(out.collect().toSeq ==
      TextOps.temperatureSample(all, budget = 100).collect().toSeq)
  }

  test("tfIdfTopTerms: ubiquitous terms lose to rare ones") {
    val d = Seq(
      (1L, "spark spark spark the the engine"),
      (2L, "the engine runs the query"),
      (3L, "the query planner rewrites the query")
    ).toDF("doc_id", "text")
    val out = TextOps.tfIdfTopTerms(d, k = 2).collect()
    // doc 1: spark (tf=3, df=1 → 9.0) far above the (tf=2, df=3 → 2.0)
    val top1 = out.filter(_.getLong(0) == 1L).map(_.getString(2)).toSeq
    assert(top1.head == "spark")
    // doc 2: runs (tf=1, df=1 → 3.0) outranks the (tf=2, df=3 → 2.0)
    val top2 = out.filter(_.getLong(0) == 2L).map(_.getString(2)).toSeq
    assert(top2.head == "runs")
    // the corpus-wide stopword never tops any document
    assert(!out.filter(_.getLong(1) == 1L).map(_.getString(2))
      .contains("the"))
    // rank is dense per doc and capped at k
    assert(out.groupBy(_.getLong(0)).forall { case (_, rs) =>
      rs.map(_.getLong(1)).sorted.toSeq == (1L to rs.length).toSeq &&
        rs.length <= 2
    })
  }

  test("bigramLmScore: corpus-typical transitions outscore rare ones") {
    val d = Seq(
      (1L, "a b a b a b"),   // all transitions common
      (2L, "a b x y")        // b→x and x→y are one-offs
    ).toDF("doc_id", "text")
    val out = TextOps.bigramLmScore(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // c(a b)=4, c(b a)=2, c(b x)=1, c(x y)=1; c(a·)=4, c(b·)=3, c(x·)=1
    val exp1 = (4.0 / 4 + 2.0 / 3 + 4.0 / 4 + 2.0 / 3 + 4.0 / 4) / 5
    val exp2 = (4.0 / 4 + 1.0 / 3 + 1.0 / 1) / 3
    assert(out(1L)._1 == 5L && out(2L)._1 == 3L)
    assert(math.abs(out(1L)._2 - exp1) < 1e-12)
    assert(math.abs(out(2L)._2 - exp2) < 1e-12)
    assert(out(1L)._2 > out(2L)._2)
  }

  test("sourceReport: totals reconcile and fractions are bounded") {
    val all = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
    val rep = TextOps.sourceReport(all).collect()
    assert(rep.map(_.getLong(1)).sum == all.count())
    rep.foreach { r =>
      val shortFrac = r.getDouble(r.fieldIndex("short_frac"))
      assert(shortFrac >= 0.0 && shortFrac <= 1.0)
      assert(r.getDouble(r.fieldIndex("avg_tokens")) > 0.0)
    }
  }

  test("perplexityBucketSample buckets by fluency and keeps per-frac") {
    // 9 scored docs -> ntile(3) buckets of 3; fracs 1.0/0.5/0.0 keep
    // 3 / floor(1.5+0.5)=2 / 0
    val docs = (1L to 9L).map { i =>
      // graded fluency: low ids repeat corpus-typical transitions
      val tok = if (i <= 3) ("a b " * 6).trim
                else if (i <= 6) s"a b c$i d$i"
                else s"x$i y$i z$i w$i"
      (i, tok.trim)
    }.toDF("doc_id", "text")
    val got = TextOps.perplexityBucketSample(docs)
      .as[(Long, Double, Long, Boolean)].collect().toSeq
    assert(got.size == 9)
    val byBucket = got.groupBy(_._3)
    assert(byBucket.keySet == Set(1L, 2L, 3L))
    assert(byBucket.values.forall(_.size == 3))
    // fluency ordering across buckets (non-strict under ties)
    assert(byBucket(1L).map(_._2).min >= byBucket(2L).map(_._2).max)
    assert(byBucket(2L).map(_._2).min >= byBucket(3L).map(_._2).max)
    // keep counts per bucket
    assert(byBucket(1L).count(_._4) == 3)
    assert(byBucket(2L).count(_._4) == 2)
    assert(byBucket(3L).count(_._4) == 0)
    // deterministic
    val again = TextOps.perplexityBucketSample(docs)
      .as[(Long, Double, Long, Boolean)].collect().toSeq
    assert(got == again)
  }

  test("mixtureSample: explicit weights, availability cap, exclusion") {
    val docs = (1L to 30L).map { i =>
      val src = if (i <= 5) "a" else if (i <= 20) "b" else "c"
      (i, src)
    }.toDF("doc_id", "source")
    // budget 20: a -> floor(20*0.5+0.5)=10 capped at 5; b -> 10 of 15
    val got = TextOps.mixtureSample(docs,
        Seq("a" -> 0.5, "b" -> 0.5), budget = 20)
      .as[(String, Long, Long)].collect().toSeq
    val bySrc = got.groupBy(_._1)
    assert(bySrc("a").size == 5 && bySrc("b").size == 10)
    assert(!bySrc.contains("c")) // unlisted source excluded
    // ranks contiguous from 1 within each source
    assert(bySrc("a").map(_._3).sorted == (1L to 5L))
    assert(bySrc("b").map(_._3).sorted == (1L to 10L))
    intercept[IllegalArgumentException] {
      TextOps.mixtureSample(docs, Seq("a" -> 0.5, "a" -> 0.5), 10)
    }
  }

  test("epochMixture: full epochs, fractional top-up, maxEpochs cap") {
    val docs = (1L to 30L).map { i =>
      val src = if (i <= 5) "a" else if (i <= 20) "b" else "c"
      (i, src)
    }.toDF("doc_id", "source")
    // budget 60, maxEpochs 3:
    //   a (n=5):  floor(60*0.5+0.5)=30 capped at 3*5=15 -> 3 full epochs
    //   b (n=15): floor(60*0.3+0.5)=18 -> 1 full epoch + 3 top-ups
    //   c (n=10): floor(60*0.1+0.5)=6  -> fractional only (6 of 10)
    val got = TextOps.epochMixture(docs,
        Seq("a" -> 0.5, "b" -> 0.3, "c" -> 0.1),
        budget = 60L, maxEpochs = 3)
      .as[(String, Long, Long, Long)].collect().toSeq
    val bySrc = got.groupBy(_._1)
    assert(bySrc("a").size == 15 && bySrc("b").size == 18 &&
      bySrc("c").size == 6)
    // a: every doc appears exactly 3 times, epochs 1..3
    assert(bySrc("a").groupBy(_._2).forall {
      case (_, rows) => rows.map(_._3).sorted == Seq(1L, 2L, 3L) })
    // b: every doc at least once; exactly the 3 smallest md5 ranks
    // appear twice (epoch 2)
    val bEpochs = bySrc("b").groupBy(_._2).map {
      case (id, rows) => id -> rows.map(_._3).max }
    assert(bEpochs.values.count(_ == 2L) == 3)
    assert(bEpochs.values.count(_ == 1L) == 12)
    val topUps = bySrc("b").filter(_._3 == 2L).map(_._4)
    assert(topUps.forall(_ <= 3L)) // top-ups are the lowest ranks
    // c: single epoch, 6 selected, ranks contiguous
    assert(bySrc("c").forall(_._3 == 1L))
    assert(bySrc("c").map(_._4).sorted == (1L to 6L))
    // total rows per source == its (capped) target, deterministic
    val again = TextOps.epochMixture(docs,
        Seq("a" -> 0.5, "b" -> 0.3, "c" -> 0.1),
        budget = 60L, maxEpochs = 3)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == again)
  }

  test("quality-weighted PPS: exactly k grid picks per stratum") {
    val docs = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
    val weighted = docs.select($"lang", $"doc_id")
      .join(TextOps.qualityClassifier(docs).select($"doc_id",
        floor($"clf_prob" * 1000000.0).cast("long").as("qw")), "doc_id")
    val out = TextOps.ppsSample(weighted, k = 8, weightCol = "qw")
    val perLang = out.groupBy("lang")
      .agg(sum("n_picks").as("picks")).as[(String, Long)]
      .collect().toMap
    assert(perLang.values.forall(_ == 8L))
    // weights reflect the classifier: every pick carries a positive
    // integer weight derived from a probability in (0, 1)
    val ws = out.select("weight").as[Long].collect()
    assert(ws.forall(w => w > 0 && w < 1000000L))
  }

  test("mixtureSampleTokens greedily fills token targets") {
    // source a: 4 docs x 4 tokens; source b: 2 docs x 2 tokens;
    // source c unlisted
    val docs = Seq(
      (1L, "a1 a2 a3 a4", "a"), (2L, "a5 a6 a7 a8", "a"),
      (3L, "a9 aa ab ac", "a"), (4L, "ad ae af ag", "a"),
      (10L, "b1 b2", "b"), (11L, "b3 b4", "b"),
      (20L, "c1 c2 c3", "c")
    ).toDF("doc_id", "text", "source")
    // budget 20: a target = floor(20*0.5+0.5) = 10 tokens -> greedy
    // fill takes docs until the running total BEFORE a doc reaches
    // 10: two 4-token docs (cum 8 < 10 before the third -> third
    // kept too, crossing to 12); b target = 10 -> exhausts both docs
    val got = TextOps.mixtureSampleTokens(docs,
        Seq("a" -> 0.5, "b" -> 0.5), tokenBudget = 20)
      .as[(String, Long, Long, Long)].collect().toSeq
    val bySrc = got.groupBy(_._1)
    assert(bySrc("a").size == 3)           // 4+4 then the crossing doc
    assert(bySrc("a").map(_._3).sum == 12) // overshoot < 1 doc
    assert(bySrc("b").size == 2)           // underfill: inventory out
    assert(bySrc("b").map(_._3).sum == 4)
    assert(!bySrc.contains("c"))
    // cum_tokens is the running sum in selection order
    assert(bySrc("a").map(_._4).sorted == Seq(4L, 8L, 12L))
  }

  test("sourceVocabOverlap: exact Jaccard matrix incl. zero-overlap " +
       "pair") {
    import spark.implicits._
    val docs = Seq(
      (1L, "w x y", "s1"), (2L, "x y z", "s1"),   // s1 vocab {w,x,y,z}
      (3L, "x y q", "s2"),                        // s2 vocab {x,y,q}
      (4L, "m n", "s3")                           // s3 vocab {m,n}
    ).toDF("doc_id", "text", "source")
    val got = TextOps.sourceVocabOverlap(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == Seq(
      ("s1", "s2", 4L, 3L, 2L, 2.0 / 5),
      ("s1", "s3", 4L, 2L, 0L, 0.0),
      ("s2", "s3", 3L, 2L, 0L, 0.0)))
  }
}
