package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  def docs: DataFrame = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),   // near-dup of 1
    (3L, "completely different content about spark engines"),
    (4L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
    (5L, "a b")                                            // shorter than shingle
  ).toDF("doc_id", "text")

  test("shingles: 3-word windows; short docs yield one shingle") {
    val sh = docs.filter($"doc_id" === 1)
      .select(TextOps.shingles($"text", 3).as("s")).head().getSeq[String](0)
    assert(sh.head == "the quick brown")
    assert(sh.last == "the lazy dog")
    assert(sh.length == 7)
    val short = docs.filter($"doc_id" === 5)
      .select(TextOps.shingles($"text", 3).as("s")).head().getSeq[String](0)
    assert(short == Seq("a b"))
  }

  test("exactByHash keeps the smallest doc_id per distinct text") {
    val kept = Dedup.exactByHash(docs).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(1L, 2L, 3L, 5L)) // 4 dropped (dup of 1)
  }

  test("minHash near-dup: 1~2 similar, 3 unrelated") {
    val sim = Dedup.jaccardVerify(
      Dedup.minHashCandidates(docs), docs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(sim.contains((1L, 4L)) && sim((1L, 4L)) == 1.0)
    assert(sim.get((1L, 2L)).forall(_ > 0.5))  // if candidate, high sim
    assert(!sim.contains((1L, 3L)) || sim((1L, 3L)) < 0.2)
  }

  test("minHashDedup drops exact and near duplicates, keeps the rest") {
    val kept = Dedup.minHashDedup(docs, threshold = 0.8)
      .collect().map(_.getLong(0)).toSeq
    assert(kept.contains(3L) && kept.contains(5L) && kept.contains(1L))
    assert(!kept.contains(4L))  // exact dup has jaccard 1.0
  }

  test("minHashDedup ≡ exact shingle-Jaccard dedup on real testdata") {
    // end-to-end recall of the LSH stack against the brute-force
    // baseline MEASURING THE SAME QUANTITY (3-shingle Jaccard — the
    // item family the signature hashes). This is the assertion that
    // would have caught both round-4 finds: the degenerate affine
    // permutations (no mod) and the token-set/shingle verify
    // mismatch.
    val real = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
    val ids = real.select("doc_id")
    val allPairs = ids.select($"doc_id".as("id_a"))
      .crossJoin(ids.select($"doc_id".as("id_b")))
      .filter($"id_a" < $"id_b")
    val dupExact = Dedup.jaccardVerify(allPairs, real, shingleLen = 3)
      .filter($"jaccard" >= 0.8).select($"id_b".as("doc_id")).distinct()
    val exact = ids.join(dupExact, Seq("doc_id"), "left_anti")
      .orderBy("doc_id").as[Long].collect().toSeq
    val lsh = Dedup.minHashDedup(real).as[Long].collect().toSeq
    assert(lsh == exact, s"LSH missed ${exact.size - lsh.size} vs exact")
    assert(exact.size < 500, "corpus must contain real shingle near-dups")
  }

  test("simHashDedup ≡ brute-force Hamming dedup (exhaustive 4-block index)") {
    // inject exact copies (Hamming 0) plus the corpus's own texts;
    // maxHamming ≤ 3 makes the block index exhaustive, so agreement
    // with the all-pairs baseline is a guarantee, not a recall bet
    val real = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")
    val corpus = real.unionByName(real.filter($"doc_id" % 25 === 0)
      .select(($"doc_id" + 10000).as("doc_id"), $"text"))
    val sigs = corpus.select($"doc_id", Dedup.simHash($"text").as("sig"))
    val a = sigs.select($"doc_id".as("id_a"), $"sig".as("sa"))
    val b = sigs.select($"doc_id".as("id_b"), $"sig".as("sb"))
    val dupExact = a.crossJoin(b).filter($"id_a" < $"id_b")
      .filter(bit_count($"sa".bitwiseXOR($"sb")) <= 3)
      .select($"id_b".as("doc_id")).distinct()
    val exact = corpus.select("doc_id").join(dupExact, Seq("doc_id"), "left_anti")
      .orderBy("doc_id").as[Long].collect().toSeq
    val indexed = Dedup.simHashDedup(corpus).as[Long].collect().toSeq
    assert(indexed == exact)
    assert(exact.size < corpus.count(), "corpus must contain Hamming dups")
  }

  test("codegen'd simHash equals the composable column model") {
    // the aggregate/zip_with formulation the expression replaced,
    // kept here as the independent model
    def model(text: org.apache.spark.sql.Column) = {
      val masks = array((0 until 64).map(i => lit(1L << i)): _*)
      val contrib = aggregate(
        TextOps.tokens(text), array_repeat(lit(0L), 64),
        (acc, t) => {
          val h = xxhash64(t)
          zip_with(acc, masks,
            (a, m) => a + when(h.bitwiseAND(m) =!= 0, 1L).otherwise(-1L))
        })
      aggregate(
        zip_with(contrib, masks, (c, m) => when(c > 0, m).otherwise(0L)),
        lit(0L), (acc, x) => acc.bitwiseOR(x))
    }
    val real = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
    val diff = real.select(Dedup.simHash($"text").as("got"),
        model($"text").as("want"))
      .filter($"got" =!= $"want").count()
    assert(diff == 0, s"$diff docs disagree with the model")
  }

  test("simHash: identical texts equal; near-dups close in Hamming") {
    val sigs = docs.select($"doc_id", Dedup.simHash($"text").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(4L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(1L), sigs(2L)) < ham(sigs(1L), sigs(3L)))
  }

  test("jaccardTopPairs ranks the exact dup first") {
    val top = Dedup.jaccardTopPairs(docs, 3).head()
    assert((top.getLong(0), top.getLong(1), top.getDouble(2)) == (1L, 4L, 1.0))
  }

  test("minHashDedup collapses a mass-duplicate flood larger than maxBucket") {
    // 120 identical docs (> maxBucket=50) + 2 distinct ones: the
    // oversized bucket falls back to star pairs, so the flood still
    // verifies against its canonical min id and dedups to one doc.
    val flood = ((1L to 120L).map(i => (i, "copy pasta boilerplate text repeated again and again")) ++
      Seq((200L, "a genuinely unique document about spark engines"),
          (201L, "another unrelated text with different words entirely")))
      .toDF("doc_id", "text")
    val kept = Dedup.minHashDedup(flood, threshold = 0.9)
      .collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(1L, 200L, 201L))
  }

  test("langId picks the language with most marker hits") {
    val d = Seq(
      (1L, "der hund und die katze", "de"),
      (2L, "the cat of the house and a dog", "en"))
      .toDF("doc_id", "text", "lang")
    val out = TextOps.langId(d).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "de", 2L -> "en"))
  }

  test("quality + token stats arithmetic") {
    val d = Seq((1L, "the cat sat")).toDF("doc_id", "text")
    val q = TextOps.qualityScore(d).head()
    assert(q.getLong(1) == 3)                       // tokens
    assert(q.getLong(2) == 1)                       // "the"
    assert(q.getDouble(4) == 3.0)                   // (11-2)/3
    val t = TextOps.tokenStats(d).head()
    assert(t.getLong(1) == 3 && t.getLong(2) == 11)
  }

  test("fingerprint: identical docs share it, different docs do not") {
    val fp = TextOps.fingerprint(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(4L))
    assert(fp(1L) != fp(3L))
  }

  // --- containment dedup -----------------------------------------

  private def containDocs = Seq(
    // doc 2 is a strict prefix of doc 1 (doc-inside-doc): its
    // shingle set is fully contained, but Jaccard is only ~0.3
    (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16"),
    (2L, "w1 w2 w3 w4 w5 w6 w7"),
    // doc 3: disjoint
    (3L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10"),
    // docs 4/5: identical text -> equal sets, tie -> min id survives
    (4L, "t1 t2 t3 t4 t5 t6"),
    (5L, "t1 t2 t3 t4 t5 t6")
  ).toDF("doc_id", "text")

  test("containmentDedup drops the contained doc that Jaccard misses") {
    val kept = Dedup.containmentDedup(containDocs, threshold = 0.8)
      .as[Long].collect().toSeq
    assert(kept == Seq(1L, 3L, 4L))
    // the same corpus under Jaccard-0.8 dedup keeps doc 2: the
    // doc-inside-doc case is structurally invisible to Jaccard
    val jkept = Dedup.minHashDedup(containDocs, threshold = 0.8)
      .as[Long].collect().toSeq
    assert(jkept.contains(2L))
  }

  test("normalizedExactDedup collapses case/punct variants to min id") {
    val d = Seq(
      (1L, "Hello, World!"),
      (2L, "hello world"),
      (3L, "HELLO   WORLD"),
      (4L, "a different document"),
      (5L, "A DIFFERENT document?!")
    ).toDF("doc_id", "text")
    val kept = TextOps.normalizedExactDedup(d).as[Long].collect().toSeq
    assert(kept == Seq(1L, 4L))
    // plain exact dedup keeps all 5 — the variants are invisible to it
    assert(Dedup.exactByHash(d).count() == 5)
  }

  test("crossSourceDups counts near-dup pairs per source pair") {
    val base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    val d = Seq(
      // cross-source near-dup (A x B)
      (1L, base, "A"), (2L, base + " x1", "B"),
      // within-source near-dup (A x A)
      (3L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10", "A"),
      (4L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10 z11", "A"),
      // unrelated
      (5L, "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10", "C")
    ).toDF("doc_id", "text", "source")
    val got = Dedup.crossSourceDups(d)
      .as[(String, String, Long)].collect().toSeq
    assert(got == Seq(("A", "A", 1L), ("A", "B", 1L)))
  }

  test("fingerprintMd5: equal texts collide, disjoint texts don't, edit-robust case") {
    // NOTE the min-k SELECTION is hash-dependent (which shingles hash
    // lowest differs between md5 and xxhash64), so the two variants'
    // doc partitions legitimately differ on borderline pairs — the
    // invariants are per-variant: identical text ⇒ identical
    // fingerprint, distinct content ⇒ distinct, and a doc whose edit
    // leaves the min-k shingle set untouched keeps its fingerprint
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val d = Seq(
      (1L, base), (2L, base),
      (3L, (100 to 140).map(i => s"zzz$i").mkString(" "))
    ).toDF("doc_id", "text")
    val fp = TextOps.fingerprintMd5(d).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(1L) === fp(2L))
    assert(fp(1L) !== fp(3L))
    // exact_hash distinguishes the identical pair from a true clone
    // only by doc_id — both carry the same md5(text)
    val eh = TextOps.fingerprintMd5(d).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(eh(1L) === eh(2L))
  }

  test("exactJaccardJoin finds every qualifying pair (vs brute force)") {
    // VARIED lengths (8..19 tokens): exercises the smaller-side
    // probing and the |A| <= |B| <= |A|/θ size band of
    // jaccardCandidates, not just the prefix
    val d = (1L to 30L).map { i =>
      val len = 8 + (i % 12).toInt
      val toks = (0 until len).map(j => s"w${(i * 7 + j * 3) % 40}")
      (i, toks.mkString(" "))
    }.toDF("doc_id", "text")
    for (theta <- Seq(0.4, 0.5, 0.8)) {
      val got = Dedup.exactJaccardJoin(d, threshold = theta)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val sets = d.select(col("doc_id"),
        graft.functions.TextExpressions.sorted_distinct_shingles(
          TextOps.tokens(col("text")), 3).as("sh"))
        .as[(Long, Seq[String])].collect().toMap
      val want = (for {
        a <- sets.keys; b <- sets.keys if a < b
        inter = sets(a).toSet.intersect(sets(b).toSet).size
        if inter.toDouble /
          (sets(a).size + sets(b).size - inter) >= theta
      } yield (a, b)).toSet
      assert(got == want, s"theta=$theta")
      assert(want.nonEmpty, s"theta=$theta degenerate corpus")
    }
  }

  test("exactJaccardJoin links exact duplicates and respects the size band") {
    // identical docs (J=1, equal sizes — the n_a==n_b probe path) and
    // a doc pair past the size band (J provably < θ) on one corpus
    val d = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d e f g h"),              // exact dup of 1
      (3L, "a b c d e f g h i j k l m n o p q r s t u v w x y z " +
           "aa bb cc dd ee ff gg hh"))       // superset, way past 1/θ
      .toDF("doc_id", "text")
    val got = Dedup.exactJaccardJoin(d, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
  }

  test("containment prefix filter is lossless vs brute-force pairs") {
    // corpus with graded overlaps so candidates are non-trivial
    val d = (1L to 30L).map { i =>
      val toks = (0 until 12).map(j => s"w${(i * 7 + j * 3) % 40}")
      (i, toks.mkString(" "))
    }.toDF("doc_id", "text")
    for (theta <- Seq(0.5, 0.8)) {
      val got = Dedup.containmentPairs(d, threshold = theta)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      // brute force: all pairs, exact shingle containment
      val sets = d.select(col("doc_id"),
        graft.functions.TextExpressions.sorted_distinct_shingles(
          TextOps.tokens(col("text")), 3).as("sh"))
        .as[(Long, Seq[String])].collect().toMap
      val want = (for {
        a <- sets.keys; b <- sets.keys if a != b
        inter = sets(a).toSet.intersect(sets(b).toSet).size
        if inter.toDouble / sets(a).size >= theta
      } yield (a, b)).toSet
      assert(got == want, s"theta=$theta")
    }
  }

  test("tripletMine: anchors need BOTH a positive and a band negative") {
    import spark.implicits._
    // A: 12 tokens (10 shingles); B = A minus first token (9 shared
    // shingles, J(A,B) = 9/10); C = A's first 7 tokens (5 shingles,
    // J(A,C) = 5/10, J(B,C) = 4/10); D unrelated
    val a = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11 t12"
    val docs = Seq(
      (1L, a),
      (2L, a.split(' ').drop(1).mkString(" ")),
      (3L, a.split(' ').take(7).mkString(" ")),
      (4L, "u1 u2 u3 u4 u5 u6 u7 u8")
    ).toDF("doc_id", "text")
    val out = Dedup.tripletMine(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    // anchors 1 and 2 have positive (each other) + negative (3);
    // 3 has only band partners (no positive), 4 has nothing
    assert(out.map(_._1).toSeq == Seq(1L, 2L))
    val byAnchor = out.map(t => t._1 -> t).toMap
    assert(byAnchor(1L)._2 == 2L && byAnchor(1L)._3 == 3L)
    assert(byAnchor(1L)._4 == 0.9 && byAnchor(1L)._5 == 0.5)
    assert(byAnchor(2L)._2 == 1L && byAnchor(2L)._3 == 3L)
    assert(byAnchor(2L)._5 == 0.4)
  }

  test("jaccardHistogram on real docs reconciles with C(n,2)") {
    val docs = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter($"doc_id" < 200).select($"doc_id", $"text")
    val n = docs.count()
    val got = Dedup.jaccardHistogram(docs)
      .as[(Double, Long)].collect().toSeq
    assert(got.map(_._2).sum == n * (n - 1) / 2)
    assert(got.map(_._1) == got.map(_._1).sorted) // ascending buckets
    assert(got.forall(r => r._1 >= 0.0 && r._1 <= 1.0))
  }

  test("jaccardHistogram buckets every pair once, exact dups at 1.0") {
    // token sets: {a b c d}, {a b c d} (exact dup -> j=1),
    // {a b x y} (j=2/6 with the first two), {p q r s} (j=0)
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b c d"), (3L, "a b x y"), (4L, "p q r s")
    ).toDF("doc_id", "text")
    val got = Dedup.jaccardHistogram(docs, buckets = 20)
      .as[(Double, Long)].collect().toSeq
    // 6 pairs total: (1,2) j=1 -> bucket 1.0; (1,3),(2,3) j=1/3 ->
    // floor(6.66)=6 -> 0.3; (1,4),(2,4),(3,4) j=0 -> 0.0
    assert(got == Seq((0.0, 3L), (0.3, 2L), (1.0, 1L)))
    assert(got.map(_._2).sum == 6L) // every pair counted exactly once
  }
}
