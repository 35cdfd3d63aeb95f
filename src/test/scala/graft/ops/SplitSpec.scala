package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Specs for deterministic dataset splitting (ops.Split): md5
  * bucketing arithmetic, stability, and the leakage-safe variant's
  * family-as-unit guarantee.
  */
class SplitSpec extends SparkSpec {
  import spark.implicits._

  private val W = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  private def md5hex8(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 8)

  private def expectedSplit(id: Long, salt: String = "graft"): String = {
    val h = md5hex8(s"$salt:$id")
    if (h < "cccccccc") "train" else if (h < "e6666666") "val" else "test"
  }

  test("hashSplit matches the md5 threshold arithmetic exactly") {
    val df = (0L until 500L).toDF("doc_id")
    val got = Split.hashSplit(df, W).as[(Long, String)].collect().toMap
    (0L until 500L).foreach { id =>
      assert(got(id) == expectedSplit(id), s"id=$id")
    }
  }

  test("hashSplit fractions approximate the weights") {
    val df = (0L until 5000L).toDF("doc_id")
    val counts = Split.hashSplit(df, W).groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(math.abs(counts("train") / 5000.0 - 0.8) < 0.03)
    assert(math.abs(counts("val") / 5000.0 - 0.1) < 0.02)
    assert(math.abs(counts("test") / 5000.0 - 0.1) < 0.02)
  }

  test("hashSplit is stable under corpus growth and salt re-rolls it") {
    val small = (0L until 100L).toDF("doc_id")
    val big = (0L until 1000L).toDF("doc_id")
    val s1 = Split.hashSplit(small, W).as[(Long, String)].collect().toMap
    val s2 = Split.hashSplit(big, W).as[(Long, String)].collect().toMap
    s1.foreach { case (id, sp) => assert(s2(id) == sp) }
    val reRolled = Split.hashSplit(small, W, salt = "other")
      .as[(Long, String)].collect().toMap
    assert(s1.exists { case (id, sp) => reRolled(id) != sp })
  }

  test("hashSplit rejects bad weights") {
    val df = (0L until 5L).toDF("doc_id")
    intercept[IllegalArgumentException] {
      Split.hashSplit(df, Seq("a" -> 0.5, "b" -> 0.4))
    }
    intercept[IllegalArgumentException] {
      Split.hashSplit(df, Seq("a" -> 0.5, "a" -> 0.5))
    }
  }

  test("leakageSafeSplit keeps near-dup families in one split") {
    // 1/2/3 form a near-dup chain (1~2, 2~3); 10/11 are another
    // family; 20 is a singleton
    val base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    val docs = Seq(
      (1L, base),
      (2L, base + " x1"),
      (3L, base + " x1 x2"),
      (10L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10"),
      (11L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10 z11"),
      (20L, "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10")
    ).toDF("doc_id", "text")
    val got = Split.leakageSafeSplit(docs, W)
      .as[(Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // family members share group_id = min member id and the split
    assert(got(1L)._1 == 1L && got(2L)._1 == 1L && got(3L)._1 == 1L)
    assert(got(1L)._2 == got(2L)._2 && got(2L)._2 == got(3L)._2)
    assert(got(10L)._1 == 10L && got(11L)._1 == 10L)
    assert(got(10L)._2 == got(11L)._2)
    // singleton hashes on itself -> identical to plain hashSplit
    assert(got(20L)._1 == 20L && got(20L)._2 == expectedSplit(20L))
    // family split is the hash of the canonical id
    assert(got(1L)._2 == expectedSplit(1L))
    assert(got(10L)._2 == expectedSplit(10L))
  }

  test("splitLeakageAudit: leakageSafeSplit audits clean, hashSplit may not") {
    // many near-dup families -> under a naive per-doc hash split at
    // least one family straddles splits with high probability; the
    // leakage-safe split must audit zero off-diagonal pairs
    val docs = (0 until 40).flatMap { f =>
      val base = (0 until 12).map(j => s"fam${f}_w$j").mkString(" ")
      Seq((f * 10L, base), (f * 10L + 1L, base + s" extra$f"))
    }.toDF("doc_id", "text")
    val safe = Split.leakageSafeSplit(docs, W)
      .select("doc_id", "split")
    val safeAudit = Split.splitLeakageAudit(docs, safe)
      .as[(String, String, Long)].collect().toSeq
    assert(safeAudit.forall { case (a, b, _) => a == b })
    // the naive split leaks on this corpus (40 families, ~36% chance
    // each straddles): total pairs reconcile either way
    val naiveAudit = Split.splitLeakageAudit(docs,
        Split.hashSplit(docs.select("doc_id"), W))
      .as[(String, String, Long)].collect().toSeq
    assert(naiveAudit.map(_._3).sum == safeAudit.map(_._3).sum)
    assert(naiveAudit.exists { case (a, b, _) => a != b })
  }

  test("leakageSafeSplit on a dup-free corpus equals hashSplit") {
    val docs = (1L to 20L).map { i =>
      (i, (0 until 10).map(j => s"t${i}_$j").mkString(" "))
    }.toDF("doc_id", "text")
    val a = Split.leakageSafeSplit(docs, W)
      .select("doc_id", "split").as[(Long, String)].collect().toSeq
    val b = Split.hashSplit(docs.select("doc_id"), W)
      .as[(Long, String)].collect().toSeq
    assert(a == b)
  }

  // --- epochOrder ---------------------------------------------------

  test("epochOrder: shards are key ranges, epochs decorrelate, " +
       "assignment is stable") {
    val ids = (1L to 400L).toDF("doc_id")
    val e1 = Split.epochOrder(ids, shards = 4, epoch = 1)
      .as[(Long, String, String)].collect().toSeq
    // every doc appears once, shards partition the key space: the
    // global shuffle_key order IS (shard, within-shard key) order
    assert(e1.map(_._1).sorted == (1L to 400L))
    assert(e1.sortBy(_._2).map(_._1) == e1.map(_._1))
    // near-equal shard sizes (binomial noise around 100)
    val sizes = e1.groupBy(_._3).view.mapValues(_.size)
    assert(sizes.size == 4 && sizes.values.forall(s => s > 60 && s < 140))
    // a different epoch is a genuinely different permutation...
    val e2 = Split.epochOrder(ids, shards = 4, epoch = 2)
      .as[(Long, String, String)].collect().toSeq
    assert(e1.map(_._1) != e2.map(_._1))
    // ...but each epoch's own assignment is deterministic
    assert(Split.epochOrder(ids, shards = 4, epoch = 1)
      .as[(Long, String, String)].collect().toSeq == e1)
    // non-power-of-two shard counts are rejected (inexact weights)
    intercept[IllegalArgumentException] {
      Split.epochOrder(ids, shards = 6, epoch = 1)
    }
  }

  test("stratifiedSplit: exact per-stratum counts incl. tiny stratum") {
    val docs = ((1L to 10L).map(i => (i, "a")) ++
      (21L to 23L).map(i => (i, "b"))).toDF("doc_id", "lang")
    val got = Split.stratifiedSplit(docs,
        Seq("test" -> 0.2, "val" -> 0.3), strataCols = Seq("lang"))
      .as[(Long, String, String, Long)].collect().toSeq
    val byStratum = got.groupBy(_._2)
    // a (n=10): test floor(2.5)=2, val floor(3.5)=3, train 5
    val aCounts = byStratum("a").groupBy(_._3).view.mapValues(_.size).toMap
    assert(aCounts == Map("test" -> 2, "val" -> 3, "train" -> 5))
    // b (n=3): test floor(1.1)=1, val floor(1.4)=1, train 1 — the
    // tiny stratum a hash split can easily leave eval-empty
    val bCounts = byStratum("b").groupBy(_._3).view.mapValues(_.size).toMap
    assert(bCounts == Map("test" -> 1, "val" -> 1, "train" -> 1))
    // rank ranges are disjoint and ordered: test gets the lowest
    // md5 ranks, then val, then train
    val aByRank = byStratum("a").sortBy(_._4)
    assert(aByRank.map(_._3) == Seq("test", "test", "val", "val", "val",
      "train", "train", "train", "train", "train"))
    // deterministic
    val again = Split.stratifiedSplit(docs,
        Seq("test" -> 0.2, "val" -> 0.3), strataCols = Seq("lang"))
      .as[(Long, String, String, Long)].collect().toSeq
    assert(got == again)
    // a NULL stratum is a real class, not a silently dropped row
    // (null-safe count join — the q158 groupBy-null-key lesson)
    val withNull = docs.unionByName(
      Seq((30L, Option.empty[String])).toDF("doc_id", "lang"))
    val nullRow = Split.stratifiedSplit(withNull,
        Seq("test" -> 0.2, "val" -> 0.3), strataCols = Seq("lang"))
      .filter($"doc_id" === 30L)
      .as[(Long, Option[String], String, Long)].collect().toSeq
    assert(nullRow == Seq((30L, None, "train", 1L)))
    // tiny-stratum overrun: rounded targets (1+1+1) exceed n=2; the
    // clamp starves the LAST split (and train), never misallocates
    val tiny = Seq((1L, "z"), (2L, "z")).toDF("doc_id", "lang")
    val tz = Split.stratifiedSplit(tiny,
        Seq("s1" -> 0.3, "s2" -> 0.3, "s3" -> 0.3),
        strataCols = Seq("lang"))
      .as[(Long, String, String, Long)].collect().toSeq
    assert(tz.map(_._3).sorted == Seq("s1", "s2"))
    // fractions must leave a train remainder; 'train' name reserved
    intercept[IllegalArgumentException] {
      Split.stratifiedSplit(docs, Seq("test" -> 0.6, "val" -> 0.4),
        strataCols = Seq("lang"))
    }
    intercept[IllegalArgumentException] {
      Split.stratifiedSplit(docs, Seq("train" -> 0.2),
        strataCols = Seq("lang"))
    }
  }
}
