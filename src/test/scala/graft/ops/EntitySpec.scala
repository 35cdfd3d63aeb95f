package graft.ops

import graft.SparkSpec
import graft.io.Tables
import org.apache.spark.sql.functions._

class EntitySpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("dirtyRegistry: every feed twin is exactly one deletion from its catalog row") {
    val part = Tables.part(spark, sfDir)
    val reg = Entity.dirtyRegistry(part)
    val paired = reg.filter($"src" === "catalog").as("c")
      .join(reg.filter($"src" === "feed").as("f"),
        col("c.rid") === col("f.rid") - 1000000L)
      .select(col("c.name").as("cn"), col("f.name").as("fn"))
    assert(paired.count() === part.count())
    // one char shorter, levenshtein exactly 1, first char preserved
    assert(paired.filter(length($"fn") =!= length($"cn") - 1).count() === 0)
    assert(paired.filter(levenshtein($"cn", $"fn") =!= 1).count() === 0)
    assert(paired.filter(substring($"cn", 1, 1) =!= substring($"fn", 1, 1))
      .count() === 0)
  }

  test("every feed row resolves into the same entity as its catalog source") {
    val reg = Entity.dirtyRegistry(Tables.part(spark, sfDir))
    val resolved = Entity.entityResolve(reg)
    val split = resolved.filter($"src" === "catalog")
      .select($"rid", $"entity_id".as("ce")).as("c")
      .join(resolved.filter($"src" === "feed")
        .select(($"rid" - 1000000L).as("rid"), $"entity_id".as("fe")).as("f"),
        "rid")
    assert(split.count() > 0)
    assert(split.filter($"ce" =!= $"fe").count() === 0)
  }

  test("exact-duplicate names share an entity; canonical is the min-rid member's name") {
    val reg = Entity.dirtyRegistry(Tables.part(spark, sfDir))
    val resolved = Entity.entityResolve(reg).cache()
    // identical catalog names never land in different entities
    val perName = resolved.filter($"src" === "catalog")
      .groupBy("name").agg(countDistinct("entity_id").as("n"))
    assert(perName.filter($"n" > 1).count() === 0)
    // canonical_name is the name of the entity_id row itself
    val canonOk = resolved.filter($"rid" === $"entity_id")
      .filter($"name" =!= $"canonical_name")
    assert(canonOk.count() === 0)
    resolved.unpersist()
  }

  test("singletons resolve to themselves with n_members = 1") {
    val reg = Seq(
      (1L, "alpha beam", "a"), (2L, "alpha beams", "a"),
      (3L, "zz qq", "a")).toDF("rid", "name", "src")
    val r = Entity.entityResolve(reg).collect()
      .map(x => x.getLong(0) -> (x.getLong(3), x.getLong(5))).toMap
    assert(r(1L) === (1L, 2L)) // "alpha beam" ~1~ "alpha beams"
    assert(r(2L) === (1L, 2L))
    assert(r(3L) === (3L, 1L)) // no shared token with anything
  }

  test("blockDfCap drops stop-token-only pairs but keeps pairs sharing a rare token") {
    // maxEdit=1 rides the deletion-key blocker, where the cap is
    // inert (keys are near-full names — no stop-key skew to cap):
    // pairs resolve even under a cap that would starve token blocking
    val reg = Seq(
      (1L, "the kelvix aa", "a"), (2L, "the kelvix ab", "a"),
      (3L, "the zorblat pp", "a"), (4L, "the zorblat pq", "a"))
      .toDF("rid", "name", "src")
    val capped = Entity.entityResolve(reg, maxEdit = 1, blockDfCap = 2)
      .select("rid", "entity_id").collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(capped(2L) === 1L)
    assert(capped(4L) === 3L)
    assert(capped(1L) === 1L && capped(3L) === 3L)

    // when the ONLY shared token is the stop token, the capped path
    // misses the pair (the documented recall trade) while the
    // uncapped default still links it
    val only = Seq((1L, "the kelvix", "a"), (2L, "the kelvi", "a"))
      .toDF("rid", "name", "src")
    val missed = Entity.entityResolve(only, maxEdit = 2, blockDfCap = 1)
      .select("rid", "entity_id").collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(missed(1L) === 1L && missed(2L) === 2L)
    val linked = Entity.entityResolve(only, maxEdit = 2)
      .select("rid", "entity_id").collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(linked(1L) === 1L && linked(2L) === 1L)
  }

  test("deletion-key blocking links every lev<=1 pair on an all-stop-token vocabulary") {
    // every token is shared by every record — share-a-token blocking
    // degenerates to the full cross product here (the measured 137 s
    // sf0.1 blow-up in miniature); deletion keys stay selective and
    // still find exactly the true pairs
    val reg = Seq(
      (1L, "red blue green", "a"), (2L, "red blue geen", "a"),
      (3L, "blue red green", "a"), (4L, "blue red gren", "a"),
      (5L, "green blue red", "a"))
      .toDF("rid", "name", "src")
    val r = Entity.entityResolve(reg, maxEdit = 1)
      .select("rid", "entity_id").collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) === 1L && r(2L) === 1L, "single in-token edit linked")
    assert(r(3L) === 3L && r(4L) === 3L)
    assert(r(5L) === 5L, "token-permuted name is lev>1: stays its own entity")
  }

  test("deletion-key and share-a-token blocking verify the same edge set on multi-token names") {
    // equal-token-count registries: an in-token edit leaves n-1
    // tokens intact, so both blockers cover the pair and the
    // resolved entities agree (the oracle-alignment property the
    // q146 blocking swap relies on)
    val reg = Seq(
      (1L, "amber rose mint", "a"), (2L, "amber rose minx", "a"),
      (3L, "amber dust mint", "a"), (4L, "cobalt dust mint", "a"),
      (5L, "cobalt dust mint", "a"), (6L, "umber rose mint", "a"))
      .toDF("rid", "name", "src")
    val viaKeys = Entity.entityResolve(reg, maxEdit = 1)
      .select("rid", "entity_id").collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    // maxEdit=2 with an explicit lev<=1 post-filter is the old
    // share-a-token path restricted to the same verify threshold:
    // compare the entities it yields
    val toks = reg.select(col("rid"),
      explode(split(col("name"), " ")).as("tok"))
    val tokenPairs = toks.as("a").join(toks.as("b"),
        col("a.tok") === col("b.tok") && col("a.rid") < col("b.rid"))
      .select(col("a.rid").as("ra"), col("b.rid").as("rb")).distinct()
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val names = reg.collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    val tokenVerified = tokenPairs.filter { case (a, b) =>
      lev(names(a), names(b)) <= 1 }
    val keyVerified = for {
      (a, ea) <- viaKeys.toSet; (b, eb) <- viaKeys.toSet
      if a < b && ea == eb &&
        lev(names(a), names(b)) <= 1
    } yield (a, b)
    // every token-blocked verified pair lands in one entity via keys
    tokenVerified.foreach { case (a, b) =>
      assert(viaKeys(a) === viaKeys(b), s"pair ($a,$b) split") }
    // and keys add no verified pair token blocking lacks
    assert(keyVerified.subsetOf(tokenVerified))
  }

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0 }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("NULL-name rows pass through as their own entity (every row out)") {
    val reg = Seq((1L, "acme corp", "catalog"), (2L, "acme corp", "feed"))
      .toDF("rid", "name", "src")
      .unionByName(Seq((3L, "feed")).toDF("rid", "src")
        .select($"rid", lit(null: String).as("name"), $"src"))
    val resolved = Entity.entityResolve(reg)
    assert(resolved.count() === 3, "NULL-name row was dropped")
    val row = resolved.filter($"rid" === 3L)
      .select($"entity_id", $"n_members").as[(Long, Long)].head()
    assert(row == ((3L, 1L)), "NULL name must resolve to itself alone")
  }

  test("maxEdit = 0 links only exact-equal names") {
    val reg = Seq(
      (1L, "hot gear", "a"), (2L, "hot gear", "a"), (3L, "hot gea", "a"))
      .toDF("rid", "name", "src")
    val r = Entity.entityResolve(reg, maxEdit = 0)
      .select("rid", "entity_id").collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) === 1L && r(2L) === 1L && r(3L) === 3L)
  }

  test("goldenRecord: latest non-null PER FIELD, not latest row") {
    val recs = Seq(
      // entity 1: newest record (t=3) misses the phone; phone must
      // survive from t=2, email from t=3 — fields move independently
      (1L, 1L, 10L, "a@x", "111"),
      (1L, 2L, 11L, null, "222"),
      (1L, 3L, 12L, "c@x", null),
      // entity 2: field null everywhere → null survivor
      (2L, 5L, 20L, null, "333"),
      // entity 3: equal ts — unique tie (rid) decides
      (3L, 7L, 30L, "old@x", null),
      (3L, 7L, 31L, "new@x", null)
    ).toDF("eid", "t", "rid", "email", "phone")
    val got = Entity.goldenRecord(recs, "eid", "t", "rid",
        Seq("email", "phone"))
      .as[(Long, Option[String], Option[String], Long, Long)]
      .collect().toSeq
    assert(got == Seq(
      (1L, Some("c@x"), Some("222"), 3L, 3L),
      (2L, None, Some("333"), 1L, 5L),
      (3L, Some("new@x"), None, 2L, 7L)))
    // contrast with row-wise SCD-1: the latest ROW of entity 1 would
    // erase the phone — exactly what survivorship must not do
    val scd1 = Upsert.latestByKey(recs, Seq("eid"), Seq("t", "rid"),
        Seq("email", "phone"))
      .filter(col("eid") === 1L).select("phone").head()
    assert(scd1.isNullAt(0))
    // map-side combine: the aggregate carries partial maxes
    val plan = Entity.goldenRecord(recs, "eid", "t", "rid",
      Seq("email", "phone")).queryExecution.executedPlan.toString
    assert(plan.contains("partial_max") || plan.contains("partial"),
      plan)
  }

  test("goldenRecord ≡ brute survivorship on random null-ridden records") {
    for (seed <- 1 to 3) {
      val rows = (1 to 300).map { i =>
        val eid = ((i * 7919 + seed) % 17).toLong
        val t = ((i * 131 + seed * 7) % 23).toLong // heavy ts ties
        val a = if ((i * 37 + seed) % 3 == 0) null
          else s"a${(i * 13) % 5}"
        val b = if ((i * 577 + seed) % 4 == 0) null
          else s"b${(i * 11) % 4}"
        (eid, t, i.toLong, a, b)
      }
      val got = Entity.goldenRecord(
          rows.toDF("eid", "t", "rid", "fa", "fb"),
          "eid", "t", "rid", Seq("fa", "fb"))
        .as[(Long, Option[String], Option[String], Long, Long)]
        .collect().map(r => r._1 -> r).toMap
      rows.groupBy(_._1).foreach { case (eid, rs) =>
        def survivor(f: ((Long, Long, Long, String, String)) => String) =
          rs.filter(r => f(r) != null)
            .sortBy(r => (r._2, r._3)).lastOption.map(f)
        val g = got(eid)
        assert(g._2 == survivor(_._4) && g._3 == survivor(_._5),
          s"seed=$seed eid=$eid")
        assert(g._4 == rs.size && g._5 == rs.map(_._2).max)
      }
    }
  }
}
