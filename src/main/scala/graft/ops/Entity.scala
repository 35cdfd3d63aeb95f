package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy entity resolution (record linkage): token blocking →
  * edit-distance verify → connected components → golden record.
  *
  * The one dedup family the near-dup stack doesn't cover: MinHash /
  * SimHash / containment all measure SET overlap of shingles, which
  * collapses for short strings (a part name has ~2 shingles) — the
  * right similarity for short dirty identifiers is edit distance,
  * and the classic pipeline is Fellegi-Sunter-shaped:
  *
  *   1. BLOCK: a candidate pair must share ≥ 1 whole token. Blocking
  *      is what makes ER subquadratic — the shuffle moves
  *      (token, rid) rows only, never names², and pairs are generated
  *      per token bucket exactly like the LSH band join in
  *      [[Dedup.minHashCandidates]].
  *   2. VERIFY: `levenshtein(name_a, name_b) <= maxEdit` — pair-local,
  *      codegen'd, no state.
  *   3. CLUSTER: verified pairs are edges; an entity is a connected
  *      component ([[Components.connectedComponents]], the
  *      large-star/small-star stack — transitive: a dirty variant
  *      links its source records even when the two sources are
  *      2·maxEdit apart).
  *   4. SURVIVE: the golden record is the minimum-rid member; every
  *      input row gets (entity_id, canonical_name, n_members).
  *
  * Skew: token blocking inherits Zipf skew — a stop-token shared by
  * half the registry generates O(block²) candidate pairs. `blockDfCap`
  * drops blocking tokens whose distinct-record df exceeds the cap
  * (the standard common-token exclusion, same discipline as the
  * LSH maxBucket star-cap in [[Dedup]]) — a pair sharing ONLY a
  * stop-token is overwhelmingly a non-match, and any pair that also
  * shares a sub-cap token is still generated. The cap is a recall
  * trade: callers who need the lossless answer leave it at the
  * default (MaxValue) and pay the quadratic block.
  *
  * Precision note: maxEdit is the precision/recall knob — real
  * registries contain DISTINCT entities within small edit distance
  * ("cold plate" / "old plate" in the test catalog are 1 apart), and
  * those merge. That is inherent to edit-distance linkage, not a bug;
  * production stacks add attribute agreement terms on top. Kept
  * deterministic here so the whole pipeline replays in ANSI SQL.
  *
  * Reference scope note: the reference engine has no fuzzy-match
  * operator; this extends the training-data surface (SURVEY.md north
  * star) — entity resolution is the structured-data twin of document
  * near-dup dedup.
  */
object Entity {

  /** A deterministic dirty registry derived from the part catalog:
    * every part contributes its catalog row plus a "feed" row whose
    * name has ONE character deleted at a key-derived position (never
    * position 1, so blocking prefixes survive) — the planted
    * single-typo duplicate every resolution must re-link. No RNG:
    * the deletion position is `(p_partkey mod (len-1)) + 2`, so the
    * registry is replayable in SQL. */
  def dirtyRegistry(part: DataFrame, feedRidOffset: Long = 1000000L): DataFrame = {
    val catalog = part.select(
      col("p_partkey").cast("long").as("rid"),
      col("p_name").as("name"),
      lit("catalog").as("src"))
    // never delete position 1 (blocking prefixes survive) and never
    // the space (deleting it would merge the words — a legitimate
    // dirty form, but one that defeats TOKEN blocking by construction;
    // the planted twin must be findable by the op under test). A
    // space is never last, so pos0+1 stays in range.
    val pos0 = (col("p_partkey") % (length(col("p_name")) - 1) + 2).cast("int")
    val pos = when(col("p_name").substr(pos0, lit(1)) === " ", pos0 + 1)
      .otherwise(pos0)
    val feed = part.select(
      (col("p_partkey") + feedRidOffset).cast("long").as("rid"),
      concat(
        col("p_name").substr(lit(1), pos - 1),
        col("p_name").substr(pos + 1, length(col("p_name")))).as("name"),
      lit("feed").as("src"))
    catalog.unionByName(feed)
  }

  /** Resolve a registry of (rid, name, src) into entities. Returns
    * every input row with its entity: (rid, name, src, entity_id,
    * canonical_name, n_members), entity_id = min rid of the
    * component, canonical_name = that record's name, singletons kept
    * as their own entity. */
  def entityResolve(registry: DataFrame, maxEdit: Int = 1,
                    blockDfCap: Int = Int.MaxValue): DataFrame = {
    require(maxEdit >= 0, "maxEdit must be non-negative")
    require(blockDfCap > 0, "blockDfCap must be positive")

    // (token, rid, name): one row per DISTINCT token per record —
    // names stay with their rid (short identifiers, not documents),
    // so verify needs no join back to the registry
    val toks = registry
      .select(col("rid"), col("name"),
        explode(array_distinct(split(col("name"), " "))).as("tok"))
      .filter(col("tok") =!= "")

    // common-token exclusion: df = distinct records per token
    val blocked =
      if (blockDfCap == Int.MaxValue) toks
      else {
        val df = toks.groupBy("tok")
          .agg(count(lit(1)).as("df")) // toks is distinct per (rid, tok)
          .filter(col("df") <= blockDfCap)
          .select("tok")
        toks.join(broadcast(df), "tok")
      }

    // candidate pairs per token bucket, dedup'd across buckets, then
    // the pair-local edit-distance verify
    val edges = blocked.as("a")
      .join(blocked.as("b"),
        col("a.tok") === col("b.tok") && col("a.rid") < col("b.rid"))
      .select(col("a.rid").as("rid_a"), col("a.name").as("name_a"),
        col("b.rid").as("rid_b"), col("b.name").as("name_b"))
      .distinct()
      .filter(levenshtein(col("name_a"), col("name_b")) <= maxEdit)

    val cc = Components.connectedComponents(edges, "rid_a", "rid_b")
      .select(col("id").as("rid"), col("component"))

    // singletons resolve to themselves; canonical = the min-rid
    // member's name (a self-join on the registry, broadcast-sized
    // per entity count, id-only keys)
    val labeled = registry.join(cc, Seq("rid"), "left")
      .withColumn("entity_id", coalesce(col("component"), col("rid")))
      .drop("component")
    val canon = labeled.filter(col("rid") === col("entity_id"))
      .select(col("entity_id"), col("name").as("canonical_name"))
    val sizes = labeled.groupBy("entity_id")
      .agg(count(lit(1)).as("n_members"))
    labeled.join(canon, "entity_id").join(sizes, "entity_id")
      .select(col("rid"), col("name"), col("src"), col("entity_id"),
        col("canonical_name"), col("n_members"))
  }
}
