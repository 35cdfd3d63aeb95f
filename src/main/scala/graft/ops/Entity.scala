package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy entity resolution (record linkage): deletion-key blocking →
  * edit-distance verify → connected components → golden record.
  *
  * The one dedup family the near-dup stack doesn't cover: MinHash /
  * SimHash / containment all measure SET overlap of shingles, which
  * collapses for short strings (a part name has ~2 shingles) — the
  * right similarity for short dirty identifiers is edit distance,
  * and the classic pipeline is Fellegi-Sunter-shaped:
  *
  *   1. BLOCK: for `maxEdit <= 1` (the default), a candidate pair
  *      must share a DELETION KEY — the name with one token removed.
  *      A single-character edit is confined to one token (an edited
  *      space changes the token count and is unreachable by ANY
  *      token-structured blocking, including share-a-token), so two
  *      names within edit distance 1 and equal token count agree on
  *      the key that drops the edited token — the cover is exact,
  *      and each key is nearly unique: block sizes stay O(1) even
  *      when every token is corpus-common. For `maxEdit >= 2` the
  *      classic share-a-token blocking applies instead. Either way
  *      the shuffle moves (key, nid) rows only — one per DISTINCT
  *      name — never names², pairs
  *      generated per bucket exactly like the LSH band join in
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
  * Skew: share-a-token blocking inherits Zipf skew — a stop-token
  * shared by half the registry generates O(block²) candidate pairs
  * (on a 92-word catalog vocabulary EVERY token is a stop-token, and
  * the block join degenerates to ~n²/|vocab| pairs — measured 137 s
  * at sf0.1 before the deletion-key blocker replaced it for the
  * maxEdit=1 path). `blockDfCap` tames the maxEdit>=2 path the same
  * way the LSH maxBucket star-cap does in [[Dedup]]: tokens whose
  * distinct-record df exceeds the cap stop blocking (a pair sharing
  * ONLY a stop-token is overwhelmingly a non-match, and any pair
  * that also shares a sub-cap token is still generated). The cap is
  * a recall trade: callers who need the lossless answer leave it at
  * the default (MaxValue) and pay the quadratic block. Deletion keys
  * need no cap — a key is a near-full name, selective by
  * construction; literal duplicate NAMES cost nothing because the
  * whole pipeline runs over distinct names (see [[entityResolve]]).
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
    * as their own entity. Records with EQUAL names are always one
    * entity (lev = 0 <= any maxEdit).
    *
    * DUPLICATION-COLLAPSED: all pairwise work runs over DISTINCT
    * names, never records. Real registries are heavy-tailed — the
    * same vendor string repeated 10⁶ times — so record-level pair
    * generation is intrinsically quadratic IN THE DATA (every
    * equal-name pair is a verified lev-0 edge; measured here: 11.5 M
    * edges and 203 s for 40 k records with 64 distinct catalog
    * names at sf0.1, any blocking scheme). Collapsing first makes
    * the graph u = |distinct names| nodes (~600 here, 0.9 s): one
    * map-side-combinable groupBy(name), the name-graph resolution,
    * then a single hash join of the records against the tiny
    * name→entity map. Record-level and name-level components agree
    * because equal-name records are connected through their shared
    * name node. */
  def entityResolve(registry: DataFrame, maxEdit: Int = 1,
                    blockDfCap: Int = Int.MaxValue): DataFrame = {
    // distinct names, each carrying its min rid (the node id — the
    // component minimum over node ids is then the entity's global
    // min rid) and its record count
    val names = namePartial(registry)
    attachByName(registry, nameEntityMap(names, maxEdit, blockDfCap))
  }

  /** The duplication-collapse: per distinct name, (min rid, record
    * count). MERGEABLE state (min and sum are associative and
    * commutative), which is what lets [[graft.streaming
    * .EntityResolveStream]] maintain resolution continuously —
    * partials from any batching merge via [[mergeNamePartials]] into
    * exactly this frame over the union. */
  def namePartial(registry: DataFrame): DataFrame =
    registry.groupBy("name")
      .agg(min(col("rid")).as("nid"), count(lit(1)).as("cnt"))

  /** Merge [[namePartial]] outputs (stored state plus deltas, any
    * order): min of mins, sum of counts. */
  def mergeNamePartials(parts: Seq[DataFrame]): DataFrame = {
    require(parts.nonEmpty, "need at least one partial")
    parts.reduce(_ unionByName _).groupBy("name")
      .agg(min(col("nid")).as("nid"), sum(col("cnt")).as("cnt"))
  }

  /** The name-graph resolution: distinct names → (name, entity_id,
    * canonical_name, n_members). Everything pairwise runs here, over
    * u = |distinct names| nodes — never records. */
  def nameEntityMap(names: DataFrame, maxEdit: Int = 1,
                    blockDfCap: Int = Int.MaxValue): DataFrame = {
    require(maxEdit >= 0, "maxEdit must be non-negative")
    require(blockDfCap > 0, "blockDfCap must be positive")

    // (key, nid, name): blocking-key rows per DISTINCT name
    val blocked =
      if (maxEdit <= 1) {
        // deletion-key blocking: key_i = name with token i removed.
        // Exact cover for lev<=1 (see scaladoc), and selective even
        // on stop-token vocabularies. The trailing distinct: a name
        // with a repeated token yields the same key twice.
        val toks = names.select(col("nid"), col("name"),
          split(col("name"), " ").as("ts"))
        toks.select(col("nid"), col("name"),
            explode(sequence(lit(0), size(col("ts")) - 1)).as("i"),
            col("ts"))
          .select(col("nid"), col("name"),
            array_join(concat(
              slice(col("ts"), lit(1), col("i")),
              slice(col("ts"), col("i") + 2,
                greatest(size(col("ts")) - col("i") - 1, lit(0)))),
              " ").as("tok"))
          .distinct()
      } else {
        val toks = names
          .select(col("nid"), col("name"),
            explode(array_distinct(split(col("name"), " "))).as("tok"))
          .filter(col("tok") =!= "")
        // common-token exclusion: df = distinct names per token
        if (blockDfCap == Int.MaxValue) toks
        else {
          val df = toks.groupBy("tok")
            .agg(count(lit(1)).as("df")) // toks is distinct per (nid, tok)
            .filter(col("df") <= blockDfCap)
            .select("tok")
          toks.join(broadcast(df), "tok")
        }
      }

    // candidate name pairs per key bucket, dedup'd across buckets,
    // then the pair-local edit-distance verify
    val edges = blocked.as("a")
      .join(blocked.as("b"),
        col("a.tok") === col("b.tok") && col("a.nid") < col("b.nid"))
      .select(col("a.nid").as("nid_a"), col("a.name").as("name_a"),
        col("b.nid").as("nid_b"), col("b.name").as("name_b"))
      .distinct()
      .filter(levenshtein(col("name_a"), col("name_b")) <= maxEdit)

    val cc = Components.connectedComponents(edges, "nid_a", "nid_b")
      .select(col("id").as("nid"), col("component"))

    // name → entity map (singleton names resolve to themselves);
    // broadcast-sized whenever distinct names ≪ records
    val ncomp = names.join(cc, Seq("nid"), "left")
      .withColumn("entity_id", coalesce(col("component"), col("nid")))
      .drop("component")
    val canon = ncomp.filter(col("nid") === col("entity_id"))
      .select(col("entity_id"), col("name").as("canonical_name"))
    val sizes = ncomp.groupBy("entity_id")
      .agg(sum(col("cnt")).as("n_members"))
    ncomp.select(col("name"), col("entity_id"))
      .join(canon, "entity_id").join(sizes, "entity_id")
  }

  /** Attach records to a [[nameEntityMap]] — the only record-sized
    * operation, one hash join against a names-sized map.
    *
    * NULL-safe on name: namePartial's groupBy keeps a NULL-name
    * group (it resolves to itself, matching nothing), so the attach
    * join must use <=> — a plain equi-join's NULL ≠ NULL would
    * silently drop those registry rows, breaking the every-row-out
    * contract. */
  def attachByName(registry: DataFrame, nameMap: DataFrame): DataFrame =
    registry.join(nameMap.withColumnRenamed("name", "__nm_name"),
        col("name") <=> col("__nm_name"))
      .select(col("rid"), col("name"), col("src"), col("entity_id"),
        col("canonical_name"), col("n_members"))

  /** Field-level survivorship — the GOLDEN RECORD step after linkage
    * (r8-cont): per entity, each field independently takes its value
    * from the LATEST record where that field is non-null, so a
    * fresher record with a missing phone number doesn't erase the
    * phone a staler record carried — the MDM rule "latest non-null
    * per field", which row-wise [[Upsert.latestByKey]] deliberately
    * is not (it keeps whole rows, nulls included).
    *
    * Shape: ONE aggregate, one field-max per survivor column —
    * `max(struct(ts, tie, value))` over non-null rows, the
    * latestByKey map-side-combine discipline, so each input
    * partition reduces to ≤|entities| rows before the exchange. The
    * tie column must be unique per record so the struct order is
    * total (the value never decides). `n_records` and
    * `last_updated` ride in the same pass for the audit trail. */
  def goldenRecord(records: DataFrame, keyCol: String, tsCol: String,
                   tieCol: String, fields: Seq[String]): DataFrame = {
    require(fields.nonEmpty, "fields must be non-empty")
    val aggs = fields.map { f =>
      max(when(col(f).isNotNull,
        struct(col(tsCol).as("ts"), col(tieCol).as("tie"),
          col(f).as("v"))))
        .getField("v").as(f)
    } ++ Seq(count(lit(1)).as("n_records"),
      max(col(tsCol)).as("last_updated"))
    records.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
      .orderBy(keyCol)
  }

  /** Mergeable survivorship PARTIAL — the state that makes
    * [[goldenRecord]] maintainable incrementally (and streamable,
    * [[graft.streaming.GoldenRecordStream]]): per entity, each field
    * keeps its full argmax struct `(ts, tie, v)` over the slice's
    * non-null values instead of the surviving value alone. The value
    * alone is NOT re-mergeable (a fresher batch with a null field
    * must lose to a staler batch that carried one, and the bare value
    * no longer knows its timestamp); the struct is — per-field max of
    * structs is associative and commutative, so partials combine in
    * any batching ([[Incremental]]'s contract, survivorship-shaped).
    * `n_records` (count) and `last_updated` (max ts) ride along. */
  def goldenPartial(records: DataFrame, keyCol: String, tsCol: String,
                    tieCol: String, fields: Seq[String]): DataFrame = {
    require(fields.nonEmpty, "fields must be non-empty")
    val aggs = fields.map { f =>
      max(when(col(f).isNotNull,
        struct(col(tsCol).as("ts"), col(tieCol).as("tie"),
          col(f).as("v")))).as(s"__st_$f")
    } ++ Seq(count(lit(1)).as("n_records"),
      max(col(tsCol)).as("last_updated"))
    records.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge any number of [[goldenPartial]] outputs (stored state plus
    * deltas, in any order): per-field struct max, count sum, ts max.
    * Output is again partial-shaped — re-mergeable state, not the
    * serving table ([[finishGolden]] projects that). */
  def mergeGoldenPartials(parts: Seq[DataFrame], keyCol: String,
                          fields: Seq[String]): DataFrame = {
    require(parts.nonEmpty, "need at least one partial")
    val aggs = fields.map(f => max(col(s"__st_$f")).as(s"__st_$f")) ++
      Seq(sum(col("n_records")).as("n_records"),
        max(col("last_updated")).as("last_updated"))
    parts.reduce(_ unionByName _)
      .groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Serving projection of merged partials: bit-identical schema and
    * rows to [[goldenRecord]] over the union of the slices (proven in
    * GoldenRecordStreamSpec) — pure selection, no arithmetic, so even
    * double fields compare exactly. */
  def finishGolden(partials: DataFrame, keyCol: String,
                   fields: Seq[String]): DataFrame = {
    val cols = col(keyCol) +:
      (fields.map(f => col(s"__st_$f").getField("v").as(f)) ++
        Seq(col("n_records"), col("last_updated")))
    partials.select(cols: _*).orderBy(keyCol)
  }
}
