package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.etl.{Analog, Curate, Oracle, Present}
import graft.io.Tables
import graft.ops.{AsOfJoin, Bloom, Cluster, Dedup, Diff, Entity, Eval, Importance, Incremental, Multimodal, Pca, Quantize, RangeJoin, Sessions, Similarity, Split, TextOps, Timeseries, Upsert}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator family from SURVEY.md §2
  * re-expressed Spark-first over the harness testdata; [[oracleSql]]
  * holds the DuckDB twin used by the driver's correctness gate.
  */
object SparkEntry {

  /** Flagship: full curate→present pipeline on sf0.001; driver
    * smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Present.monthlyRepeatRate(Analog.curated(spark, "/root/testdata/sf0.001"))

  type Q = (SparkSession, String) => DataFrame

  /** The curated-family queries, parameterized by an already-built
    * Silver DataFrame. [[queries]] wires each through a fresh
    * `Analog.curated` rebuild (self-contained for the correctness
    * gate); Bench's amortized mode times the same definitions against
    * the materialized partitioned Silver instead — at scale you build
    * Silver once and fan the Gold queries off the stored table
    * (exactly what [[Pipeline.run]] does), so both numbers are
    * reported. */
  def curatedQueries: Map[String, (SparkSession, DataFrame) => DataFrame] =
    Map[String, (SparkSession, DataFrame) => DataFrame](
      "q05_curated_table" -> ((_, c) => c.orderBy("booking_id")),
      "q07_monthly_occupancy" -> ((_, c) => Present.monthlyOccupancy(c)),
      "q08_popular_cities" -> ((_, c) => Present.weeklyPopularCities(c)),
      "q09_top_listings" -> ((_, c) => Present.weeklyTopListings(c)),
      "q10_bookings_per_user" -> ((_, c) => Present.bookingsPerUser(c)),
      "q11_avg_duration" -> ((_, c) => Present.monthlyAvgDuration(c)),
      "q12_repeat_rate" -> ((_, c) => Present.monthlyRepeatRate(c)),
      "q15_sql_tempview" -> ((s, c) => {
        c.createOrReplaceTempView("apartment_list_tb")
        s.sql("""
          SELECT CAST(date_trunc('month', booking_date) AS DATE) AS month_start,
                 CASE WHEN total_price_usd IS NULL THEN 'unpriced'
                      ELSE 'priced' END AS price_class,
                 count(*) AS n_bookings
          FROM apartment_list_tb
          WHERE booking_status = 'confirmed'
          GROUP BY 1, 2
          ORDER BY month_start, price_class""")
      }),
      "q41_pivot_status" -> ((_, c) =>
        c.groupBy(Present.monthOf(col("booking_date")).as("month_start"))
          .pivot("booking_status", Seq("confirmed", "pending", "canceled"))
          .count()
          // empty pivot cells are NULL in Spark, 0 from the oracle's
          // count(CASE ...) — normalize
          .na.fill(0L, Seq("confirmed", "pending", "canceled"))
          .orderBy("month_start")),
      // Unpivot (melt) — the inverse reshape (r8-cont): q41's wide
      // month × status table back to long (month, status, n) rows,
      // zero cells included (that is what distinguishes the
      // roundtrip from a plain GROUP BY: absent combinations
      // surface as explicit zeros). Dataset.unpivot is a pure
      // projection+explode — no shuffle beyond the pivot's own.
      "q197_unpivot_status" -> ((_, c) => {
        val wide = c
          .groupBy(Present.monthOf(col("booking_date")).as("month_start"))
          .pivot("booking_status", Seq("confirmed", "pending", "canceled"))
          .count()
          .na.fill(0L, Seq("confirmed", "pending", "canceled"))
        wide.unpivot(
            Array(col("month_start")),
            Array(col("confirmed"), col("pending"), col("canceled")),
            "booking_status", "n_bookings")
          .orderBy("month_start", "booking_status")
      }),
      "q43_cube_revenue" -> ((_, c) =>
        c.cube(col("cityname"), col("booking_status"))
          .agg(grouping_id().as("gid"),
            count(lit(1)).as("n_bookings"),
            Present.decSum(col("total_price_usd")).as("revenue"))
          .select(col("cityname"), col("booking_status"), col("gid"),
            col("n_bookings"), col("revenue"))
          .orderBy(col("gid"), col("cityname").asc_nulls_first,
            col("booking_status").asc_nulls_first)),
      "q45_topk_per_city" -> ((_, c) =>
        c.filter(col("cityname").isNotNull &&
            col("total_price_usd").isNotNull)
          .groupBy("cityname")
          .agg(graft.functions.TopKAggregate.topk_by_value(
            col("total_price_usd"), col("booking_id").cast("long"), 3)
            .as("top"))
          .select(col("cityname"), posexplode(col("top")))
          .select(col("cityname"), (col("pos") + 1).cast("int").as("rank"),
            col("col.id").as("booking_id"),
            col("col.value").as("price_usd"))
          .orderBy("cityname", "rank")),
      "q52_sql_topk" -> ((s, c) => {
        c.filter(col("cityname").isNotNull &&
            col("total_price_usd").isNotNull)
          .createOrReplaceTempView("curated_topk_tb")
        s.sql("""
          SELECT cityname, CAST(pos + 1 AS INT) AS rank,
                 e.id AS booking_id, e.value AS price_usd
          FROM (SELECT cityname,
                       topk_by_value(total_price_usd, booking_id, 3) AS top
                FROM curated_topk_tb GROUP BY cityname) t
          LATERAL VIEW posexplode(top) x AS pos, e
          ORDER BY cityname, rank""")
      })
    )

  private def curatedQ(name: String): Q =
    (s, dir) => curatedQueries(name)(s, Analog.curated(s, dir))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, Q] = Map[String, Q](
    // —— parity surface (SURVEY §2.1–§2.6) ——————————————————————————
    // P1: full-row dedup.
    "q01_dedup_rows" -> ((s, dir) =>
      Curate.dedup(Tables.orders(s, dir)).orderBy("o_orderkey")),
    // P2: typed projection with explicit casts.
    "q02_typed_projection" -> ((s, dir) =>
      Tables.part(s, dir).select(
        col("p_partkey").cast("bigint").as("part_id"),
        col("p_name").cast("string").as("title"),
        col("p_size").cast("int").as("size"),
        col("p_retailprice").cast("double").as("price"))
        .orderBy("part_id")),
    // P4: dd/MM/yyyy string round-trip parse.
    "q03_date_roundtrip" -> ((s, dir) =>
      Tables.orders(s, dir).select(
        col("o_orderkey").as("booking_id"),
        to_date(date_format(col("o_orderdate"), Curate.RawDateFormat),
          Curate.RawDateFormat).as("booking_date"))
        .orderBy("booking_id")),
    // J1 + P5 + S6: broadcast currency-dim join + price conversion.
    "q04_currency_convert" -> ((s, dir) =>
      Analog.apartmentsConverted(s, dir).select(
        col("id"), col("title"), col("apt_currency").as("currency"),
        col("price"), col("price_usd"))
        .orderBy("id")),
    // J2+J3+J4 + P1-P7: the full curated wide table.
    "q05_curated_table" -> curatedQ("q05_curated_table"),
    // A1: weekly average listing price.
    "q06_weekly_avg_price" -> ((s, dir) =>
      Present.weeklyAvgListingPrice(Analog.apartmentsConverted(s, dir))),
    // A2: monthly occupancy rate.
    "q07_monthly_occupancy" -> curatedQ("q07_monthly_occupancy"),
    // A3: weekly popular cities.
    "q08_popular_cities" -> curatedQ("q08_popular_cities"),
    // A4: weekly top-revenue listings.
    "q09_top_listings" -> curatedQ("q09_top_listings"),
    // A5: bookings per user.
    "q10_bookings_per_user" -> curatedQ("q10_bookings_per_user"),
    // A6: monthly average booking duration.
    "q11_avg_duration" -> curatedQ("q11_avg_duration"),
    // A7 + W1 + P10 + O3: monthly repeat-customer rate (LAG chain).
    "q12_repeat_rate" -> curatedQ("q12_repeat_rate"),
    // user_viewing/events engagement (SURVEY §2.10.1).
    "q13_weekly_engagement" -> ((s, dir) =>
      Present.weeklyEngagement(Tables.events(s, dir))),
    // Fact-fact equi join (lineitem ⋈ orders) with a pushed-down scan
    // filter — the shuffle-join shape AQE optimizes at scale.
    "q14_order_revenue" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("date"))
      val o = Tables.orders(s, dir)
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(Present.weekOf(col("o_orderdate")).as("week_start"),
          col("o_orderstatus"))
        .agg(
          count(lit(1)).as("n_items"),
          Present.decSum(Curate.money(
            col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
            .as("revenue"))
        .orderBy("week_start", "o_orderstatus")
    }),

    // S7 + A8 + P8/P10: temp-view registration + SQL entry point with
    // GROUP BY ordinals and CASE WHEN (the reference's present-job
    // style, `present_summary.py:79-180`).
    "q15_sql_tempview" -> curatedQ("q15_sql_tempview"),

    // As-of join (operator Spark lacks natively): for each purchase,
    // the latest preceding view by the same user. DuckDB's native
    // ASOF JOIN is the oracle.
    "q16_asof_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("view_ts"),
          col("event_id").as("view_event_id"), col("value").as("view_value"))
      AsOfJoin.asof(purchases, views, Seq("user_id"),
        leftTime = "ts", rightTime = "view_ts",
        rightCols = Seq("view_event_id", "view_value"))
        .orderBy("event_id")
    }),

    // user_viewing ingest+clean actually used (SURVEY §2.10.1): the
    // raw analog carries dd/MM/yyyy strings through P1+P4 then
    // aggregates a weekly wishlist funnel.
    "q18_viewing_funnel" -> ((s, dir) => {
      val uv = Curate.parseRawDates(
        Curate.dedup(Analog.userViewingRaw(s, dir)), Seq("viewed_at"))
      uv.groupBy(Present.weekOf(col("viewed_at")).as("week_start"),
          col("call_to_action"))
        .agg(count(lit(1)).as("n_views"),
          sum(col("is_wishlisted").cast("long")).as("n_wishlisted"))
        .orderBy("week_start", "call_to_action")
    }),
    // Semi/anti joins (EXISTS / NOT EXISTS): customers with vs
    // without confirmed orders.
    "q19_semi_anti" -> ((s, dir) => {
      val cust = Tables.customer(s, dir)
      val confirmed = Tables.orders(s, dir)
        .filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("c_custkey"))
      val withO = cust.join(confirmed, Seq("c_custkey"), "left_semi")
        .select(col("c_custkey"), lit("active").as("segment"))
      val withoutO = cust.join(confirmed, Seq("c_custkey"), "left_anti")
        .select(col("c_custkey"), lit("inactive").as("segment"))
      withO.unionByName(withoutO).orderBy("c_custkey")
    }),
    // Pivot: bookings count by month × status (wide reshape).
    "q41_pivot_status" -> curatedQ("q41_pivot_status"),
    // Unpivot (melt): q41's wide table back to long, zeros included.
    "q197_unpivot_status" -> curatedQ("q197_unpivot_status"),
    // Hierarchical rollup (grouping sets family — beyond the
    // reference's flat GROUP BYs): revenue by year ⊃ month ⊃ total.
    "q17_rollup_revenue" -> ((s, dir) =>
      Tables.orders(s, dir)
        .filter(col("o_orderstatus") === "F")
        .select(
          year(col("o_orderdate")).as("order_year"),
          month(col("o_orderdate")).as("order_month"),
          Curate.money(col("o_totalprice")).as("price2"))
        .rollup(col("order_year"), col("order_month"))
        .agg(count(lit(1)).as("n_orders"),
          Present.decSum(col("price2")).as("revenue"))
        .orderBy(col("order_year").asc_nulls_first,
          col("order_month").asc_nulls_first)),

    // Point-in-interval range join (binned equi-join formulation —
    // the scale path; see ops.RangeJoin): events inside 3-day promo
    // windows derived from sampled orders.
    "q42_range_join" -> ((s, dir) => {
      // promo windows anchored INSIDE the events' time range (events
      // are Jan 2024): start staggered by key over 28 days + 3-hour
      // offsets, 3-day length → windows overlap events and each other
      val promos = Tables.orders(s, dir)
        .filter(col("o_orderkey") % 1000 === 0)
        .select(col("o_orderkey").as("promo_id"),
          (lit("2024-01-01").cast("timestamp")
            + expr("INTERVAL 1 DAY * CAST(o_orderkey % 28 AS INT)")
            + expr("INTERVAL 3 HOUR * CAST(o_orderkey % 5 AS INT)"))
            .as("promo_start"))
        .withColumn("promo_end", col("promo_start") + expr("INTERVAL 3 DAY"))
      RangeJoin.binned(Tables.events(s, dir), promos,
          "ts", "promo_start", "promo_end")
        .groupBy("promo_id")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          Present.decSum(Curate.money(col("value"))).as("value_sum"))
        .orderBy("promo_id")
    }),
    // Cube (all grouping-set combinations; rollup's sibling) with
    // grouping_id to distinguish cube-nulls from data-nulls
    // (cityname IS null for attribute-less apartments).
    "q43_cube_revenue" -> curatedQ("q43_cube_revenue"),
    // SCD-1 upsert: collapse the events changelog to the latest row
    // per (user_id, event_type) via struct-max (map-side combinable —
    // no window sort; see ops.Upsert.latestByKey).
    "q44_scd_upsert" -> ((s, dir) =>
      Upsert.latestByKey(Tables.events(s, dir),
          keys = Seq("user_id", "event_type"),
          versionCols = Seq("ts", "event_id"),
          payloadCols = Seq("value"))
        .orderBy("user_id", "event_type")),
    // Custom TypedImperativeAggregate: bounded-heap top-k per group
    // (O(k) state + map-side partials vs the window-rank full sort).
    "q45_topk_per_city" -> curatedQ("q45_topk_per_city"),
    // Running windows: cumulative count/revenue + ntile quartile per
    // customer (frame-bounded windows beyond the reference's LAG).
    "q46_running_totals" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val order = Seq(col("o_orderdate"), col("o_orderkey"))
      val cum = Window.partitionBy("o_custkey").orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val rank = Window.partitionBy("o_custkey").orderBy(order: _*)
      Tables.orders(s, dir).select(
        col("o_orderkey"), col("o_custkey"),
        count(lit(1)).over(cum).as("running_n"),
        sum(Curate.money(col("o_totalprice")).cast("decimal(18,2)"))
          .over(cum).cast("double").as("running_rev"),
        ntile(4).over(rank).as("quartile"))
        .orderBy("o_custkey", "o_orderkey")
    }),
    // Array explode / unnest: word frequencies over part names.
    "q47_word_counts" -> ((s, dir) =>
      Tables.part(s, dir)
        .select(col("p_partkey"), explode(split(col("p_name"), " ")).as("word"))
        .groupBy("word")
        .agg(count(lit(1)).as("n"),
          countDistinct(col("p_partkey")).as("n_parts"))
        .orderBy("word")),
    // Approximate quantiles (GK sketch) next to the exact answer —
    // the bounded-memory path when exact per-group sort (q38) is too
    // expensive. Exploded to scalar rows (lang, quantile, approx_val,
    // exact_val). Oracle-gated: at accuracy=10000 the GK summary
    // retains every sample while n/group < 5000 (true at every test
    // SF), so percentile_approx deterministically returns the element
    // at ascending rank ceil(q·n) — reproducible in DuckDB SQL; the
    // spec's ≤5% error bound still covers the sketch in general.
    "q55_approx_quantiles" -> ((s, dir) => {
      val qs = array(lit(0.5), lit(0.9))
      Tables.documents(s, dir)
        .groupBy("lang")
        .agg(
          percentile_approx(col("n_chars"), qs, lit(10000)).as("aq"),
          expr("percentile(n_chars, array(0.5D, 0.9D))").as("eq"))
        .select(col("lang"), col("aq"), col("eq"), posexplode(qs))
        .select(col("lang"), col("col").as("quantile"),
          element_at(col("aq"), (col("pos") + 1).cast("int"))
            .cast("long").as("approx_val"),
          element_at(col("eq"), (col("pos") + 1).cast("int"))
            .as("exact_val"))
        .orderBy("lang", "quantile")
    }),
    // Approximate-distinct NOTE (r8, verdict item 7): the former
    // q48_approx_distinct (builtin approx_count_distinct next to the
    // exact count) is RETIRED as a driver query — its HLL++ sketch is
    // engine-internal, so it could only ever be a rows-only row. Its
    // three verifiable facets all remain gated: the exact
    // distinct-aggregation path is q57 (hash-exact oracle), the
    // approximate path itself is q151's deterministic 256-register
    // HLL whose arithmetic replays in ANSI SQL (hash-exact oracle),
    // and the BUILTIN sketch's ≤5% error bound stays spec-asserted
    // (TopKAggregateSpec "approx_count_distinct stays within 5%").
    // The exact companion, split out so the distinct-aggregation
    // path (partial de-dup expand + final count) gets a hash-exact
    // oracle row of its own.
    "q57_exact_distinct" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("exact_users"),
          count(lit(1)).as("n_events"))
        .orderBy("event_type")),

    // Snapshot diff / CDC (ops.Diff): classify keys across two
    // deterministic snapshot derivations of orders.
    "q49_snapshot_diff" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val old = o.filter(col("o_orderkey") % 7 =!= 0)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val latest = o.filter(col("o_orderkey") % 11 =!= 0)
        .select(col("o_orderkey"), col("o_orderstatus"),
          when(col("o_orderkey") % 5 === 0,
            Curate.money(col("o_totalprice") * 1.05))
            .otherwise(col("o_totalprice")).as("o_totalprice"))
      Diff.changes(old, latest, Seq("o_orderkey"))
        .select(col("o_orderkey"), col("change_type"))
        .orderBy("o_orderkey")
    }),

    // Hopping (sliding) windows in batch: 7-day windows advancing
    // daily — each event lands in 7 overlapping windows (the batch
    // twin of streaming window(slide < len); epoch-aligned slides are
    // date-aligned in UTC).
    "q50_hopping_window" -> ((s, dir) =>
      Tables.events(s, dir)
        .filter(col("event_type") === "purchase")
        .groupBy(window(col("ts"), "7 days", "1 day"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          Present.decSum(Curate.money(col("value"))).as("value_sum"))
        .select(col("window.start").cast("date").as("win_start"),
          col("event_type"), col("n_events"), col("value_sum"))
        .orderBy("win_start", "event_type")),
    // Set operations (absent from the reference — SURVEY §2.6): users
    // active in BOTH halves of the period vs only the first half.
    "q51_set_ops" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val mid = lit("2024-01-16").cast("timestamp")
      val firstHalf = ev.filter(col("ts") < mid).select("user_id")
      val secondHalf = ev.filter(col("ts") >= mid).select("user_id")
      firstHalf.intersect(secondHalf)
        .select(col("user_id"), lit("retained").as("segment"))
        .unionByName(firstHalf.except(secondHalf)
          .select(col("user_id"), lit("churned").as("segment")))
        .orderBy("user_id")
    }),

    // The custom aggregate through the SQL surface: topk_by_value is
    // registered by plans.GraftExtensions, so plain SQL users get the
    // bounded-heap top-k too. Same oracle as q45 (identical output).
    "q52_sql_topk" -> curatedQ("q52_sql_topk"),

    // —— training-data pipeline extensions ————————————————————————
    // Exact dedup by content hash.
    "q20_exact_dedup" -> ((s, dir) =>
      Dedup.exactByHash(Tables.documents(s, dir))),
    // Token counting.
    "q21_token_stats" -> ((s, dir) =>
      TextOps.tokenStats(Tables.documents(s, dir))),
    // Quality scoring (stopword ratio, word lengths).
    "q22_quality_score" -> ((s, dir) =>
      TextOps.qualityScore(Tables.documents(s, dir))),
    // Per-language corpus stats.
    "q23_lang_stats" -> ((s, dir) =>
      TextOps.langStats(Tables.documents(s, dir))),
    // Deterministic stratified sampling (min-k md5 order per lang).
    "q37_stratified_sample" -> ((s, dir) =>
      TextOps.stratifiedSample(Tables.documents(s, dir), "lang", 10)),
    // Exact per-language length quantiles.
    "q38_length_quantiles" -> ((s, dir) =>
      TextOps.lengthQuantiles(Tables.documents(s, dir), "lang")),
    // BPE-ish subword counting: whitespace words then fixed-width
    // subword chunks (the cheap token-budget estimator).
    "q39_subword_counts" -> ((s, dir) => {
      val words = TextOps.tokens(col("text"))
      Tables.documents(s, dir).select(
        col("doc_id"),
        size(words).cast("long").as("n_words"),
        aggregate(words, lit(0L),
          (acc, w) => acc + ceil(length(w) / lit(4.0)).cast("long"))
          .as("n_subwords"))
        .orderBy("doc_id")
    }),
    // JSON extraction from the events props column + aggregation.
    "q40_json_extract" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          sum(col("k")).as("sum_k"), max(col("k")).as("max_k"))
        .orderBy("event_type")),
    // Language-ID heuristic (argmax over marker scores).
    "q24_lang_id" -> ((s, dir) =>
      TextOps.langId(Tables.documents(s, dir))),
    // MinHash+LSH near-dup dedup — ORACLE-GATED since r5: the
    // candidate cover is spec-proven complete on this corpus
    // (TextDedupSpec LSH ≡ brute force), so DuckDB replays the batch
    // drop rule with brute-force shingle-Jaccard pairs (the q66/q68
    // argument; the driver runs the O(N²) oracle at sf0.01 only).
    "q25_minhash_dedup" -> ((s, dir) =>
      Dedup.minHashDedup(Tables.documents(s, dir))),
    // SimHash signatures (no SQL oracle — rows-only check).
    "q26_simhash" -> ((s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"), Dedup.simHash(col("text")).as("simhash"))
        .orderBy("doc_id")),
    // Transitive near-dup dedup end-to-end, ORACLE-GATED: MinHash-LSH
    // candidates → exact shingle-Jaccard verify (≥0.8) → connected
    // components → one survivor per dup cluster. The block index's
    // candidate set provably covers every qualifying pair on this
    // corpus (TextDedupSpec agreement), so DuckDB can replay the
    // whole stack with brute-force pairs + a recursive closure —
    // a hash-exact gate over the entire dedup pipeline. Bounded to
    // doc_id < 1000 (the q27 discipline) to keep the O(N²) oracle
    // cheap; the Spark side stays the bucketed scale path.
    "q66_cluster_dedup" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 1000)
      val verified = Dedup.jaccardVerify(
          Dedup.minHashCandidates(docs), docs,
          shingleLen = Dedup.ShingleLen)
        .filter(col("jaccard") >= 0.8)
      graft.ops.Components.componentDedup(
        docs.select("doc_id"), verified,
        srcCol = "id_a", dstCol = "id_b")
    }),
    // SimHash dedup end-to-end over a dup-salted corpus (no SQL
    // oracle — xxhash64-bound like q25/q26; the exhaustive-index
    // agreement with brute-force Hamming dedup is spec-verified).
    "q65_simhash_dedup" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select("doc_id", "text")
      Dedup.simHashDedup(d.unionByName(d.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + 10000).as("doc_id"), col("text"))))
    }),
    // SimHash dedup with md5-derived signatures — the ORACLE-GATED
    // twin of q65 (DuckDB replays every bit vote; the block-indexed
    // path ≡ brute-force Hamming, so the oracle replays brute force
    // — the q66 argument). Same dup salt as q65; SimHashMd5Spec pins
    // both paths to the planted dups (residual: sketch-boundary
    // flips only, ≤ 2%).
    "q123_simhash_md5_dedup" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select("doc_id", "text")
      Dedup.simHashDedupMd5(d.unionByName(d.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + 10000).as("doc_id"), col("text"))))
    }),
    // k-anonymity / l-diversity release audit: equivalence classes
    // over (nation, segment) that are SMALL (< 10 members — an
    // attacker knowing the quasi-identifiers pins few rows) or
    // HOMOGENEOUS (< 5 distinct acctbal-thousands — the class leaks
    // its members' secret). One map-side-combined aggregate; the
    // risky tail IS the artifact a release gate reads.
    "q158_k_anonymity" -> ((s, dir) =>
      graft.ops.Privacy.kAnonymityAudit(Tables.customer(s, dir),
        Seq("c_nationkey", "c_mktsegment"),
        floor(col("c_acctbal") / 1000.0).cast("long"), k = 10, l = 5)),
    // The enforcement half: a release decision per customer row —
    // null-safe membership against the risky classes (ids only; at
    // 100 TB the risky-class key set is tiny and broadcasts). The
    // per-row form stays meaningful at every SF (at sf0.001 EVERY
    // class is risky, so a released-only view would be empty).
    "q159_k_suppress" -> ((s, dir) =>
      graft.ops.Privacy.releaseDecisions(Tables.customer(s, dir),
        Seq("c_nationkey", "c_mktsegment"),
        floor(col("c_acctbal") / 1000.0).cast("long"), k = 10, l = 5,
        idCol = "c_custkey")),
    // BM25-mined hard negatives for retrieval training (the DPR
    // recipe): 20 query docs, 5 rarest-term queries, top-5 negatives
    // each, with the query itself AND its exact copies excluded —
    // the planted +10000 copies make the exclusion observable (an
    // identical doc would otherwise always rank #1). Candidate
    // volume is bounded by the chosen RARE terms' postings, never
    // Q × corpus; the data-dependent term sums fold in sorted term
    // order so the oracle replays every IEEE addition.
    "q156_bm25_negatives" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select("doc_id", "text")
      val corp = d.unionByName(d.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + 10000).as("doc_id"), col("text")))
      TextOps.bm25Negatives(corp, corp.filter(col("doc_id") < 20))
    }),
    // Blockhash near-dup dedup over BINARY payloads — the image
    // near-duplicate shape on the multimodal asset table: 64-tile
    // median blockhash of the byte signal (codegen'd, one pass in
    // the scan stage), exhaustive 4×16-bit Hamming index, drop the
    // higher asset id within 3 bits. The salt plants VALUE-jittered
    // copies (+1 on every 20th non-space byte — the re-encode-noise
    // model this sketch is robust to; alignment shifts are q136
    // CDC's job). Fully oracle-gated: tile means, the median
    // threshold, and every Hamming comparison replay in DuckDB.
    "q157_blockhash_dedup" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select("doc_id", "text")
      val t = col("text")
      def charAt(j: Column) = t.substr(j + lit(1), lit(1))
      val jittered = d.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + 10000).as("doc_id"),
          array_join(transform(sequence(lit(0), length(t) - 1), j =>
            when(j % 20 === 0 && charAt(j) =!= " ",
              call_function("char", least(lit(125), ascii(charAt(j)) + 1)))
              .otherwise(charAt(j))), "").as("text"))
      Multimodal.blockHashDedup(
        Multimodal.asBinaryAssets(d.unionByName(jittered)))
    }),
    // C4/RefinedWeb-style line-level boilerplate removal. The corpus
    // is the documents reshaped into 8-token lines with a planted
    // nav-bar line on every 3rd doc and a footer on every 4th —
    // ubiquitous lines (df >= 2 docs) are removed EVERYWHERE, bodies
    // reassemble in order.
    "q124_line_dedup" -> ((s, dir) => {
      val lined = Tables.documents(s, dir)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
        .select(col("doc_id"), concat(
          when(col("doc_id") % 3 === 0,
            lit("subscribe to our newsletter today\n")).otherwise(lit("")),
          array_join(transform(
            sequence(lit(1), size(col("toks")), lit(8)),
            i => array_join(slice(col("toks"), i, lit(8)), " ")), "\n"),
          when(col("doc_id") % 4 === 0,
            lit("\nall rights reserved site footer")).otherwise(lit("")))
          .as("text"))
      TextOps.lineDedup(lined)
    }),
    // Winnowing (MOSS) fingerprint candidate pairs — the salt plants
    // a 40-token copied run behind a one-token prefix; the winnowing
    // density guarantee finds it at ANY alignment (≥ 1 shared
    // fingerprint per shared run of length ≥ w + k − 1 = 11 tokens).
    // k = 8 / dfCap = 20 are the scale knobs on THIS corpus: its
    // ~40-word vocabulary makes short k-grams collide across
    // unrelated docs (the containment-profile worst case), and
    // candidate volume is Σ df(fp)² — 8-grams push random collisions
    // to ~0 so candidates track the true dup mass.
    "q125_winnow_pairs" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val salted = docs.unionByName(docs.filter(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 400000).as("doc_id"),
          concat_ws(" ", lit("intro"),
            array_join(slice(TextOps.tokens(col("text")), 1, 40), " "))
            .as("text")))
      TextOps.winnowCandidates(salted, k = 8, w = 4, dfCap = 20)
    }),
    // Deterministic epoch shuffle + shard manifest (epoch 3, 8
    // shards): content-random per-epoch order, shard = hex range of
    // the same key — a pure projection, no global sort.
    "q126_epoch_order" -> ((s, dir) =>
      Split.epochOrder(Tables.documents(s, dir).select("doc_id"),
        shards = 8, epoch = 3)),
    // Tokenizer coverage report: the q120 BPE table trained on a
    // 10% train slice (doc_id % 10 = 0), applied corpus-wide —
    // per-source OOV rate (char-fallback convention for unseen
    // words) and fertility (mean pieces/word), the sequence-length
    // canary.
    "q130_tokenizer_report" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      TextOps.tokenizerReport(docs,
        docs.filter(col("doc_id") % 10 === 0))
    }),
    // DSIR step 2: importance RESAMPLING — 64 systematic-PPS picks
    // ∝ the q127 weights (fixed-point quantized, Madow grid — no
    // RNG). Selection tilts the sample's n-gram profile toward the
    // src0 target domain.
    "q129_importance_resample" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Importance.importanceResample(docs.select("doc_id", "text"),
        docs.filter(col("source") === "src0").select("doc_id", "text"),
        k = 64)
    }),
    // Maximal duplicated-span extraction: the variable-length q78
    // upgrade — per-doc maximal contiguous duplicated token regions
    // (start, extent, text) via gaps-and-islands over stride-1
    // window hashes, on the same salted corpus as q78.
    "q131_max_dup_spans" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val salted = docs.unionByName(docs.filter(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 200000).as("doc_id"),
          array_join(slice(TextOps.tokens(col("text")), 1, 30), " ")
            .as("text")))
      TextOps.maxDupSpans(salted)
    }),
    // Token-budget selection: fill a 20k-token training budget with
    // the best documents by the q89 classifier probability — the
    // bucket-partitioned exact greedy knapsack (no global
    // single-partition cumsum).
    "q132_budget_select" -> ((s, dir) =>
      TextOps.budgetSelect(Tables.documents(s, dir), tokenBudget = 20000L)),
    // Cross-source vocabulary affinity/contamination matrix: complete
    // pairwise vocabulary Jaccard (vocab-sized shuffles only).
    "q133_vocab_overlap" -> ((s, dir) =>
      TextOps.sourceVocabOverlap(Tables.documents(s, dir))),
    // Token-distribution concentration (integer Herfindahl + top-token
    // mass): the no-log entropy proxy for skew-repetitive junk that
    // distinct-ratio filters miss. In-row counts, zero shuffle.
    "q142_token_concentration" -> ((s, dir) =>
      TextOps.tokenConcentration(Tables.documents(s, dir))),
    // Per-source n-gram diversity (distinct-n TTR for n=1,2,3): the
    // templated-source diagnostic; exact two-phase distinct counts.
    "q143_ngram_diversity" -> ((s, dir) =>
      TextOps.ngramDiversity(Tables.documents(s, dir))),
    // Curriculum ordering: 4 quality tiers from the q89 classifier via
    // the bucketed global-rank discipline (no corpus-sized window),
    // md5 within-stage training order re-shuffled per epoch.
    "q144_curriculum_order" -> ((s, dir) =>
      TextOps.curriculumOrder(Tables.documents(s, dir))),
    // Label-relevance retrieval metrics: hits/MRR/precision@k/nDCG@k
    // of the exact cosine top-10 against same-label relevance — the
    // IR-eval counterpart of the recall gate. Driver-computed DCG
    // discount literals + rank-ordered folds keep it hash-exact.
    "q140_retrieval_eval" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Eval.retrievalEval(emb, emb.filter(col("vec_id") < 50), k = 10)
    }),
    // Matryoshka dimension ablation: recall@5 of brute-force top-k on
    // the first-d embedding prefix vs the full-dim ground truth, one
    // row per width — the measured evidence for indexing a truncated
    // prefix (4x cheaper ANN structures) with full-dim re-rank.
    "q141_dim_ablation" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Eval.dimAblation(emb, emb.filter(col("vec_id") < 50), k = 5,
        dims = Seq(8, 16, 32, 64))
    }),
    // Vocabulary coverage curve: token-mass coverage of the top-2^j
    // types for j = 0..16 — the vocab-sizing artifact (bucketed
    // exact global rank, no vocab-sized single-partition window).
    "q139_vocab_coverage" -> ((s, dir) =>
      TextOps.vocabCoverageCurve(Tables.documents(s, dir))),
    // Contrastive triplet mining: anchors with a near-dup positive
    // (drop-first-token copies) and a hard band negative (first-half
    // copies) from ONE lossless exact-Jaccard pass at the band floor.
    "q138_triplet_mine" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val toks = TextOps.tokens(col("text"))
      val near = docs.filter(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 400000).as("doc_id"),
          array_join(slice(toks, lit(2), size(toks) - 1), " ").as("text"))
      val half = docs.filter(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 500000).as("doc_id"),
          array_join(slice(toks, lit(1),
            floor((size(toks) + 1) / lit(2)).cast("int")), " ")
            .as("text"))
      Dedup.tripletMine(docs.unionByName(near).unionByName(half))
    }),
    // Embedding-space decontamination: max cosine of every corpus
    // vector against a broadcast eval pool (scaled near-copies, the
    // q56 injection — paraphrase-leak semantics n-gram decon misses).
    "q137_embedding_decon" -> ((s, dir) => {
      val base = Tables.embeddings(s, dir).filter(col("vec_id") < 2000)
        .select(col("vec_id"),
          expr("transform(embedding, x -> cast(x as double))")
            .as("embedding"))
      val evalSet = base.filter(col("vec_id") % 5 === 0)
        .select((col("vec_id") + 100000).as("vec_id"),
          transform(col("embedding"), x => x * lit(1.25)).as("embedding"))
      Similarity.cosineDecontaminate(base, evalSet, tau = 0.9)
    }),
    // Content-defined chunking dedup audit: variable-size chunks cut
    // at md5-boundary tokens (insertion-robust where fixed blocks
    // misalign), deduplicated corpus-wide by chunk md5; same salted
    // corpus as q78.
    "q136_cdc_chunks" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val salted = docs.unionByName(docs.filter(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 200000).as("doc_id"),
          array_join(slice(TextOps.tokens(col("text")), 1, 30), " ")
            .as("text")))
      TextOps.cdcChunkAudit(salted)
    }),
    // MMR diversified retrieval: greedy λ·rel − (1−λ)·redundancy
    // re-rank of the exact top-20 — the post-ANN dedup step of a
    // retrieval/RAG stack, 5 unrolled argmax rounds over bounded
    // per-query frames.
    "q135_mmr_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.mmrTopK(emb, emb.filter(col("vec_id") < 50),
        k = 5, cand = 20, lambda = 0.7)
    }),
    // IVF ANN with a LEARNED coarse quantizer (k-means cells, the
    // Faiss shape) — fully oracle-gated INCLUDING the fit, unlike
    // hash-cell q36 (rows-only): fixed-point means, argmax ties,
    // dot/|c| probe ranking and exact re-rank all replay in SQL.
    // recall@5 0.940 at 16/32 cells probed vs q36's 0.764 at the
    // same fraction (ProfileIvfR7; per-round BENCH recall line).
    "q128_ivf_kmeans" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.ivfKmeansTopK(emb, emb.filter(col("vec_id") < 50),
        k = 5, numCentroids = 32, iters = 2, nProbe = 16)
    }),
    // Product-quantization ANN (Faiss PQ, spherical): 8 learned
    // 16-word subspace codebooks (32 bits/vector), ADC scan over the
    // compressed corpus, exact re-rank of the top 400 — fully
    // oracle-gated INCLUDING all eight subspace fits. 32-bit codes
    // are SF-sensitive (PqProbe at sf0.1: rerank 200→0.804,
    // 400→0.940, the q128 level, with 80% of the corpus still
    // ADC-pruned); the per-round BENCH recall line tracks it.
    "q134_pq_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.pqTopK(emb, emb.filter(col("vec_id") < 50),
        k = 5, m = 8, codesPerSub = 16, iters = 2, rerank = 400)
    }),
    // DSIR-style importance weights: target = src0 docs, raw = all;
    // hashed unigram+bigram buckets (3 md5 hex digits), add-1
    // smoothing, mean p_target/p_raw ratio per doc (rational
    // surrogate for the mean log-ratio — the q76 discipline).
    "q127_importance_weights" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Importance.importanceWeights(docs.select("doc_id", "text"),
        docs.filter(col("source") === "src0").select("doc_id", "text"))
    }),
    // Exact n-gram Jaccard top pairs — brute-force O(N²) baseline,
    // bounded to a deterministic 1000-doc sample (the unbounded scale
    // path is q25's MinHash-LSH); the oracle applies the same bound.
    "q27_jaccard_pairs" -> ((s, dir) =>
      Dedup.jaccardTopPairs(
        Tables.documents(s, dir).filter(col("doc_id") < 1000), 100)),
    // Brute-force cosine top-k ANN baseline.
    "q28_cosine_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 50), 5)
    }),
    // Winnowing fingerprints (no SQL oracle — rows-only check).
    "q29_fingerprint" -> ((s, dir) =>
      TextOps.fingerprint(Tables.documents(s, dir))),
    // Multimodal binary-column metadata extraction.
    "q30_multimodal_meta" -> ((s, dir) =>
      Multimodal.extractMetaColumnar(
        Multimodal.asBinaryAssets(Tables.documents(s, dir)))),
    // Multimodal partition-local decode (stubbed codec with
    // sha-derived dimensions; real batch shape).
    "q35_multimodal_decode" -> ((s, dir) =>
      Multimodal.decodeAssets(
        Multimodal.asBinaryAssets(Tables.documents(s, dir)))
        .toDF().orderBy("asset_id")),
    // Multimodal frame sampling: per-asset frame fan-out with capped
    // explode; payload bytes never enter the explode.
    // everyBytes=64 so the harness docs (48-553 bytes) genuinely fan
    // out to 1-8 frames — not a 1-frame-per-doc vacuous explode.
    "q53_frame_sample" -> ((s, dir) =>
      Multimodal.frameSample(
        Multimodal.asBinaryAssets(Tables.documents(s, dir)),
        everyBytes = 64L)
        .orderBy("asset_id", "frame_idx")),
    // Multimodal resize planning: aspect-preserving integer-arithmetic
    // target dimensions from the stub-decoded sizes.
    "q54_resize_plan" -> ((s, dir) =>
      Multimodal.resizePlan(
        Multimodal.asBinaryAssets(Tables.documents(s, dir)))
        .orderBy("asset_id")),
    // Gap-based sessionization (batch twin of the streaming op).
    "q31_sessionize" -> ((s, dir) =>
      Sessions.sessionize(Tables.events(s, dir))),
    // LSH-bucketed approximate ANN (no SQL oracle — rows-only check;
    // recall@5 is gated per round in the Bench recall line). Auto-
    // scaled multi-probe production parameters: planes from corpus
    // size (targetBucket=8), tables=8, probes=16 — measured at
    // recall@5 = 0.912 scoring 827 candidates/query (41% of the tiny
    // sf0.1 N=2000 corpus; the budget is tables·probes·targetBucket,
    // N-independent — ProfileMultiProbe sweep, PLANS.md r7).
    "q32_lsh_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.lshTopKAuto(emb, emb.filter(col("vec_id") < 50), 5)
    }),
    // Ordered funnel paths (r8-cont): per view, the first click
    // strictly after it within 3 days, then the first purchase after
    // that click — each hop ONE forward-as-of union+window pass (no
    // join node, no O(matches) blow-up), nulls propagate through
    // dead stages, completed_stages counts how far the user got.
    "q186_funnel_paths" -> ((s, dir) =>
      graft.ops.Analytics.funnelPaths(Tables.events(s, dir),
        Seq("view", "click", "purchase"), maxGap = "3 days")),
    // Grouped average precision (r8-cont): the imbalance-sensitive
    // companion to q189's AUC, under the explicit (score desc,
    // doc_id asc) total order; each precision@k term carried as the
    // integer ⌊cum_pos·2²⁰/rank⌋ (the q184 fixed-point playbook) so
    // AP replays hash-exact — a documented ≤2⁻²⁰ quantization.
    "q194_avg_precision" -> ((s, dir) =>
      Eval.averagePrecision(
        Tables.documents(s, dir).select(
          col("source"), col("doc_id"),
          TextOps.qualityMargin("text").as("clf_score"),
          (col("lang") === "en").as("y")),
        Seq("source"), "clf_score", "y", "doc_id")),
    // Confusion counts + precision/recall/F1 at the shipped
    // threshold (r8-cont): the q89 keep/drop decision judged against
    // the q79 rule battery, per source — the binary-decision leg of
    // the release gate (q189 ranks, q147 calibrates, this decides).
    "q195_classifier_pr" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select(
        col("doc_id"), col("source"), col("text"),
        (TextOps.qualityMargin("text") >= 0.0).as("pred"))
      Eval.classifierPr(
        TextOps.gopherRulesUnsorted(docs,
          carryCols = Seq("source", "pred")),
        Seq("source"), "pred", "passes")
    }),
    // Exact Pearson correlation matrix between event-type daily
    // series (r8-cont) — co-movement diagnostic; decimal(38,0) sums,
    // zero-filled day grid, IEEE only at the boundary (two
    // correctly-rounded sqrts + one division). NOT Spark's corr
    // (partition-order-dependent double accumulator).
    "q193_type_correlation" -> ((s, dir) =>
      graft.ops.Analytics.typeCorrelationMatrix(Tables.events(s, dir))),
    // Recursive CTE hierarchy walk (r8-cont): Spark 4's WITH
    // RECURSIVE over a deterministic 8-ary tree on the contiguous
    // orderkeys (parent = k DIV 8) — the org-chart/BOM traversal the
    // chained-CTE family (§2.6) stops short of. BFS by level, ~6
    // rounds at sf0.1, each a broadcast-able equi-join of one level
    // against the full table; DuckDB replays with its own recursive
    // CTE (`//` for DIV — dialects differ, semantics identical).
    "q196_recursive_tree" -> ((s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("orders_tree")
      s.sql("""
        WITH RECURSIVE anc(k, parent, depth) AS (
          SELECT o_orderkey AS k, CAST(NULL AS BIGINT) AS parent,
                 CAST(0 AS BIGINT) AS depth
          FROM orders_tree WHERE o_orderkey < 8
          UNION ALL
          SELECT o.o_orderkey AS k, a.k AS parent, a.depth + 1 AS depth
          FROM orders_tree o JOIN anc a ON o.o_orderkey DIV 8 = a.k
          WHERE o.o_orderkey >= 8
        )
        SELECT k, parent, depth FROM anc ORDER BY k""")
    }),
    // Golden-record survivorship (r8-cont): per customer, each field
    // independently from the LATEST order where it is non-null —
    // "latest non-null per field", the MDM rule row-wise SCD-1
    // deliberately isn't. Deterministic masking plants nulls so the
    // per-field independence is observably binding. One struct-max
    // aggregate, map-side combined.
    "q192_golden_record" -> ((s, dir) => {
      val r = Tables.orders(s, dir).select(
        col("o_custkey"), col("o_orderdate").as("ts"),
        col("o_orderkey").as("rid"),
        when(col("o_orderkey") % 3 === 0, lit(null))
          .otherwise(col("o_orderpriority")).as("priority"),
        when(col("o_orderkey") % 4 === 0, lit(null))
          .otherwise(col("o_orderstatus")).as("status"),
        when(col("o_orderkey") % 5 === 0, lit(null))
          .otherwise(col("o_totalprice")).as("amount"))
      Entity.goldenRecord(r, "o_custkey", "ts", "rid",
        Seq("priority", "status", "amount"))
    }),
    // Interval-overlap join (r8-cont): user sessions × daily
    // maintenance windows [00:00, 06:00) — two interval sets joined
    // on overlap with the exact shared microseconds. Binned
    // equi-join (the q42 discipline, both sides exploded), a pair
    // sharing several bins emits once via the first-shared-bin
    // integer rule — no distinct pass. Half-open semantics:
    // touching intervals and empty (single-event) sessions never
    // pair.
    "q191_overlap_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val sess = Sessions.sessionize(ev)
      val wins = ev
        .select(date_trunc("day", col("ts")).as("win_start")).distinct()
        .select(col("win_start"),
          (col("win_start") + expr("INTERVAL 6 HOURS")).as("win_end"))
      RangeJoin.overlapBinned(sess, wins,
          "session_start", "session_end", "win_start", "win_end")
        .orderBy("user_id", "session_id", "win_start")
    }),
    // Exact grouped ROC-AUC (r8-cont): per-source discrimination of
    // the q89 quality score against a language-ID target — the
    // threshold-free ranking metric the calibration report (q147)
    // deliberately isn't. Mann-Whitney rank-sum with tie-averaged
    // ranks carried as exact integers (2R in decimal(38,0)); the
    // final division is the only IEEE op; degenerate groups → NULL.
    "q189_roc_auc" -> ((s, dir) =>
      Eval.rocAuc(
        Tables.documents(s, dir).select(
          col("source"),
          TextOps.qualityMargin("text").as("clf_score"),
          (col("lang") === "en").as("y")),
        Seq("source"), "clf_score", "y")),
    // Incremental Gold maintenance (r8-cont): the monthly revenue
    // Gold computed the way a 100 TB warehouse actually refreshes it
    // — a STORED partial aggregate over history (< 2000) merged with
    // the new slice's partial aggregate (≥ 2000), never rescanning
    // history. The oracle is the ONE-SHOT aggregate over everything:
    // the hash match IS the delta-maintenance correctness proof.
    // Exact by construction: decimal sums, counts, min/max merge
    // order-independently; avg derives at the output boundary.
    "q188_incremental_gold" -> ((s, dir) => {
      val o = Tables.orders(s, dir).select(
        date_trunc("month", col("o_orderdate")).cast("date")
          .as("order_month"),
        col("o_totalprice").cast(DecimalType(18, 2)).as("price"))
      val cut = lit("2000-01-01").cast("date")
      def part(df: DataFrame) = Incremental.partialAggregate(
        df, Seq("order_month"), sumCols = Seq("price"),
        minCols = Seq("price"), maxCols = Seq("price"),
        countCol = "n_orders")
      val stored = part(o.filter(col("order_month") < cut))
      val delta = part(o.filter(col("order_month") >= cut))
      Incremental.merge(Seq(stored, delta), Seq("order_month"),
        sumCols = Seq("price"), minCols = Seq("price"),
        maxCols = Seq("price"), countCol = "n_orders")
        .select(col("order_month"), col("n_orders"),
          col("sum_price").cast(DoubleType).as("revenue"),
          col("min_price").cast(DoubleType).as("min_price"),
          col("max_price").cast(DoubleType).as("max_price"),
          (col("sum_price").cast(DoubleType) / col("n_orders"))
            .as("avg_price"))
        .orderBy("order_month")
    }),
    // Incremental variance Gold (r8-cont): second moments are
    // mergeable too — the stored partial carries Σx and Σx² (cents
    // as longs, squares in decimal(38,0): a long Σx² wraps at ~4k
    // rows of 5e7-cent orders), the delta merges in, and population
    // variance/mean derive at the READ boundary. Oracle = one-shot
    // HUGEINT sums + the identical closed form: the hash match
    // proves moment-merging exactly like q188 proves sum-merging.
    "q198_incremental_variance" -> ((s, dir) => {
      val dec = (c: Column) => c.cast(DecimalType(38, 0))
      // BOTH moment columns ride in decimal(38,0) ≡ HUGEINT: Σx of
      // long cents wraps too once row counts reach warehouse scale
      // (the Incremental contract's overflow rule), not just Σx²
      val o = Tables.orders(s, dir).select(
        date_trunc("month", col("o_orderdate")).cast("date")
          .as("order_month"),
        dec(floor(col("o_totalprice") * lit(100.0) + lit(0.5))
          .cast("long")).as("cents"))
        .withColumn("cents_sq", col("cents") * col("cents"))
      val cut = lit("2000-01-01").cast("date")
      def part(df: DataFrame) = Incremental.partialAggregate(
        df, Seq("order_month"), sumCols = Seq("cents", "cents_sq"))
      val merged = Incremental.merge(
        Seq(part(o.filter(col("order_month") < cut)),
          part(o.filter(col("order_month") >= cut))),
        Seq("order_month"), sumCols = Seq("cents", "cents_sq"))
      merged.select(col("order_month"), col("n_rows"),
          (col("sum_cents").cast(DoubleType) /
            col("n_rows").cast(DoubleType) / lit(100.0)).as("mean_price"),
          ((dec(col("n_rows")) * col("sum_cents_sq") -
            dec(col("sum_cents")) * dec(col("sum_cents")))
            .cast(DoubleType) /
            (dec(col("n_rows")) * dec(col("n_rows"))).cast(DoubleType) /
            lit(10000.0)).as("var_price"))
        .orderBy("order_month")
    }),
    // SCD Type-2 dimension history (r8-cont): the changelog of each
    // user's event_type collapsed to versioned validity intervals —
    // consecutive duplicates merge, recurrences reopen, effective_to
    // chains half-open to the next run. ONE keyed exchange: the lag
    // (run-opener) pass and the lead/row_number pass share the same
    // (partition, order) spec, so the second Window reuses the
    // first's exchange+sort (plan-asserted in RangeUpsertSpec).
    "q187_scd2_history" -> ((s, dir) =>
      Upsert.scd2History(
        Tables.events(s, dir)
          .select("user_id", "ts", "event_id", "event_type"),
        Seq("user_id"), "ts", Seq("event_id"), Seq("event_type"))
        .orderBy("user_id", "version_seq")),
    // Robust volume-anomaly gate (r8-cont): per (event_type, day)
    // counts vs median ± k·MAD — the ingest-monitoring flag, in
    // EXACT integer arithmetic end to end (2·median and 2·MAD
    // carried as two-middle-rank sums; the flag is an integer
    // comparison, the robust score the only IEEE op). The salt
    // plants a 5× click burst on one day so the flag is observably
    // binding at every SF.
    "q185_volume_anomalies" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select("event_id", "ts", "event_type")
      val burst = ev.filter(col("event_type") === "click" &&
        to_date(date_trunc("day", col("ts"))) === to_date(lit("2024-01-15")))
      val salted = ev.unionByName(
        (1 to 4).map(i => burst.select(
          (col("event_id") + lit(i * 10000000L)).as("event_id"),
          col("ts"), col("event_type"))).reduce(_ unionByName _))
      Timeseries.volumeAnomalies(salted)
    }),
    // Oracle-gated md5 twin of the sign-LSH multi-probe path
    // (r8-cont, the q123 playbook on the last rows-only family):
    // identical pipeline — per-table sign buckets, lowest-margin
    // 1-/2-plane flip probes, ids-only candidate join, exact cosine
    // rerank — with md5-derived planes and fixed-point probe
    // scores, so ALL of it replays in SQL. q32 keeps the SplitMix64
    // production planes + the per-round Bench recall gate.
    "q184_lsh_md5_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.lshTopKMd5(emb, emb.filter(col("vec_id") < 50), 5)
    }),
    // IVF NOTE (r8, verdict item 7): the former q36_ivf_topk
    // (hash-codebook coarse quantizer, sign-LSH cells) is RETIRED as
    // a driver query — q128_ivf_kmeans is its strict superior
    // (oracle-gated END-TO-END including the k-means fit, recall@5
    // 0.940 vs 0.764 at the same probe fraction). The hash-cell
    // contrast itself stays measured: Similarity.ivfTopK is still
    // recall-gated every round in the Bench recall line (probe label
    // "q36_ivf_topk" kept for series continuity) and spec-covered by
    // SimilaritySessionsSpec.
    // Embedding-cosine near-dup dedup (exact baseline; q56 is the
    // LSH-fed scale path). Bounded to a deterministic 2000-vector
    // sample.
    "q33_embedding_dedup" -> ((s, dir) =>
      Similarity.cosineDedup(
        Tables.embeddings(s, dir).filter(col("vec_id") < 2000), 0.9)),
    // LSH-fed embedding dedup — the scale path — on a near-dup-
    // injected corpus (the testdata embeddings have no natural
    // cos≥0.9 pair, max ≈0.46, so q33's corpus would leave the drop
    // branch untested): every 5th vector is re-added as a scaled copy
    // (cosine is magnitude-invariant, so ×1.25 is a true near-dup
    // with identical LSH sign buckets). Oracle-gated — the oracle is
    // exact all-pairs dedup on the same corpus, so this row proves
    // LSH-fed ≡ exact end-to-end, not just rows>0.
    "q56_lsh_dedup" -> ((s, dir) => {
      val base = Tables.embeddings(s, dir).filter(col("vec_id") < 2000)
        .select(col("vec_id"),
          expr("transform(embedding, x -> cast(x as double))").as("embedding"))
      val dups = base.filter(col("vec_id") % 5 === 0)
        .select((col("vec_id") + 100000).as("vec_id"),
          transform(col("embedding"), x => x * lit(1.25)).as("embedding"))
      // auto-derived planes/tables (lshParamsFor): bucket population
      // targeted at ~256 as N grows, tables from the analytic miss
      // bound — the oracle stays the exact all-pairs answer, so the
      // derived parameters are themselves gated every round
      Similarity.cosineDedupLshAuto(base.unionByName(dups), 0.9)
    }),
    // Connected components (ops.Components, large-star/small-star —
    // O(log n) shuffle rounds): the transitive-closure tail of near-
    // dup dedup, run over a deterministic arithmetic edge set so the
    // DuckDB recursive-CTE oracle can replay it exactly. Edges live
    // inside 8-aligned key blocks plus sparse cross-block links —
    // components of varied shape (chains, stars, merged blocks).
    "q58_components" -> ((s, dir) => {
      val k = Tables.orders(s, dir).select(col("o_orderkey").as("k"))
      val intra = k.select(col("k").as("src"),
        (col("k") - col("k") % 8 + (col("k") * 5 + 3) % 8).as("dst"))
      val links = k.filter(col("k") % 100 === 0)
        .select(col("k").as("src"), (col("k") + 8).as("dst"))
      graft.ops.Components.connectedComponents(intra.unionByName(links))
        .orderBy("id")
    }),
    // Incremental component maintenance (r8-cont): q58's graph split
    // into a STORED labeling (the intra-block edges) plus a DELTA
    // (the cross-block links), folded together without replaying the
    // stored edges — the daily near-dup-graph refresh. The oracle is
    // q58's one-shot recursive-CTE SQL verbatim (the q95 ≡ q90
    // playbook): the hash match proves stored ⊕ delta ≡ full
    // recompute, because a labeling is a lossless contraction.
    "q190_incremental_components" -> ((s, dir) => {
      val k = Tables.orders(s, dir).select(col("o_orderkey").as("k"))
      val intra = k.select(col("k").as("src"),
        (col("k") - col("k") % 8 + (col("k") * 5 + 3) % 8).as("dst"))
      val links = k.filter(col("k") % 100 === 0)
        .select(col("k").as("src"), (col("k") + 8).as("dst"))
      val stored = graft.ops.Components.connectedComponents(intra)
      graft.ops.Components.incrementalComponents(stored, links)
        .orderBy("id")
    }),
    // Incremental repeat-rate (r9): the flagship pipeline's
    // trickiest Gold metric through the GoldState fold — history's
    // flag partial plus a delta partial whose LAG carry-in is the
    // stored user_last state (one max(struct) row per user), merged
    // and derived at read time. Oracle = q12's FULL-HISTORY SQL
    // verbatim: stored ⊕ delta ≡ one-shot proven by hash (the q190
    // argument for Pipeline.runIncremental's window machinery).
    "q199_incremental_repeat" -> ((s, dir) => {
      // three consumers (hist flags, delta flags, carry state) share
      // one curate rebuild: project the 4 needed columns once and
      // localCheckpoint (the single-tokenize discipline) — Spark
      // does not dedupe common lazy subtrees
      val c = Analog.curated(s, dir)
        .select("user_id", "booking_id", "booking_date", "booking_status")
        .localCheckpoint(true)
      val pivot = lit("1996-01-01").cast("date")
      val hist = c.filter(col("booking_date") < pivot)
      val delta = c.filter(col("booking_date") >= pivot)
      val carry = graft.etl.GoldState.carryFromState(
        graft.etl.GoldState.userLastPartial(hist))
      graft.etl.GoldState.repeatGold(
        graft.etl.GoldState.repeatFlags.merge(Seq(
          graft.etl.GoldState.repeatFlagsPartial(hist, None),
          graft.etl.GoldState.repeatFlagsPartial(delta, Some(carry)))))
    }),
    // Late-arrival repair (r9): the runIncrementalLate algebra for
    // the ORDER-DEPENDENT metric, oracle-gated — state folded from
    // on-time rows only (wrong LAG flags for late users' later
    // bookings), then repaired surgically: affected users anti-joined
    // out and recomputed from their full history (row-pruned
    // semi-join, never the table). Oracle = q12's full-history SQL
    // verbatim: repair(state \ U ∪ recompute(U)) ≡ one-shot by hash.
    "q201_late_repair_repeat" -> ((s, dir) => {
      val c = Analog.curated(s, dir)
        .select("user_id", "booking_id", "booking_date", "booking_status")
        .localCheckpoint(true)
      val isLate = date_format(col("booking_date"), "yyyy-MM")
        .isin("1995-03", "1995-04") && col("booking_id") % 3 === 0
      val onTime = c.filter(!isLate)
      val late = c.filter(isLate)
      val stale = graft.etl.GoldState.repeatFlagsPartial(onTime, None)
      val affected = late.filter(col("booking_status") === "confirmed")
        .select("user_id").distinct()
      val recomputed = graft.etl.GoldState.repeatFlagsPartial(
        c.join(affected, Seq("user_id"), "left_semi"), None)
      graft.etl.GoldState.repeatGold(
        stale.join(affected, Seq("user_id"), "left_anti")
          .unionByName(recomputed))
    }),
    // Incremental occupancy (r9): COUNT(DISTINCT apartment_id) made
    // mergeable by keeping state at the (checkin month, apartment)
    // grain — a distinct-count is not mergeable, a distinct-keyed
    // row count is. Two independent partials merge, the read-time
    // derivation replays Present's exact IEEE shape. Oracle = q07's
    // SQL verbatim.
    "q200_incremental_occupancy" -> ((s, dir) => {
      // both halves share one curate rebuild (see q199)
      val c = Analog.curated(s, dir)
        .select("apartment_id", "booking_date", "checkin_date",
          "checkout_date", "booking_status")
        .localCheckpoint(true)
      val pivot = lit("1996-01-01").cast("date")
      graft.etl.GoldState.occupancyGold(
        graft.etl.GoldState.occupancy.merge(Seq(
          graft.etl.GoldState.occupancyPartial(
            c.filter(col("booking_date") < pivot)),
          graft.etl.GoldState.occupancyPartial(
            c.filter(col("booking_date") >= pivot)))))
    }),
    // Incremental engagement (r11, verdict ask #4): the user_viewing-
    // style events feed folded as mergeable state — COUNT(DISTINCT
    // user_id) at the (week, event_type, user) grain (occupancy's
    // distinct-key trick), count sums, max maxes. Stale partial over
    // the on-time slice ⊕ late partial ≡ the one-shot q13 oracle over
    // ALL events, verbatim.
    "q207_incremental_engagement" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select("ts", "event_type", "user_id", "value")
        .localCheckpoint(true)
      val isLate = col("user_id") % 7 === 3
      graft.etl.GoldState.engagementGold(
        graft.etl.GoldState.engagement.merge(Seq(
          graft.etl.GoldState.engagementPartial(ev.filter(!isLate)),
          graft.etl.GoldState.engagementPartial(ev.filter(isLate)))))
    }),
    // Dynamic-partition-pruning flagship query (r10, oracle-gated):
    // the quarter predicate lives on a parquet month DIM only, so the
    // fact scan can prune its booking_month partitions solely through
    // the runtime DynamicPruningExpression (plan + 12/320-file census
    // asserted in PipelineSpec). Self-contained: lands Silver + dim
    // in a scratch dir, then runs Pipeline.quarterCityRevenue; the
    // oracle replays the plain quarter-filtered aggregate.
    "q202_quarter_city_revenue" -> ((s, dir) => {
      val base = s"${sys.props("java.io.tmpdir")}/graft_q202_" +
        s.sparkContext.applicationId
      val silverDir = s"$base/silver"
      Analog.curated(s, dir)
        .withColumn("booking_month",
          date_format(col("booking_date"), "yyyy-MM"))
        .write.mode("overwrite").partitionBy("booking_month")
        .parquet(silverDir)
      Pipeline.writeMonthDim(s, silverDir, s"$base/dim")
      Pipeline.quarterCityRevenue(s, silverDir, s"$base/dim", "1995-Q2")
    }),
    // Dimension-update repair algebra (r10, the q201 pattern listing-
    // price flavored): stale listing_price state built from the
    // ORIGINAL dim, a deterministic price correction (id % 7 == 3 →
    // price × 1.1), then the runIncrementalDimUpdate repair — the
    // touched WEEKS' state rows replaced by partials over the
    // corrected dim, untouched weeks kept as-is. Oracle = the
    // one-shot weekly average over the corrected dim: repair(stale \
    // W ∪ recompute(W)) ≡ one-shot proven by hash.
    "q203_dim_repair_price" -> ((s, dir) => {
      val orig = Analog.apartmentsRaw(s, dir)
      val fixed = orig.withColumn("price",
        when(col("id") % 7 === 3, col("price") * 1.1)
          .otherwise(col("price")))
      def conv(d: DataFrame) = Curate.convertApartmentPrices(
        Curate.parseRawDates(Curate.dedup(d), Seq("listing_created_on")),
        Tables.exchangeRates(s))
      val stale = graft.etl.GoldState.listingPricePartial(conv(orig))
      val touched = conv(fixed).filter(col("id") % 7 === 3)
        .select(Present.weekOf(col("listing_created_on")).as("week_start"))
        .distinct()
      val repaired = stale.join(touched, Seq("week_start"), "left_anti")
        .unionByName(
          graft.etl.GoldState.listingPricePartial(conv(fixed))
            .join(touched, Seq("week_start"), "left_semi"))
      graft.etl.GoldState.listingPriceGold(repaired)
    }),
    // Attributes-update repair algebra (r10, q203's sibling for the
    // harder case: cityname is a popular_cities STATE KEY, so a city
    // reassignment MOVES counts between rows — per-key surgery can't
    // express it; the repair replaces the affected bookings' WEEKS
    // wholesale with partials over the corrected curate). Oracle =
    // the one-shot weekly city counts over the corrected attributes.
    "q204_attr_repair_cities" -> ((s, dir) => {
      // r14: the correction enters as a COLUMN REWRITE over ONE
      // curated build (the q210/q211 device — cityname null = attr
      // left-join miss and attributesRaw citynames are never null, so
      // the guarded rewrite is pointwise identical to curating over
      // corrected attributes); the previous shape paid a second full
      // Bronze→Silver rebuild. Oracle unchanged, hash re-proven.
      val cur0 = Analog.curated(s, dir)
        .select("apartment_id", "booking_id", "booking_date",
          "booking_status", "cityname")
        .localCheckpoint(true)
      val hasAttr = col("cityname").isNotNull
      val corrCur = cur0.withColumn("cityname",
        when(col("apartment_id") % 13 === 5 && hasAttr, lit("ATLANTIS"))
          .otherwise(col("cityname")))
      val stale = graft.etl.GoldState.popularCitiesPartial(cur0)
      val touched = corrCur
        .filter(col("apartment_id") % 13 === 5 &&
          col("booking_status") === "confirmed")
        .select(Present.weekOf(col("booking_date")).as("week_start"))
        .distinct()
      val recomputed = graft.etl.GoldState.popularCitiesPartial(
        corrCur.withColumn("week_start",
            Present.weekOf(col("booking_date")))
          .join(touched, Seq("week_start"), "left_semi")
          .drop("week_start"))
      graft.etl.GoldState.popularCitiesGold(
        stale.join(touched, Seq("week_start"), "left_anti")
          .unionByName(recomputed))
    }),
    // Interleaved repair algebra (r11, verdict ask #1 — q201 ∘ q204):
    // a REALISTIC nightly window delivers late facts and dim
    // corrections together (the reference's raw layer is mutable
    // Postgres, `scripts/init_db.sql:11-80`). Timeline replayed in
    // order: fold the on-time history → MERGE a late-bookings delta
    // (order-free city counts, q201's split) → then an attributes
    // city-reassignment repair replaces the affected bookings' weeks
    // wholesale from the corrected FULL history (q204's algebra) —
    // which includes the late rows, so a late booking whose apartment
    // is ALSO being re-citied lands in the NEW city (the interaction
    // no single-repair query exercises). Final table ≡ the one-shot
    // oracle over the corrected attributes, proven by hash.
    "q205_interleaved_repair" -> ((s, dir) => {
      // r14: ONE curated build + the q210/q211 column-rewrite device
      // (cityname null = attr left-join miss, so the guarded rewrite
      // is pointwise identical to curating over corrected attributes);
      // the previous shape paid TWO full Bronze→Silver rebuilds.
      // Oracle unchanged, hash re-proven.
      val origCur = Analog.curated(s, dir)
        .select("apartment_id", "booking_id", "booking_date",
          "booking_status", "cityname")
        .localCheckpoint(true)
      val corrCur = origCur.withColumn("cityname",
        when(col("apartment_id") % 13 === 5 && col("cityname").isNotNull,
          lit("ATLANTIS")).otherwise(col("cityname")))
      val isLate = date_format(col("booking_date"), "yyyy-MM")
        .isin("1995-03", "1995-04") && col("booking_id") % 3 === 0
      // t0: on-time fold (original attrs)
      val stale = graft.etl.GoldState.popularCitiesPartial(
        origCur.filter(!isLate))
      // t1: late fold — the order-free merge (attrs still original:
      // the correction hasn't landed yet)
      val afterLate = graft.etl.GoldState.popularCities.merge(Seq(
        stale, graft.etl.GoldState.popularCitiesPartial(
          origCur.filter(isLate))))
      // t2: attributes repair — touched weeks replaced from the
      // corrected full history (late rows included)
      val touched = corrCur
        .filter(col("apartment_id") % 13 === 5 &&
          col("booking_status") === "confirmed")
        .select(Present.weekOf(col("booking_date")).as("week_start"))
        .distinct()
      val recomputed = graft.etl.GoldState.popularCitiesPartial(
        corrCur.withColumn("week_start",
            Present.weekOf(col("booking_date")))
          .join(touched, Seq("week_start"), "left_semi")
          .drop("week_start"))
      graft.etl.GoldState.popularCitiesGold(
        afterLate.join(touched, Seq("week_start"), "left_anti")
          .unionByName(recomputed))
    }),
    // Exchange-rate repair algebra (r11, the THIRD reference dim —
    // `curated_tranformation.py:121-125`): a corrected EUR rate
    // re-derives total_price_usd across every EUR booking; the
    // top_listings repair replaces the affected bookings' WEEKS
    // wholesale, because a (week, apartment) revenue row sums
    // bookings of several currencies and per-key surgery cannot
    // split it (q204's week-replacement pattern, rate-flavored).
    // Oracle = the one-shot weekly revenue over the corrected rates:
    // repair(stale \ W ∪ recompute(W)) ≡ one-shot proven by hash.
    "q206_rate_repair" -> ((s, dir) => {
      val fixedRates = Tables.exchangeRates(s)
        .withColumn("usd_rate",
          when(col("currency") === "EUR", lit(1.2))
            .otherwise(col("usd_rate")))
      // r14: ONE curated build — the corrected history re-derives
      // from the SAME build via the production repair re-derivation
      // (recurateBookingRate, the q208 device: a rate fix only moves
      // the USD columns); the previous shape paid a second full
      // Bronze→Silver rebuild. Oracle unchanged, hash re-proven.
      val full = Analog.curated(s, dir).localCheckpoint(true)
      val stale = graft.etl.GoldState.topListingsPartial(full)
      val corrected = Curate.recurateBookingRate(full, fixedRates)
        .select("booking_date", "booking_status", "currency",
          "apartment_id", "total_price_usd")
      val touched = corrected
        .filter(col("currency") === "EUR" &&
          col("booking_status") === "confirmed")
        .select(Present.weekOf(col("booking_date")).as("week_start"))
        .distinct()
      val recomputed = graft.etl.GoldState.topListingsPartial(
        corrected
          .withColumn("week_start", Present.weekOf(col("booking_date")))
          .join(touched, Seq("week_start"), "left_semi")
          .drop("week_start"))
      graft.etl.GoldState.topListingsGold(
        stale.join(touched, Seq("week_start"), "left_anti")
          .unionByName(recomputed))
    }),
    // Nightly rate×late interaction (r11 — the q205 pattern for the
    // THIRD dim, q201 ∘ q206): a late-bookings delta and a rate
    // correction land in the SAME night (the reference's raw layer is
    // mutable Postgres, `scripts/init_db.sql:11-80`). Timeline: fold
    // the on-time history at the ORIGINAL rates → MERGE the late
    // partials (rates still original: the fix hasn't landed) → then
    // the EUR rate repair replaces the affected bookings' weeks
    // wholesale from the corrected FULL history — which includes the
    // late rows, so a late EUR booking's revenue lands at the NEW
    // rate (the interaction neither q201 nor q206 exercises alone).
    // Final table ≡ the one-shot oracle over corrected rates, proven
    // by hash. PipelineNightlySpec proves the same composition at the
    // warehouse level (manifest, resume, one publish).
    "q208_rate_late_repair" -> ((s, dir) => {
      val fixedRates = Tables.exchangeRates(s)
        .withColumn("usd_rate",
          when(col("currency") === "EUR", lit(1.2))
            .otherwise(col("usd_rate")))
      val cols = Seq("booking_id", "booking_date", "booking_status",
        "currency", "apartment_id", "total_price_usd")
      // ONE curate build (r12, verdict ask #7 — this query paid two
      // full Bronze→Silver rebuilds and was the suite's heaviest):
      // the corrected history re-derives from the SAME build through
      // the production repair re-derivation (recurateBookingRate — a
      // rate fix only moves the USD columns), which is also the
      // sharper gate: the hash now proves the repair's own
      // re-derivation matches the oracle's one-shot money().
      val full = Analog.curated(s, dir).localCheckpoint(true)
      val origCur = full.select(cols.map(col): _*)
      val corrected = Curate.recurateBookingRate(full, fixedRates)
        .select(cols.map(col): _*).localCheckpoint(true)
      val isLate = date_format(col("booking_date"), "yyyy-MM")
        .isin("1995-03", "1995-04") && col("booking_id") % 3 === 0
      // t0: on-time fold at the original rates
      val stale = graft.etl.GoldState.topListingsPartial(
        origCur.filter(!isLate))
      // t1: late merge — order-free, rates still original
      val afterLate = graft.etl.GoldState.topListings.merge(Seq(
        stale, graft.etl.GoldState.topListingsPartial(
          origCur.filter(isLate))))
      // t2: EUR rate repair — touched weeks replaced from the
      // corrected full history (late rows included)
      val touched = corrected
        .filter(col("currency") === "EUR" &&
          col("booking_status") === "confirmed")
        .select(Present.weekOf(col("booking_date")).as("week_start"))
        .distinct()
      val recomputed = graft.etl.GoldState.topListingsPartial(
        corrected
          .withColumn("week_start", Present.weekOf(col("booking_date")))
          .join(touched, Seq("week_start"), "left_semi")
          .drop("week_start"))
      graft.etl.GoldState.topListingsGold(
        afterLate.join(touched, Seq("week_start"), "left_anti")
          .unionByName(recomputed))
    }),
    // Compensation round trip (r11 — q203 composed with its own
    // inverse): a dim price fix is applied via the repair algebra,
    // then COMPENSATED by re-applying the superseded versions (the
    // SCD-2 history snapshot) through the SAME algebra — the forward
    // path is its own inverse for changed rows. Final Gold ≡ the
    // weekly listing price over the ORIGINAL dim, proven by hash
    // against q06's untouched oracle. PipelineCompensateSpec proves
    // the same round trip at the warehouse level (Silver, all states,
    // current dims) for all three dim kinds.
    "q209_compensate_roundtrip" -> ((s, dir) => {
      val orig = Analog.apartmentsRaw(s, dir)
      val fixed = orig.withColumn("price",
        when(col("id") % 7 === 3, col("price") * 1.1)
          .otherwise(col("price")))
      def conv(d: DataFrame) = Curate.convertApartmentPrices(
        Curate.parseRawDates(Curate.dedup(d), Seq("listing_created_on")),
        Tables.exchangeRates(s))
      // touched weeks: the affected ids' listing weeks (dates don't
      // move under a price fix, so the update's and the
      // compensation's touched sets coincide)
      val touched = conv(fixed).filter(col("id") % 7 === 3)
        .select(Present.weekOf(col("listing_created_on")).as("week_start"))
        .distinct()
      // t0 → t1: the q203 forward repair lands the fix
      val updated = graft.etl.GoldState.listingPricePartial(conv(orig))
        .join(touched, Seq("week_start"), "left_anti")
        .unionByName(
          graft.etl.GoldState.listingPricePartial(conv(fixed))
            .join(touched, Seq("week_start"), "left_semi"))
      // t1 → t2: compensation re-applies the superseded versions —
      // the identical algebra with history (= orig) as the feed
      val compensated = updated
        .join(touched, Seq("week_start"), "left_anti")
        .unionByName(
          graft.etl.GoldState.listingPricePartial(conv(orig))
            .join(touched, Seq("week_start"), "left_semi"))
      graft.etl.GoldState.listingPriceGold(compensated)
    }),
    // Two-night composition (r12, verdict ask #1's in-query replay —
    // q205 ∘ q204): the repair algebra applied TWICE in sequence, the
    // second night's repair running over the FIRST night's already-
    // repaired state. Timeline: on-time fold → night 1 = late merge +
    // attr move #1 (%13==5 → ATLANTIS) → night 2 = attr move #2
    // (%11==7 → NEOPOLIS, overriding night 1 where both apply).
    // Night 2's touched weeks replace night-1 content computed from a
    // DIFFERENT correction state — the cross-night interaction no
    // single-night query exercises. ≡ the one-shot oracle over the
    // cumulative corrections, proven by hash. Corrections enter as
    // column rewrites over ONE curated build (attr corrections only
    // exist where an attr row joined — cityname null = left-join
    // miss), keeping the query at q205's weight instead of paying
    // three curate rebuilds (the q208 bench lesson).
    // PipelineSoakSpec proves the same multi-night composition at the
    // warehouse level (manifests, rollback, pruning, asOf anchors).
    "q210_two_night_compose" -> ((s, dir) => {
      val cur0 = Analog.curated(s, dir)
        .select("apartment_id", "booking_id", "booking_date",
          "booking_status", "cityname")
        .localCheckpoint(true)
      val hasAttr = col("cityname").isNotNull
      val city1 = when(col("apartment_id") % 13 === 5 && hasAttr,
        lit("ATLANTIS")).otherwise(col("cityname"))
      val city2 = when(col("apartment_id") % 11 === 7 && hasAttr,
        lit("NEOPOLIS")).otherwise(city1)
      val cur1 = cur0.withColumn("cityname", city1)
      val cur2 = cur0.withColumn("cityname", city2)
      val isLate = date_format(col("booking_date"), "yyyy-MM")
        .isin("1995-03", "1995-04") && col("booking_id") % 3 === 0
      val wk = Present.weekOf(col("booking_date")).as("week_start")
      // t0: on-time fold (original attrs)
      val stale = graft.etl.GoldState.popularCitiesPartial(
        cur0.filter(!isLate))
      // night 1: late merge, then attr repair #1 from the night-1
      // corrected history (late rows included)
      val afterLate = graft.etl.GoldState.popularCities.merge(Seq(
        stale, graft.etl.GoldState.popularCitiesPartial(
          cur0.filter(isLate))))
      val t1 = cur1.filter(col("apartment_id") % 13 === 5 &&
          col("booking_status") === "confirmed")
        .select(wk).distinct()
      val night1 = afterLate.join(t1, Seq("week_start"), "left_anti")
        .unionByName(graft.etl.GoldState.popularCitiesPartial(
          cur1.withColumn("week_start",
              Present.weekOf(col("booking_date")))
            .join(t1, Seq("week_start"), "left_semi")
            .drop("week_start")))
      // night 2: attr repair #2 over night-1 state, history now
      // carrying BOTH corrections
      val t2 = cur2.filter(col("apartment_id") % 11 === 7 &&
          col("booking_status") === "confirmed")
        .select(wk).distinct()
      val night2 = night1.join(t2, Seq("week_start"), "left_anti")
        .unionByName(graft.etl.GoldState.popularCitiesPartial(
          cur2.withColumn("week_start",
              Present.weekOf(col("booking_date")))
            .join(t2, Seq("week_start"), "left_semi")
            .drop("week_start")))
      graft.etl.GoldState.popularCitiesGold(night2)
    }),
    // Rollback composition (r13 — q210 with an UNDO in the middle):
    // night 1 applies attr correction #1, night 2 applies #2, then
    // night 2 is ROLLED BACK exactly the way the warehouse does it —
    // its touched buckets replaced from the pre-fold undo snapshot
    // (content captured BEFORE night 2's rewrite) — and night 2'
    // applies a DIFFERENT correction #3 over the restored state, its
    // touched set and replacement content computed from the #1+#3
    // cumulative history. The oracle is the one-shot over #1+#3 ONLY:
    // any residue of the rolled-back #2 (a NEOPOLIS row, a week
    // restored from post-#2 content) breaks the hash. Gates the
    // undo-restore algebra COMPOSED with a subsequent repair — the
    // warehouse twin is PipelineSnapshotSpec's rollback+refold leg.
    "q211_rollback_compose" -> ((s, dir) => {
      val cur0 = Analog.curated(s, dir)
        .select("apartment_id", "booking_id", "booking_date",
          "booking_status", "cityname")
        .localCheckpoint(true)
      val hasAttr = col("cityname").isNotNull
      val city1 = when(col("apartment_id") % 13 === 5 && hasAttr,
        lit("ATLANTIS")).otherwise(col("cityname"))
      val city2 = when(col("apartment_id") % 11 === 7 && hasAttr,
        lit("NEOPOLIS")).otherwise(city1)
      val city3 = when(col("apartment_id") % 7 === 2 && hasAttr,
        lit("ELDORADO")).otherwise(city1) // #2 rolled back: over #1
      val cur1 = cur0.withColumn("cityname", city1)
      val cur2 = cur0.withColumn("cityname", city2)
      val cur3 = cur0.withColumn("cityname", city3)
      val isLate = date_format(col("booking_date"), "yyyy-MM")
        .isin("1995-03", "1995-04") && col("booking_id") % 3 === 0
      val wk = Present.weekOf(col("booking_date")).as("week_start")
      val stale = graft.etl.GoldState.popularCitiesPartial(
        cur0.filter(!isLate))
      val afterLate = graft.etl.GoldState.popularCities.merge(Seq(
        stale, graft.etl.GoldState.popularCitiesPartial(
          cur0.filter(isLate))))
      def repair(state: org.apache.spark.sql.DataFrame,
          cur: org.apache.spark.sql.DataFrame,
          touchedBy: Column): org.apache.spark.sql.DataFrame = {
        val t = cur.filter(touchedBy &&
            col("booking_status") === "confirmed")
          .select(wk).distinct()
        state.join(t, Seq("week_start"), "left_anti")
          .unionByName(graft.etl.GoldState.popularCitiesPartial(
            cur.withColumn("week_start",
                Present.weekOf(col("booking_date")))
              .join(t, Seq("week_start"), "left_semi")
              .drop("week_start")))
      }
      val night1 = repair(afterLate, cur1, col("apartment_id") % 13 === 5)
      val night2 = repair(night1, cur2, col("apartment_id") % 11 === 7)
      // rollback of night 2: its undo snapshot is the PRE-fold content
      // of the touched weeks (captured from night-1 state before the
      // rewrite, exactly what rewriteTouchedBuckets persists); weeks
      // night 2 CREATED have no snapshot rows and drop out
      val t2 = cur2.filter(col("apartment_id") % 11 === 7 &&
          col("booking_status") === "confirmed")
        .select(wk).distinct().localCheckpoint(true)
      val undo2 = night1.join(t2, Seq("week_start"), "left_semi")
      val restored = night2.join(t2, Seq("week_start"), "left_anti")
        .unionByName(undo2)
      val night2b = repair(restored, cur3, col("apartment_id") % 7 === 2)
      graft.etl.GoldState.popularCitiesGold(night2b)
    }),
    // Sequence packing: contiguous token-budget bins per (lang,
    // shard) — the pretraining batch-assembly op; sharded cumsum is
    // the scale path (no per-stratum serialization).
    "q59_pack_sequences" -> ((s, dir) =>
      TextOps.packSequences(Tables.documents(s, dir), budget = 256L)),
    // Vocabulary building: corpus token frequencies pruned at
    // minCount, ranked into contiguous vocab ids.
    "q60_build_vocab" -> ((s, dir) =>
      TextOps.buildVocab(Tables.documents(s, dir), minCount = 5L)),
    // Weighted corpus interleave (data mixing): first 100 positions
    // of the WFQ-merged stream at fixed per-language proportions.
    "q61_interleave" -> ((s, dir) =>
      TextOps.weightedInterleave(Tables.documents(s, dir),
        Map("en" -> 0.5, "de" -> 0.125, "es" -> 0.125,
          "fr" -> 0.125, "zh" -> 0.125), k = 100)),
    // Weighted sampling as systematic PPS (libm-free — window sums +
    // floor, bit-reproducible cross-engine): 8 picks per lang,
    // inclusion proportional to document length.
    "q64_pps_sample" -> ((s, dir) =>
      TextOps.ppsSample(Tables.documents(s, dir), k = 8,
        weightCol = "n_chars")),
    // Tokenizer application: greedy longest-match encode of the
    // corpus with its own q60 vocabulary (minCount=5), emitted as
    // scalar piece rows. In-vocab words encode to their id; an OOV
    // word whose PREFIX is a vocab entry splits into pieces (the
    // WordPiece shape) and the tail becomes vocab_id 0. Hash-exact
    // oracle: DuckDB rebuilds the identical vocab and replays the
    // greedy match with a recursive CTE.
    // The raw corpus's every word is itself a vocab entry (tiny
    // synthetic token universe), which would leave the multi-piece
    // and OOV branches vacuous — so the ENCODED corpus is salted with
    // composite words built from each doc's own first token
    // (tok1||tok1 → two pieces; tok1||"9q" → piece + OOV tail) while
    // the vocab is built from the raw corpus. Both engines replay the
    // identical salt.
    // Bloom-prefiltered incremental exact dedup: the corpus's text
    // bitmap is broadcast; shard docs that cannot be duplicates skip
    // the membership join entirely, and exact md5 verification of the
    // bloom candidates makes the result identical to the plain exact
    // rule — which is what the oracle replays. The corpus carries no
    // natural exact dups, so the shard is salted: %10==3 docs re-id'd
    // as exact corpus dups, %10==7 docs as genuinely new text, plus a
    // second copy of the new text as a within-shard dup.
    "q72_bloom_dedup" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val shard = docs.filter(col("doc_id") % 10 === 3)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text"))
        .unionByName(docs.filter(col("doc_id") % 10 === 7)
          .select((col("doc_id") + 2000000).as("doc_id"),
            concat(col("text"), lit(" shardnew "),
              col("doc_id").cast("string")).as("text")))
        .unionByName(docs.filter(col("doc_id") % 10 === 7)
          .select((col("doc_id") + 3000000).as("doc_id"),
            concat(col("text"), lit(" shardnew "),
              col("doc_id").cast("string")).as("text")))
      Bloom.dedupAgainstCorpus(docs, shard)
    }),
    // Temperature resampling at α = 0.5 (the one engine-exact power):
    // per-language targets ∝ sqrt(n_l), min-k md5 selection.
    "q73_temperature_sample" -> ((s, dir) =>
      TextOps.temperatureSample(Tables.documents(s, dir), budget = 100)),
    // Characteristic terms: rational-idf TF-IDF top-3 per document
    // (log-idf deliberately avoided — libm rounding differs across
    // engines; tf·N/df is two fixed-order IEEE ops).
    "q74_tfidf_terms" -> ((s, dir) =>
      TextOps.tfIdfTopTerms(
        Tables.documents(s, dir).filter(col("doc_id") < 100), k = 3)),
    // Symmetric int8 embedding quantization in row form; floor(x+0.5)
    // rounding replays exactly in DuckDB.
    "q75_quantize_int8" -> ((s, dir) =>
      Quantize.int8Rows(
        Tables.embeddings(s, dir).filter(col("vec_id") < 100))),
    // Corpus-trained bigram LM fluency score (mean transition
    // probability; rational p + position-ordered fold keep it
    // engine-exact — no log-perplexity, ln is libm-specific).
    "q76_lm_score" -> ((s, dir) =>
      TextOps.bigramLmScore(Tables.documents(s, dir))),
    // Per-source monitoring report: volume, token mass, length
    // profile, short-doc fraction.
    "q77_source_report" -> ((s, dir) =>
      TextOps.sourceReport(Tables.documents(s, dir))),
    // Exact duplicated-span audit (k-token windows shared across
    // documents). The synthetic corpus shares no natural 8-grams, so
    // it is span-salted: every %20==0 doc gets a clone of its first
    // 30 tokens as a new doc — those 23 windows then occur in 2 docs
    // and both sides of each pair score dup windows. Both engines
    // replay the identical salt.
    "q78_dup_spans" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val salted = docs.unionByName(docs.filter(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 200000).as("doc_id"),
          array_join(slice(TextOps.tokens(col("text")), 1, 30), " ")
            .as("text")))
      TextOps.dupSpans(salted)
    }),
    // Gopher-style rule battery: per-rule verdicts + first-failing
    // reject reason. Default thresholds discriminate on this corpus
    // (every rule rejects a non-empty subset).
    "q79_quality_rules" -> ((s, dir) =>
      TextOps.gopherRules(Tables.documents(s, dir))),
    // Cluster dedup with a quality policy: same LSH→verify→CC stack
    // as q66 but keeping the LONGEST member per near-dup cluster
    // (ties → min id) instead of the minimum id — oracle-gated by the
    // same brute-force-pairs + recursive-closure replay with an
    // argmax tail. Bounded to doc_id < 1000 (the q27/q66 discipline).
    "q80_best_of_cluster" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 1000)
      val verified = Dedup.jaccardVerify(
          Dedup.minHashCandidates(docs), docs,
          shingleLen = Dedup.ShingleLen)
        .filter(col("jaccard") >= 0.8)
      graft.ops.Components.componentDedupBest(
        docs.select("doc_id"), verified,
        TextOps.tokenStats(docs).select(col("doc_id"),
          col("n_tokens").as("score")),
        srcCol = "id_a", dstCol = "id_b")
    }),
    // The r6 curation composite: Gopher rule gate → LSH+verify
    // near-dup clusters → keep the LONGEST member per cluster →
    // α=0.5 temperature resampling of the survivors. Every stage is
    // individually oracle-gated (q79/q80/q73), and their composition
    // is deterministic, so the whole manifest is hash-exact too.
    // Bounded to doc_id < 1000 for the oracle's recursive closure.
    "q81_curation_v2" -> ((s, dir) =>
      TextOps.curateCorpusV2(
        Tables.documents(s, dir).filter(col("doc_id") < 1000),
        budget = 80)),
    // Binary-quantized ANN: sign-packed BIGINT words (32× smaller
    // than float32), Hamming top-400 prefilter, EXACT cosine re-rank —
    // the one approximate index whose whole result is hash-exact
    // (integer Hamming + fixed tie order + exact re-rank), so unlike
    // LSH/IVF it is oracle-gated end-to-end, not recall-gated.
    // rerank 200→400 in r8: a 64-dim corpus packs to ONE 64-bit word,
    // so Hamming ties are coarse and the exact-rerank budget is the
    // only recall lever — 0.816→0.932 recall@5 at flat cost
    // (ProfileHammingRerank sweep; the rerank scores q×400 pairs).
    "q82_hamming_ann" -> ((s, dir) => {
      val v = Tables.embeddings(s, dir)
      Similarity.hammingTopK(v, v.filter(col("vec_id") < 50), k = 10,
        rerank = 400)
    }),
    // Curation manifest: every input doc labeled with WHY it survived
    // or died (first failing quality rule / lost its near-dup cluster
    // / outside the temperature budget / kept + rank) — the
    // explainability artifact audits need. Same bounded corpus and
    // stage parameters as q81, so the oracle replays all four stages
    // and labels the complement too.
    "q86_curation_manifest" -> ((s, dir) =>
      TextOps.curationManifest(
        Tables.documents(s, dir).filter(col("doc_id") < 1000),
        budget = 80)),
    // ANN quality audit as a query: per-query overlap of the binary-
    // Hamming index's top-5 with the exact cosine top-5. Both sides
    // are deterministic, so the recall REPORT itself is hash-exact —
    // the oracle replays index build, search, re-rank, and the
    // ground-truth ranking.
    "q85_ann_recall" -> ((s, dir) => {
      val v = Tables.embeddings(s, dir)
      Similarity.annRecallReport(v, v.filter(col("vec_id") < 50), k = 5,
        rerank = 400)
    }),
    // Deterministic spherical k-means (3 Lloyd iterations): seeds =
    // lowest-id vectors, fixed-point centroid means, argmax-cosine
    // assignment — the clustering stage of SemDeDup-style curation.
    // Zero-shuffle assignment (centroids are a driver literal); the
    // oracle unrolls all 3 iterations as CTEs and is hash-exact.
    "q87_kmeans" -> ((s, dir) =>
      Cluster.kmeans(
        Tables.embeddings(s, dir).filter(col("vec_id") < 2000),
        k = 8, iters = 3)),
    // SemDeDup (Abbas et al. 2023): k-means cells, then the q33
    // cosine drop rule WITHIN cells only — Σ n_c² pairs instead of
    // N², cell-co-located join. Same near-dup-injected corpus as
    // q56 (the natural embeddings have no cos≥0.9 pair), so the
    // drop branch is non-vacuous and oracle-gated.
    "q88_semdedup" -> ((s, dir) => {
      val base = Tables.embeddings(s, dir).filter(col("vec_id") < 2000)
        .select(col("vec_id"),
          expr("transform(embedding, x -> cast(x as double))")
            .as("embedding"))
      val dups = base.filter(col("vec_id") % 5 === 0)
        .select((col("vec_id") + 100000).as("vec_id"),
          transform(col("embedding"), x => x * lit(1.25)).as("embedding"))
      Cluster.semDedup(base.unionByName(dups), 0.9, k = 8, iters = 2)
    }),
    // Fixed-weight linear quality classifier with a rational sigmoid
    // (no transcendentals → IEEE-exact, oracle-gated): the
    // "score every doc with a tiny model, threshold, keep" stage.
    "q89_quality_classifier" -> ((s, dir) =>
      TextOps.qualityClassifier(Tables.documents(s, dir))),
    // BM25 keyword retrieval (rational idf — no transcendentals, so
    // the whole ranking is hash-exact): corpus stats in one
    // partial-aggregated scan, scoring as a narrow projection,
    // top-20 via TakeOrderedAndProject — the quality-mining query.
    "q90_bm25_search" -> ((s, dir) =>
      TextOps.bm25Search(Tables.documents(s, dir),
        Seq("vector", "merge", "slow"), k = 20)),
    // PCA power iteration (3 rounds, fixed-point accumulation):
    // dominant principal direction of the centered embeddings +
    // per-vector projection — the whitening/compression stage,
    // deterministic end-to-end and oracle-gated.
    "q91_pca_power" -> ((s, dir) =>
      Pca.powerIteration(
        Tables.embeddings(s, dir).filter(col("vec_id") < 2000),
        iters = 3)),
    // Inverted-index BM25 — the interactive-serving scale path: ONE
    // tokenize pass builds persisted postings; the query reads only
    // its terms' postings (pushed isin filter). Same oracle as q90:
    // the hash match PROVES index-based ≡ scan-based scoring
    // bit-for-bit (the q56/q68 equivalence discipline). Index dir
    // scoped by application id (q68 concurrency discipline).
    // BPE merge learning: 10 rounds of weighted adjacent-pair
    // argmax + leftmost-non-overlap merge over the distinct-word
    // table — the canonical subword-tokenizer training loop,
    // hash-exact (see TextOps.bpeLearn's fold argument).
    "q120_bpe_learn" -> ((s, dir) =>
      TextOps.bpeLearn(Tables.documents(s, dir), numMerges = 10)),
    // The segmentation those merges induce: the final word -> pieces
    // table (what a tokenizer ships next to its merge list). Oracle =
    // the q120 rounds' END STATE instead of the merge log.
    "q121_bpe_segment" -> ((s, dir) =>
      TextOps.bpeSegment(Tables.documents(s, dir), numMerges = 10)),
    // Collocation mining: bigrams ranked by rational lift
    // c(ab)·N/(c(a)·c(b)) — PMI ordering without the log, so the
    // phrase ranking is hash-exact. minCount=5 suppresses the
    // unstable tail.
    "q119_collocations" -> ((s, dir) =>
      TextOps.collocations(Tables.documents(s, dir), k = 50,
        minCount = 5)),
    // Split-leakage audit: near-dup pairs straddling the NAIVE hash
    // split (per (split_a, split_b) cell, diagonal included) — the
    // release-gate check; the off-diagonal counts are exactly the
    // leaks leakageSafeSplit exists to zero out (SplitSpec proves
    // the safe variant audits clean on the same corpus).
    "q118_split_leakage" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 1000)
      Split.splitLeakageAudit(docs,
        Split.hashSplit(docs.select("doc_id"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)))
    }),
    // Passage-level retrieval with document max-pooling (the RAG
    // shape): 64/48 chunk windows, BM25 at passage granularity,
    // each doc represented by its best passage. Hash-exact.
    "q117_passage_search" -> ((s, dir) =>
      TextOps.passageSearch(Tables.documents(s, dir),
        Seq("vector", "merge", "slow"), k = 10)),
    // Cluster topic labeling: characteristic terms per k-means cell
    // (tf·N/df ranked within cluster) — the human-readable handle on
    // what each semantic cluster IS, composing q87's cells with
    // q74's rational tf-idf.
    "q116_cluster_terms" -> ((s, dir) => {
      val cells = Cluster.kmeans(Tables.embeddings(s, dir),
        k = 8, iters = 2)
      val docs = Tables.documents(s, dir)
        .join(cells.select(col("vec_id").as("doc_id"), col("cluster")),
          "doc_id")
      TextOps.tfIdfTopTerms(docs.select(col("cluster"), col("text")),
        k = 10, idCol = "cluster")
    }),
    // Dedup lineage manifest: every doc's canonical near-dup-cluster
    // id + dropped flag — the inverse mapping takedown requests need
    // (q66 answers "what survived"; this answers "where did X go").
    // Same bounded corpus and pair machinery as q66.
    // PageRank centrality dedup survivors: integer fixed-point
    // PageRank (3 rounds, all-`div` arithmetic) over the verified
    // near-dup graph; per cluster keep the most-central member — the
    // graph-aware alternative to q80's scalar best-of-cluster.
    // Padding-waste report for length-bucketed batching: what the
    // bucket layout costs in padded FLOPs before you train with it.
    "q149_length_buckets" -> ((s, dir) =>
      TextOps.lengthBuckets(Tables.documents(s, dir))),
    // Count-min sketch heavy-hitter audit: exact top-20 tokens with
    // their CMS estimates — the measured one-sided error of the
    // 1 KiB sketch that replaces a vocabulary-sized exact table.
    "q150_cms_hitters" -> ((s, dir) =>
      graft.ops.Sketch.cmsHeavyHitters(Tables.documents(s, dir), k = 20)),
    // Deterministic 256-register HyperLogLog distinct-count audit —
    // the md5-derived registers and the shift-based 2^-M sum replay
    // exactly in ANSI SQL, so the APPROXIMATE path itself is
    // oracle-gated (q48's builtin approx_count_distinct stays
    // rows-only: its sketch is engine-internal).
    "q151_hll_distinct" -> ((s, dir) =>
      graft.ops.Sketch.hllDistinct(Tables.events(s, dir),
        Seq("event_type"), "user_id")),
    // KMV bottom-k distinct sketch audit — the order-statistics
    // alternative; measured contrast to q151 (exact when sparse).
    "q152_kmv_distinct" -> ((s, dir) =>
      graft.ops.Sketch.kmvDistinct(Tables.events(s, dir),
        Seq("event_type"), "user_id")),
    // Histogram-quantile audit: the mergeable fixed-width histogram
    // (the two-pass-free distributed quantile) against the exact
    // rank statistic, with the one-bucket error bound.
    "q153_hist_quantiles" -> ((s, dir) =>
      graft.ops.Sketch.histQuantiles(Tables.documents(s, dir),
        "n_chars", lo = 0.0, hi = 1024.0, buckets = 128,
        qs = Seq(0.25, 0.5, 0.9, 0.99))),
    // Per-doc novelty: fraction of the doc's distinct 3-grams that
    // no other doc has — the corpus-contribution signal near-dup
    // dedup and per-doc repetition both miss.
    "q154_doc_novelty" -> ((s, dir) =>
      TextOps.docNovelty(Tables.documents(s, dir))),
    // q29's oracle-gated md5 twin (the q123 pattern): the min-k
    // document signature replayed hash-for-hash in DuckDB.
    "q155_fingerprint_md5" -> ((s, dir) =>
      TextOps.fingerprintMd5(Tables.documents(s, dir))),
    // Classifier calibration: reliability bins + per-bin ECE terms
    // for the q89 quality classifier against the q79 rule battery —
    // "when the filter says 0.8, is it right 80% of the time?"
    "q147_calibration" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.ops.Eval.calibrationReport(
        TextOps.qualityClassifier(docs), TextOps.gopherRules(docs))
    }),
    // Table profiler: per-column completeness/cardinality/range over
    // events — one scan, exact distincts (HLL++ twin documented in
    // ops.Stats for the first-pass-over-unknown-data shape).
    "q148_profile_table" -> ((s, dir) => {
      import graft.ops.Stats
      graft.ops.Stats.profileColumns(Tables.events(s, dir), Seq(
        "event_id" -> Stats.asString,
        "ts" -> ((c: org.apache.spark.sql.Column) =>
          Stats.tsMicros(c.cast("timestamp"))),
        "user_id" -> Stats.asString,
        "event_type" -> Stats.asString,
        "value" -> Stats.money2,
        "props" -> Stats.asString))
    }),
    // Fuzzy entity resolution: the structured-data twin of document
    // near-dup — token blocking, levenshtein verify, CC clustering,
    // min-rid golden record over a deterministic dirty registry
    // (catalog + one-char-deleted feed twin per part).
    "q146_entity_resolve" -> ((s, dir) => {
      graft.ops.Entity.entityResolve(
          graft.ops.Entity.dirtyRegistry(Tables.part(s, dir)))
        .orderBy("rid")
    }),
    "q145_centrality_dedup" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 1000)
      val verified = Dedup.jaccardVerify(
          Dedup.minHashCandidates(docs), docs,
          shingleLen = Dedup.ShingleLen)
        .filter(col("jaccard") >= 0.8)
      graft.ops.Components.centralitySurvivors(verified,
        srcCol = "id_a", dstCol = "id_b")
    }),
    "q114_dedup_lineage" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 1000)
      val verified = Dedup.jaccardVerify(
          Dedup.minHashCandidates(docs), docs,
          shingleLen = Dedup.ShingleLen)
        .filter(col("jaccard") >= 0.8)
      graft.ops.Components.dedupManifest(docs.select("doc_id"),
        verified, srcCol = "id_a", dstCol = "id_b")
    }),
    // Corpus version diff: snapshot CDC on the normalized content
    // key — added/removed/changed docs between two corpus versions
    // (synthetic edit/add/remove salt both engines replay).
    "q115_corpus_diff" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val old = d.filter(col("doc_id") % 13 =!= 0)
        .select(col("doc_id"),
          md5(TextOps.normalizeText(col("text"))).as("norm_key"))
      val latest = d.filter(col("doc_id") % 17 =!= 0)
        .select(col("doc_id"), md5(TextOps.normalizeText(
          when(col("doc_id") % 9 === 0,
            concat(col("text"), lit(" edited")))
            .otherwise(col("text")))).as("norm_key"))
      Diff.changes(old, latest, Seq("doc_id"))
        .select("doc_id", "change_type").orderBy("doc_id")
    }),
    // Quality-weighted PPS sampling: classifier keep-probability
    // (rational sigmoid, fixed-point scaled to integer weights)
    // drives the systematic PPS grid — high-quality docs sampled
    // proportionally more, zero-weight strata dropped. Composes q89
    // scoring with the q64 grid, hash-exact end to end.
    "q113_quality_pps" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val weighted = docs.select(col("lang"), col("doc_id"))
        .join(TextOps.qualityClassifier(docs).select(col("doc_id"),
          floor(col("clf_prob") * lit(1000000.0)).cast("long")
            .as("qw")), "doc_id")
      TextOps.ppsSample(weighted, k = 8, weightCol = "qw")
    }),
    // EXACT Jaccard similarity join: every pair at shingle-J >= 0.8,
    // guaranteed complete via the lossless prefix filter (no banding
    // miss bound) — the compliance-scan contract. Natural 0.8-pairs
    // exist in the corpus (q25 drops 24 docs), so no salt needed.
    "q112_exact_jaccard_join" -> ((s, dir) =>
      Dedup.exactJaccardJoin(Tables.documents(s, dir), threshold = 0.8)),
    // Embedding drift monitor: per-dimension mean/variance of two
    // snapshot halves (even vs odd ids) + mean shift and variance
    // ratio — catches a silently changed upstream embedder.
    // Fixed-point moments keep the whole report hash-exact.
    "q111_embedding_drift" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Pca.driftReport(emb.filter(col("vec_id") % 2 === 0),
        emb.filter(col("vec_id") % 2 === 1))
    }),
    // Hard-negative mining: per query the 5 most-similar corpus
    // vectors BELOW the 0.95 cosine ceiling — informative negatives
    // without unlabeled positives (a plain top-k would mine
    // near-dups as negatives). Deterministic ranking -> reproducible
    // negative sets, hash-exact.
    "q110_hard_negatives" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.hardNegatives(emb, emb.filter(col("vec_id") < 50),
        k = 5, ceiling = 0.95)
    }),
    // Materialized sequence packing: q59's bin plan turned into the
    // actual training artifact — per-bin documents concatenated in
    // packing order with an <eot> separator. Bin state is O(budget)
    // by construction.
    "q109_pack_materialize" -> ((s, dir) =>
      TextOps.packMaterialize(Tables.documents(s, dir), budget = 256L)),
    // Token-budget mixture: per-source token targets greedily filled
    // in md5 order (streaming-fill rule — the crossing doc is kept),
    // the unit real mixes are specified in. Budget 3000 keeps every
    // listed source under its inventory at sf0.01.
    "q106_token_mixture" -> ((s, dir) =>
      TextOps.mixtureSampleTokens(Tables.documents(s, dir),
        Seq("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.2,
          "src3" -> 0.1), tokenBudget = 3000)),
    // Multi-benchmark decontamination with per-benchmark attribution:
    // three eval pools (every 40th doc, set = (id/40) mod 3), one
    // corpus pass, only (doc, set) pairs with >= 1 shared 5-shingle
    // emitted.
    "q107_multi_decon" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val evals = docs.filter(col("doc_id") % 40 === 0)
        .select(pmod((col("doc_id") / 40).cast("long"), lit(3))
          .as("eval_id"), col("text"))
      TextOps.decontaminateMulti(docs, evals, n = 5, threshold = 0.5)
    }),
    // Normalized exact dedup: case/punctuation-insensitive key
    // (lower, strip non-alnum, collapse spaces) catches the variant
    // dups plain exact dedup misses. Salt: an UPPER-cased "+ !!"
    // copy of every 20th doc normalizes back to its original's key.
    "q108_normalized_dedup" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val salted = docs.unionByName(docs.filter(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 500000).as("doc_id"),
          concat(upper(col("text")), lit(" !!")).as("text")))
      TextOps.normalizedExactDedup(salted)
    }),
    // Explicit data-mixture materialization: tuned per-source weights
    // (not temperature-derived), min-k md5 selection, availability
    // cap — src0's 0.5-weight target exceeds its inventory at sf0.01,
    // exercising the cap; unlisted sources are excluded.
    "q104_mixture_apply" -> ((s, dir) =>
      TextOps.mixtureSample(Tables.documents(s, dir),
        Seq("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.15,
          "src3" -> 0.1), budget = 120)),
    // Epoch-repetition mixture (the up-sampling half of q104): budget
    // = corpus size, so the per-source shapes are SF-invariant —
    // src0's 0.22-weight target is 4.4× its inventory (hits the
    // maxEpochs=4 cap), src1's 1.2× repeats a full epoch plus an md5
    // fractional top-up, src2's 0.4× degenerates to plain sampling.
    // One inventory aggregate + one selection window + a ≤4-wide
    // sequence explode: output cardinality IS the work.
    "q160_epoch_mixture" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      TextOps.epochMixture(docs,
        Seq("src0" -> 0.22, "src1" -> 0.06, "src2" -> 0.02),
        budget = docs.count(), maxEpochs = 4)
    }),
    // Market-basket lift: item pairs co-ordered more often than
    // independence predicts — exact integer counts rank the top-100
    // (total tie order), the two ratios are output-boundary
    // divisions. Pair volume is Σ C(basket, 2) — basket-bounded.
    "q173_basket_lift" -> ((s, dir) =>
      graft.ops.Analytics.basketLift(Tables.lineitem(s, dir))),
    // Cohort retention matrix over orders: customers cohorted by
    // first-order month; each (cohort, months_since) cell counts the
    // returners. Ids-only distinct + a user-keyed min join — the
    // classic warehouse retention artifact the reference's
    // presentation layer stops short of.
    "q170_cohort_retention" -> ((s, dir) =>
      graft.ops.Analytics.cohortRetention(Tables.orders(s, dir),
        userCol = "o_custkey", tsCol = "o_orderdate")),
    // RFM segmentation: recency/frequency/monetary quartiles with
    // the custkey tie-break (engine-exact ntile), tier 1 = best,
    // "111" = champion.
    "q171_rfm_segments" -> ((s, dir) =>
      graft.ops.Analytics.rfm(Tables.orders(s, dir))),
    // The WAREHOUSE-SCALE RFM (r8): histogram-quantile tier bounds
    // instead of three global ntile sorts — and the whole sketch
    // pipeline (min/max, 1024-bucket histogram, rank interpolation,
    // value-cut tiers) replays hash-exact in the oracle, proving the
    // no-global-sort path computes real quantile tiers.
    "q174_rfm_sketch" -> ((s, dir) =>
      graft.ops.Analytics.rfmSketch(Tables.orders(s, dir))),
    // Per-priority weekly revenue trend: closed-form least squares
    // over exact decimal/long sums — the only IEEE op is the final
    // slope division, so the regression replays hash-exact (unlike
    // float-accumulated regr_slope).
    "q172_trend_slope" -> ((s, dir) =>
      graft.ops.Analytics.trendSlope(Tables.orders(s, dir),
        "o_orderpriority", "o_orderdate", "o_totalprice")),
    // First-order event transition matrix (r8): per-user LAG pairs →
    // exact prev→next counts, row-normalized over the ≤|types|²
    // frame — the Markov flow view next to q18's fixed funnel, and
    // the synthetic-stream QA gate. One user-keyed window shuffle;
    // probability is the single output-boundary division.
    "q179_event_transitions" -> ((s, dir) =>
      graft.ops.Analytics.eventTransitions(Tables.events(s, dir))),
    // Referential-integrity audit (r8): orphan keys/rows per FK edge
    // of the star schema — the cross-table gate that catches a
    // partial parent load before an inner join silently drops rows.
    // One (fk, count) aggregate per child, key-cardinality joins
    // only; the edge list is SHARED with the oracle builder.
    "q180_fk_audit" -> ((s, dir) =>
      graft.etl.Validate.referentialAudit(
        name => Tables.parquet(s, dir, name))),
    // Trailing-window features (r8): 7-day event count / max value /
    // days-since-previous-active-day per (user, day) — every
    // aggregate order-independent (no float accumulation), so the
    // feature table replays hash-exact. One key-partitioned shuffle
    // shared by both windows.
    "q181_rolling_features" -> ((s, dir) =>
      Timeseries.trailingFeatures(Tables.events(s, dir))),
    // Window-bounded last-touch attribution (r8): last view in the
    // 7-day lookback before each purchase + exact in-window view
    // count — the horizon-bounded sibling of q16's unbounded as-of.
    // Scale path: TWO probe rows per purchase through ONE union+
    // window pass (O(L+R) through the exchange, match-count-free);
    // the oracle replays it as the brute interval join + argmax.
    "q182_attribution" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("view_ts"),
          col("event_id").as("view_event_id"))
      graft.ops.Attribution.lastTouch(purchases, views, Seq("user_id"),
          leftId = "event_id", leftTime = "ts", rightTime = "view_ts",
          rightCols = Seq("view_event_id"), horizon = "7 days")
        .orderBy("event_id")
    }),
    // Pair-level attribution (r8): every qualifying (purchase, view)
    // pair in the half-open 7-day window — equi-join on user with
    // the horizon as a residual predicate, and the batch contract
    // the watermarked stream-stream interval join twin
    // (streaming.AttributionStream) is proven row-equal to.
    "q183_touch_pairs" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("view_ts"),
          col("event_id").as("view_event_id"))
      graft.ops.Attribution.touchPairs(purchases, views, Seq("user_id"),
          "ts", "view_ts", Seq("view_event_id"), "7 days")
        .orderBy("event_id", "view_event_id")
    }),
    // k-center greedy coreset: the 8 vectors that jointly span the
    // embedding space (max-min cosine distance, Sener & Savarese
    // 2018) — diversity-aware selection next to q92's balance and
    // q88's dedup. Driver holds ≤ k·dim model state; one narrow
    // scan per pick; fully oracle-gated via unrolled CTEs.
    "q169_coreset_select" -> ((s, dir) =>
      graft.ops.Cluster.coresetSelect(Tables.embeddings(s, dir), k = 8)),
    // Embedding validity audit — the first QA gate before indexing:
    // dimension / zero-norm / NaN / ±Inf flags per vector, one
    // codegen'd scan. The salt plants the four production corruption
    // modes (failed-encode zeros, model-mixup dim-32, overflow NaN,
    // pre-NaN overflow Inf) so every flag is observably binding.
    "q167_embedding_audit" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      def plant(id: Long)(f: Column => Column) =
        emb.filter(col("vec_id") === id)
          .select((col("vec_id") + 100000).as("vec_id"),
            f(col("embedding")).as("embedding"), col("label"))
      val zeroed = plant(0)(e => transform(e, _ => lit(0.0f)))
      val shortd = plant(1)(e => slice(e, 1, 32))
      val nand = plant(2)(e =>
        concat(array(lit(Float.NaN)), slice(e, 2, 63)))
      val infd = plant(3)(e =>
        concat(array(lit(Float.PositiveInfinity)), slice(e, 2, 63)))
      graft.ops.Pca.embeddingAudit(
        emb.unionByName(zeroed).unionByName(shortd)
          .unionByName(nand).unionByName(infd),
        expectedDim = 64)
    }),
    // Pairwise Jaccard histogram — the threshold-tuning artifact
    // (how many more pairs does 0.75 catch than 0.8; is there a
    // boilerplate mode at 0.5). Bounded brute-force sample per the
    // q27 discipline; thresholds are tuned on samples in practice.
    "q168_jaccard_histogram" -> ((s, dir) =>
      Dedup.jaccardHistogram(
        Tables.documents(s, dir).filter(col("doc_id") < 1000))),
    // Curation v3 — the release-shape composite chaining the r7-cont
    // operators end-to-end: per-source quantile quality gate (drop
    // bottom 20% of each source) → exact stratified test/val carving
    // among survivors → epoch-repetition mixture of the train
    // partition (budget = |train|, maxEpochs 2). Per-doc manifest
    // with the final epoch multiplicity.
    "q166_curation_v3" -> ((s, dir) =>
      TextOps.curationV3(Tables.documents(s, dir), dropFrac = 0.2,
        evalFracs = Seq("test" -> 0.1, "val" -> 0.1),
        weights = Seq("src0" -> 0.22, "src1" -> 0.06, "src2" -> 0.02),
        maxEpochs = 2)),
    // Exact stratified split: every language stratum allocates
    // floor(n·0.1 + 0.5) rows to test and to val by md5 rank,
    // remainder train — the eval-carving primitive hash splitting
    // (q100, probabilistic proportions) deliberately is not. For
    // frozen snapshots; growth-stable assignment stays q100's job.
    "q165_stratified_split" -> ((s, dir) =>
      graft.ops.Split.stratifiedSplit(Tables.documents(s, dir),
        Seq("test" -> 0.1, "val" -> 0.1), strataCols = Seq("lang"))),
    // Term-distribution drift between corpus versions: exact-integer
    // total-variation contributions (|c_old·N_new − c_new·N_old| as
    // decimal ≡ HUGEINT — the ranking never touches a float), IEEE
    // divisions only at the output boundary. Version B drops src0 —
    // the "re-crawl lost a feed" story.
    "q163_term_drift" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.ops.Diff.termDrift(docs,
        docs.filter(col("source") =!= "src0"), topK = 50)
    }),
    // Per-source quantile normalization of the q89 classifier score:
    // percent_rank within each source (unique order via the id
    // tie-break — the rational (rank−1)/(n−1) replays engine-exact),
    // keep = top 80% of EVERY source rather than a global cutoff
    // that over-keeps easy-scoring feeds.
    "q164_score_normalize" -> ((s, dir) =>
      TextOps.scoreQuantileNorm(
        Tables.documents(s, dir).select(col("doc_id"), col("source"),
          TextOps.qualityProb().as("clf_prob")),
        dropFrac = 0.2, scoreCol = "clf_prob")),
    // Per-cluster graph cohesion audit: node/edge/triangle counts and
    // density for every near-dup component — separates template
    // families (density → 1) from transitive chain over-merges BEFORE
    // a one-per-cluster dedup commits. Same verified-pair source and
    // closure oracle as q66; triangle counting is the canonical
    // a<b<c wedge-close join, counted once per triangle.
    "q162_cluster_stats" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 1000)
      val verified = Dedup.jaccardVerify(
          Dedup.minHashCandidates(docs), docs,
          shingleLen = Dedup.ShingleLen)
        .filter(col("jaccard") >= 0.8)
      graft.ops.Components.componentStats(verified,
        srcCol = "id_a", dstCol = "id_b")
    }),
    // Cross-source near-dup provenance audit: verified near-dup pairs
    // counted per unordered source pair — scraper-overlap and mirror
    // detection between ingest feeds. Bounded corpus per the q66
    // closure-oracle discipline; pairs replayed brute-force.
    "q105_cross_source_dups" -> ((s, dir) =>
      Dedup.crossSourceDups(
        Tables.documents(s, dir).filter(col("doc_id") < 1000))),
    // kNN label propagation: odd vectors (queries, bounded to 200)
    // take the majority label of their 5 nearest EVEN (seed-labeled)
    // neighbors via the deterministic Hamming+exact-rerank index —
    // classification is hash-exact, so label regressions gate like
    // correctness ones.
    "q103_knn_label" -> ((s, dir) => {
      val v = Tables.embeddings(s, dir)
      Similarity.knnClassify(
        v.filter(col("vec_id") % 2 === 0),
        v.filter(col("vec_id") % 2 === 1 && col("vec_id") < 400),
        k = 5, rerank = 50)
    }),
    // Label-error detection (confident-learning shape): every audited
    // vector scored against the majority label of its 5 nearest OTHER
    // labeled points via the deterministic Hamming+exact-rerank
    // index; flagged = neighborhood outvotes the own label. The
    // bounded query slice is the audit batch; neighbors come from the
    // FULL labeled pool. Hash-exact like q103, so label-noise
    // regressions gate like correctness ones.
    "q161_label_errors" -> ((s, dir) => {
      val v = Tables.embeddings(s, dir)
      Similarity.labelErrors(v, v.filter(col("vec_id") < 400),
        k = 5, rerank = 50)
    }),
    // CCNet-style perplexity buckets: bigram-LM score -> 3 equal
    // ntile fluency buckets -> keep all of head, min-k-md5 half of
    // middle, none of tail; emitted as a per-doc VERDICT (manifest
    // shape). Engine-exact end to end: rational LM score, standard
    // ntile, md5 selection.
    "q102_ppl_buckets" -> ((s, dir) =>
      TextOps.perplexityBucketSample(Tables.documents(s, dir))),
    // q102's WAREHOUSE-SCALE twin (r8): fluency buckets value-cut at
    // histogram-quantile bounds of lm_score instead of the global
    // ntile sort — the rfmSketch discipline applied to the quality
    // family's one remaining global window; the whole sketch replays
    // hash-exact in the oracle (q174 playbook).
    "q175_ppl_buckets_sketch" -> ((s, dir) =>
      TextOps.perplexityBucketSampleSketch(Tables.documents(s, dir))),
    // Shard-wise index build + merge compaction: even/odd doc shards
    // each build their own inverted index, the merge unions postings
    // and sums stats, and querying the merged index hash-matches the
    // q90 full-corpus SCAN oracle — proving merge-compacted ≡
    // built-from-scratch bit-for-bit (the q95 equivalence argument
    // extended across the merge).
    "q99_index_merge" -> ((s, dir) => {
      val base = s"${sys.props("java.io.tmpdir")}/graft_q99_" +
        s.sparkContext.applicationId
      val docs = Tables.documents(s, dir)
      TextOps.buildInvertedIndex(
        docs.filter(col("doc_id") % 2 === 0), s"$base/even")
      TextOps.buildInvertedIndex(
        docs.filter(col("doc_id") % 2 === 1), s"$base/odd")
      TextOps.mergeInvertedIndexes(s,
        Seq(s"$base/even", s"$base/odd"), s"$base/merged")
      TextOps.bm25FromIndex(s, s"$base/merged",
        Seq("vector", "merge", "slow"), k = 20)
    }),
    // Deterministic train/val/test hash split (80/10/10): one
    // codegen'd md5 projection, no RNG, no shuffle; an id's split is
    // stable under corpus growth. Both engines decide each split
    // with one lexicographic hex comparison.
    "q100_hash_split" -> ((s, dir) =>
      Split.hashSplit(Tables.documents(s, dir),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))),
    // Leakage-safe split: near-dup clusters (the q66 LSH→verify→CC
    // stack) are split AS UNITS via their canonical min id, so a
    // test doc can never have a train near-duplicate. Bounded to
    // doc_id < 1000 per the q66 closure-oracle discipline.
    "q101_leakage_split" -> ((s, dir) =>
      Split.leakageSafeSplit(
        Tables.documents(s, dir).filter(col("doc_id") < 1000),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))),
    // Johnson–Lindenstrauss random projection 64 → 16 dims with a
    // deterministic ±1 sign matrix (prime-modulus parity mix) and
    // fixed-point accumulation — element-wise oracle replay, emitted
    // rows bounded to vec_id < 200, scalar-row shape (q75 discipline).
    "q98_random_project" -> ((s, dir) =>
      Pca.randomProject(Tables.embeddings(s, dir), outDim = 16,
        outputIds = 200)),
    // Containment dedup: drops docs ≥0.8-contained (3-shingle sets)
    // in a LARGER doc — the doc-inside-doc case Jaccard dedup misses
    // (a 40-token prefix copy of a 100-token page has J ≈ 0.4 but
    // C = 1.0). Candidates via the LOSSLESS prefix filter, so the
    // oracle's brute-force replay matches exactly. Salt: a 40-token
    // prefix copy of every 25th doc (+300000) guarantees real drops.
    "q97_containment_dedup" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val salted = docs.unionByName(docs.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + 300000).as("doc_id"),
          array_join(slice(TextOps.tokens(col("text")), 1, 40), " ")
            .as("text")))
      Dedup.containmentDedup(salted, threshold = 0.8)
    }),
    // C4-style duplicated-span REMOVAL (q78's audit turned into a
    // rewriter): tumbling 8-token blocks, corpus-wide first
    // occurrence (doc_id, block_idx) survives, docs reassembled.
    // Same span-salt as q78 so removal is non-vacuous: each salted
    // copy loses its 3 copied blocks and shrinks to its remainder.
    "q96_span_scrub" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val salted = docs.unionByName(docs.filter(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 200000).as("doc_id"),
          array_join(slice(TextOps.tokens(col("text")), 1, 30), " ")
            .as("text")))
      TextOps.spanScrub(salted)
    }),
    // Boundary-robust sliding-window span removal (Lee et al.-style
    // exact substring dedup at window granularity). The salt plants
    // the copied span behind a one-token 'pad' prefix — the +1
    // alignment q96's tumbling blocks are BLIND to (SlidingScrubSpec
    // proves it); here the clone scrubs down to its prefix.
    "q122_sliding_scrub" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val salted = docs.unionByName(docs.filter(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 300000).as("doc_id"),
          concat_ws(" ", lit("pad"),
            array_join(slice(TextOps.tokens(col("text")), 1, 30), " "))
            .as("text")))
      TextOps.slidingScrub(salted)
    }),
    "q95_bm25_indexed" -> ((s, dir) => {
      val idxDir = s"${sys.props("java.io.tmpdir")}/graft_q95_idx_" +
        s.sparkContext.applicationId
      TextOps.buildInvertedIndex(Tables.documents(s, dir), idxDir)
      TextOps.bm25FromIndex(s, idxDir,
        Seq("vector", "merge", "slow"), k = 20)
    }),
    // Persisted IVF index serving path (r8): build the cell-
    // partitioned index once, answer from a partition-PRUNED read of
    // the probed cells. Same oracle as q128 — the hash match proves
    // stored-index ≡ in-memory-fit bit-for-bit (the q95 ≡ q90
    // equivalence argument, extended to the learned quantizer).
    "q176_ivf_indexed" -> ((s, dir) => {
      val idxDir = s"${sys.props("java.io.tmpdir")}/graft_q176_idx_" +
        s.sparkContext.applicationId
      val emb = Tables.embeddings(s, dir)
      Similarity.buildIvfIndex(emb, idxDir, numCentroids = 32, iters = 2)
      Similarity.ivfFromIndex(s, idxDir,
        emb.filter(col("vec_id") < 50), 5, nProbe = 16)
    }),
    // Persisted PQ index serving path (r8): codebooks + the
    // ~m·4+8-byte encoded scan side + id-keyed vectors for the exact
    // tail. Same oracle as q134 — stored-index ≡ in-memory PQ,
    // all eight subspace fits included.
    "q177_pq_indexed" -> ((s, dir) => {
      val idxDir = s"${sys.props("java.io.tmpdir")}/graft_q177_idx_" +
        s.sparkContext.applicationId
      val emb = Tables.embeddings(s, dir)
      Similarity.buildPqIndex(emb, idxDir, m = 8, codesPerSub = 16,
        iters = 2)
      Similarity.pqFromIndex(s, idxDir,
        emb.filter(col("vec_id") < 50), 5, rerank = 400)
    }),
    // Daily LOCF gap-fill (r8): one row per (user, day) across each
    // user's own activity span, quiet days carrying the previous
    // observation with is_gap=true — the feature-store alignment
    // step. Per-key spine, values untouched end-to-end (bit-exact).
    "q178_gap_fill" -> ((s, dir) =>
      Timeseries.gapFillLocf(
        Tables.events(s, dir).filter(col("user_id") < 40))),
    // Hybrid retrieval: BM25 top-50 + exact-cosine top-50 (query =
    // vec 0's embedding) fused by reciprocal-rank fusion 1/(60+r) —
    // pure rational arithmetic, so the fused ranking is hash-exact.
    // Cost lives in the two retrievers; fusion joins two 50-row
    // lists.
    "q94_hybrid_search" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val bm = TextOps.bm25Search(Tables.documents(s, dir),
        Seq("vector", "merge", "slow"), k = 50)
      val cos = Similarity.bruteForceTopK(emb,
          emb.filter(col("vec_id") === 0), k = 50)
        .select(col("corpus_id").as("doc_id"), col("rank"))
      Similarity.rrfFuse(bm.select(col("doc_id"), col("rank")), cos,
        k = 10)
    }),
    // Per-dimension z-score standardization (fixed-point moments —
    // order-independent integer sums make the stats bit-stable):
    // stats over the whole corpus, output bounded to vec_id < 100
    // and exploded to scalar rows (the q75 element-wise discipline).
    "q93_standardize" -> ((s, dir) =>
      Pca.standardize(Tables.embeddings(s, dir), outputIds = 100)),
    // Cluster-balanced sampling: k-means cells as the strata of the
    // α=0.5 temperature mix — flattens semantic-topic imbalance the
    // way q73 flattens language imbalance. Oracle replays the cells
    // AND the mix.
    "q92_balanced_sample" -> ((s, dir) =>
      Cluster.balancedSample(Tables.documents(s, dir),
        Tables.embeddings(s, dir), budget = 100, k = 8, iters = 2)),
    // Semantic-outlier scores: per-language fixed-point centroid +
    // per-doc cosine to its group centroid; lang_rank 1 = strongest
    // outlier per language.
    "q83_centroid_outlier" -> ((s, dir) =>
      Similarity.centroidScores(Tables.documents(s, dir),
        Tables.embeddings(s, dir))),
    // Dedup audit: cluster-size histogram of the q66 near-dup graph
    // (LSH candidates → exact Jaccard ≥ 0.8) plus the singleton
    // bucket — the monitoring artifact a curation run ships next to
    // its manifest. Bounded to doc_id < 1000 (the q66 oracle
    // discipline).
    "q84_dedup_audit" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 1000)
      val verified = Dedup.jaccardVerify(
          Dedup.minHashCandidates(docs), docs,
          shingleLen = Dedup.ShingleLen)
        .filter(col("jaccard") >= 0.8)
      graft.ops.Components.dedupAudit(
        docs.select("doc_id"), verified,
        srcCol = "id_a", dstCol = "id_b")
    }),
    "q69_tokenize" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val vocab = TextOps.buildVocab(docs, minCount = 5L)
      val t1 = element_at(TextOps.tokens(col("text")), 1)
      val salted = docs.withColumn("text", concat(col("text"),
        when(col("doc_id") % 3 === 0, concat(lit(" "), t1, t1))
          .otherwise(lit("")),
        when(col("doc_id") % 7 === 0, concat(lit(" "), t1, lit("9q")))
          .otherwise(lit(""))))
      TextOps.encodeGreedy(salted, vocab)
    }),
    // The full curation composite (quality filter → exact dedup →
    // stratified sample → packing) over a dup-salted corpus — one
    // declarative plan, one oracle replaying every stage.
    "q63_curation_pipeline" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select("doc_id", "lang", "text")
      val salted = d.unionByName(d.filter(col("doc_id") % 10 === 0)
        .withColumn("doc_id", col("doc_id") + 10000))
      TextOps.curateCorpus(salted, minTokens = 30L, maxStopRatio = 0.10,
        samplePerLang = 10, budget = 256L)
    }),
    // PII scrubbing over a deterministically PII-salted corpus (the
    // synthetic documents contain no natural emails, so salting in
    // the query keeps the redaction branch genuinely exercised —
    // both engines inject identical strings).
    "q62_pii_scrub" -> ((s, dir) => {
      val salted = Tables.documents(s, dir).withColumn("text",
        concat(col("text"),
          when(col("doc_id") % 7 === 0,
            concat(lit(" contact user"), col("doc_id").cast("string"),
              lit("@example.com"))).otherwise(lit("")),
          when(col("doc_id") % 5 === 0,
            concat(lit(" ref 99"), col("doc_id").cast("string"),
              lit("0042"))).otherwise(lit(""))))
      TextOps.piiScrub(salted)
    }),
    // Incremental dedup against a persisted LSH index — the
    // operational shape at 100 TB (index once, dedup each incoming
    // shard against stored bands + shingle sets; no corpus re-scan).
    // Even ids are indexed, odd ids arrive as the shard. ORACLE-GATED:
    // candidate cover is complete on this corpus (TextDedupSpec), so
    // DuckDB replays the index-canonical rule with brute-force pairs —
    // an odd doc survives iff it has no even partner at ANY id and no
    // lower odd partner at shingle-Jaccard ≥ 0.8. Bounded to
    // doc_id < 1000 (the q27/q66 discipline) for the O(N²) oracle.
    "q68_incremental_dedup" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 1000)
        .select("doc_id", "text")
      // scoped by Spark application id: stable within one process (so
      // repeated runs reuse one directory instead of leaking parquet
      // trees into tmp) yet unique across processes — a concurrent
      // bench + correctness runner must not overwrite each other's
      // index mid-read
      val idxDir = s"${sys.props("java.io.tmpdir")}/graft_q68_idx_" +
        s.sparkContext.applicationId
      Dedup.buildLshIndex(docs.filter(col("doc_id") % 2 === 0), idxDir)
      Dedup.dedupAgainstIndex(docs.filter(col("doc_id") % 2 === 1), idxDir)
    }),
    // Benchmark decontamination: per-doc fraction of distinct
    // 5-shingles found in the pooled eval-set shingle vocabulary
    // (eval = every 40th doc — the corpus's own near-dups of eval
    // docs light up alongside the eval members themselves). One
    // explode + broadcast pool probe + one map-side-combined groupBy;
    // string-equality join (no hashing) keeps it oracle-exact.
    "q67_decontaminate" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      TextOps.decontaminate(docs, docs.filter(col("doc_id") % 40 === 0),
        n = 5, threshold = 0.5)
    }),
    // Context-window chunking: fixed 64-token windows advancing by 48
    // (16-token overlap) — the sequence-prep step between curation and
    // training. Pure integer chunk arithmetic, hash-exact oracle.
    "q70_chunk_docs" -> ((s, dir) =>
      TextOps.chunkDocs(Tables.documents(s, dir),
        maxTokens = 64, stride = 48)),
    // Intra-document repetition signals (boilerplate filter): repeat
    // fractions at shingle and token granularity; the corpus carries
    // natural repeats at both levels (27 shingle-repeat docs, 497
    // token-repeat docs at sf0.01), so no salt is needed.
    "q71_repetition" -> ((s, dir) =>
      TextOps.repetitionScore(Tables.documents(s, dir))),
    // Native expression through the SQL surface: dot_product is
    // registered by plans.GraftExtensions (spark.sql.extensions).
    "q34_sql_dot_product" -> ((s, dir) => {
      Tables.embeddings(s, dir)
        .withColumn("e", expr("transform(embedding, x -> cast(x as double))"))
        .createOrReplaceTempView("embeddings_tb")
      s.sql("""
        SELECT vec_id, dot_product(e, e) AS self_dot
        FROM embeddings_tb WHERE vec_id < 100 ORDER BY vec_id""")
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_dedup_rows"        -> Oracle.dedupOrders,
    "q02_typed_projection"  -> Oracle.typedProjection,
    "q03_date_roundtrip"    -> Oracle.dateRoundtrip,
    "q04_currency_convert"  -> Oracle.currencyConvert,
    "q05_curated_table"     -> Oracle.curatedTable,
    "q06_weekly_avg_price"  -> Oracle.weeklyAvgListingPrice,
    "q07_monthly_occupancy" -> Oracle.monthlyOccupancy,
    "q08_popular_cities"    -> Oracle.weeklyPopularCities,
    "q09_top_listings"      -> Oracle.weeklyTopListings,
    "q10_bookings_per_user" -> Oracle.bookingsPerUser,
    "q11_avg_duration"      -> Oracle.monthlyAvgDuration,
    "q12_repeat_rate"       -> Oracle.monthlyRepeatRate,
    "q13_weekly_engagement" -> Oracle.weeklyEngagement,
    "q14_order_revenue"     -> Oracle.orderRevenue,
    "q15_sql_tempview"      -> Oracle.sqlTempView,
    "q16_asof_join"         -> Oracle.asofJoin,
    "q17_rollup_revenue"    -> Oracle.rollupRevenue,
    "q18_viewing_funnel"    -> Oracle.viewingFunnel,
    "q19_semi_anti"         -> Oracle.semiAnti,
    "q41_pivot_status"      -> Oracle.pivotStatus,
    "q33_embedding_dedup"   -> Oracle.embeddingDedup,
    "q34_sql_dot_product"   -> Oracle.sqlDotProduct,
    "q20_exact_dedup"       -> Oracle.exactDedupDocs,
    "q21_token_stats"       -> Oracle.tokenStats,
    "q22_quality_score"     -> Oracle.qualityScore,
    "q23_lang_stats"        -> Oracle.langStats,
    "q27_jaccard_pairs"     -> Oracle.jaccardTopPairs,
    "q37_stratified_sample" -> Oracle.stratifiedSample,
    "q39_subword_counts"    -> Oracle.subwordCounts,
    "q40_json_extract"      -> Oracle.jsonExtract,
    "q38_length_quantiles"  -> Oracle.lengthQuantiles,
    "q28_cosine_topk"       -> Oracle.cosineTopK,
    "q30_multimodal_meta"   -> Oracle.multimodalMeta,
    "q31_sessionize"        -> Oracle.sessionize,
    "q24_lang_id"           -> Oracle.langId,
    "q35_multimodal_decode" -> Oracle.multimodalDecode,
    "q42_range_join"        -> Oracle.rangeJoin,
    "q43_cube_revenue"      -> Oracle.cubeRevenue,
    "q44_scd_upsert"        -> Oracle.scdUpsert,
    "q45_topk_per_city"     -> Oracle.topkPerCity,
    "q46_running_totals"    -> Oracle.runningTotals,
    "q47_word_counts"       -> Oracle.wordCounts,
    "q49_snapshot_diff"     -> Oracle.snapshotDiff,
    "q50_hopping_window"    -> Oracle.hoppingWindow,
    "q51_set_ops"           -> Oracle.setOps,
    "q52_sql_topk"          -> Oracle.topkPerCity,
    "q53_frame_sample"      -> Oracle.frameSample,
    "q54_resize_plan"       -> Oracle.resizePlan,
    "q55_approx_quantiles"  -> Oracle.approxQuantiles,
    "q56_lsh_dedup"         -> Oracle.lshDedup,
    "q57_exact_distinct"    -> Oracle.exactDistinct,
    "q58_components"        -> Oracle.components,
    "q59_pack_sequences"    -> Oracle.packSequences,
    "q60_build_vocab"       -> Oracle.buildVocab,
    "q61_interleave"        -> Oracle.interleave,
    "q62_pii_scrub"         -> Oracle.piiScrub,
    "q63_curation_pipeline" -> Oracle.curationPipeline,
    "q64_pps_sample"        -> Oracle.ppsSample,
    "q66_cluster_dedup"     -> Oracle.clusterDedup,
    "q67_decontaminate"     -> Oracle.decontaminate,
    "q68_incremental_dedup" -> Oracle.incrementalDedup,
    "q69_tokenize"          -> Oracle.tokenize,
    "q72_bloom_dedup"       -> Oracle.bloomDedup,
    "q73_temperature_sample" -> Oracle.temperatureSample,
    "q74_tfidf_terms"       -> Oracle.tfIdfTerms,
    "q75_quantize_int8"     -> Oracle.quantizeInt8,
    "q76_lm_score"          -> Oracle.lmScore,
    "q77_source_report"     -> Oracle.sourceReport,
    "q78_dup_spans"         -> Oracle.dupSpans,
    "q96_span_scrub"        -> Oracle.spanScrub,
    "q122_sliding_scrub"    -> Oracle.slidingScrub,
    "q123_simhash_md5_dedup" -> Oracle.simHashMd5Dedup,
    "q156_bm25_negatives"   -> Oracle.bm25Negatives,
    "q157_blockhash_dedup"  -> Oracle.blockHashDedup,
    "q158_k_anonymity"      -> Oracle.kAnonymity,
    "q159_k_suppress"       -> Oracle.kSuppress,
    "q124_line_dedup"       -> Oracle.lineDedup,
    "q125_winnow_pairs"     -> Oracle.winnowPairs,
    "q126_epoch_order"      -> Oracle.epochOrder,
    "q127_importance_weights" -> Oracle.importanceWeights,
    "q128_ivf_kmeans"       -> Oracle.ivfKmeans,
    "q129_importance_resample" -> Oracle.importanceResample,
    "q130_tokenizer_report" -> Oracle.tokenizerReport,
    "q131_max_dup_spans"    -> Oracle.maxDupSpans,
    "q132_budget_select"    -> Oracle.budgetSelect,
    "q133_vocab_overlap"    -> Oracle.sourceVocabOverlap,
    "q134_pq_topk"          -> Oracle.pqTopK,
    "q135_mmr_topk"         -> Oracle.mmrTopK,
    "q136_cdc_chunks"       -> Oracle.cdcChunkAudit,
    "q137_embedding_decon"  -> Oracle.embeddingDecon,
    "q138_triplet_mine"     -> Oracle.tripletMine,
    "q139_vocab_coverage"   -> Oracle.vocabCoverageCurve,
    "q140_retrieval_eval"   -> Oracle.retrievalEval,
    "q141_dim_ablation"     -> Oracle.dimAblation,
    "q142_token_concentration" -> Oracle.tokenConcentration,
    "q143_ngram_diversity"  -> Oracle.ngramDiversity,
    "q144_curriculum_order" -> Oracle.curriculumOrder,
    "q145_centrality_dedup" -> Oracle.centralityDedup,
    "q146_entity_resolve"   -> Oracle.entityResolve,
    "q147_calibration"      -> Oracle.calibration,
    "q148_profile_table"    -> Oracle.profileTable,
    "q149_length_buckets"   -> Oracle.lengthBuckets,
    "q150_cms_hitters"      -> Oracle.cmsHitters,
    "q151_hll_distinct"     -> Oracle.hllDistinct,
    "q152_kmv_distinct"     -> Oracle.kmvDistinct,
    "q153_hist_quantiles"   -> Oracle.histQuantiles,
    "q154_doc_novelty"      -> Oracle.docNovelty,
    "q155_fingerprint_md5"  -> Oracle.fingerprintMd5,
    "q97_containment_dedup" -> Oracle.containmentDedup,
    "q98_random_project"    -> Oracle.randomProject,
    "q99_index_merge"       -> Oracle.bm25Search,
    "q102_ppl_buckets"      -> Oracle.pplBuckets,
    "q175_ppl_buckets_sketch" -> Oracle.pplBucketsSketch,
    "q103_knn_label"        -> Oracle.knnLabel,
    "q104_mixture_apply"    -> Oracle.mixtureApply,
    "q160_epoch_mixture"    -> Oracle.epochMixture,
    "q161_label_errors"     -> Oracle.labelErrors,
    "q162_cluster_stats"    -> Oracle.clusterStats,
    "q163_term_drift"       -> Oracle.termDrift,
    "q164_score_normalize"  -> Oracle.scoreNormalize,
    "q165_stratified_split" -> Oracle.stratifiedSplit,
    "q166_curation_v3"      -> Oracle.curationV3,
    "q167_embedding_audit"  -> Oracle.embeddingAudit,
    "q168_jaccard_histogram" -> Oracle.jaccardHistogram,
    "q169_coreset_select"   -> Oracle.coresetSelect,
    "q170_cohort_retention" -> Oracle.cohortRetention,
    "q171_rfm_segments"     -> Oracle.rfmSegments,
    "q172_trend_slope"      -> Oracle.trendSlope,
    "q173_basket_lift"      -> Oracle.basketLift,
    "q174_rfm_sketch"       -> Oracle.rfmSketch,
    "q105_cross_source_dups" -> Oracle.crossSourceDups,
    "q106_token_mixture"    -> Oracle.tokenMixture,
    "q107_multi_decon"      -> Oracle.multiDecon,
    "q108_normalized_dedup" -> Oracle.normalizedDedup,
    "q109_pack_materialize" -> Oracle.packMaterialize,
    "q110_hard_negatives"   -> Oracle.hardNegatives,
    "q111_embedding_drift"  -> Oracle.embeddingDrift,
    "q112_exact_jaccard_join" -> Oracle.exactJaccardJoin,
    "q113_quality_pps"      -> Oracle.qualityPps,
    "q114_dedup_lineage"    -> Oracle.dedupLineage,
    "q116_cluster_terms"    -> Oracle.clusterTerms,
    "q117_passage_search"   -> Oracle.passageSearch,
    "q118_split_leakage"    -> Oracle.splitLeakage,
    "q119_collocations"     -> Oracle.collocations,
    "q120_bpe_learn"        -> Oracle.bpeLearn,
    "q121_bpe_segment"      -> Oracle.bpeSegment,
    "q115_corpus_diff"      -> Oracle.corpusDiff,
    "q100_hash_split"       -> Oracle.hashSplit,
    "q101_leakage_split"    -> Oracle.leakageSplit,
    "q79_quality_rules"     -> Oracle.qualityRules,
    "q80_best_of_cluster"   -> Oracle.bestOfCluster,
    "q81_curation_v2"       -> Oracle.curationV2,
    "q82_hamming_ann"       -> Oracle.hammingAnn,
    "q83_centroid_outlier"  -> Oracle.centroidOutlier,
    "q84_dedup_audit"       -> Oracle.dedupAudit,
    "q85_ann_recall"        -> Oracle.annRecall,
    "q86_curation_manifest" -> Oracle.curationManifest,
    "q87_kmeans"            -> Oracle.kmeans,
    "q88_semdedup"          -> Oracle.semDedup,
    "q89_quality_classifier" -> Oracle.qualityClassifier,
    "q90_bm25_search"       -> Oracle.bm25Search,
    "q91_pca_power"         -> Oracle.pcaPower,
    "q92_balanced_sample"   -> Oracle.balancedSample,
    "q93_standardize"       -> Oracle.standardize,
    "q94_hybrid_search"     -> Oracle.hybridSearch,
    "q95_bm25_indexed"      -> Oracle.bm25Search,
    "q176_ivf_indexed"      -> Oracle.ivfKmeans,
    "q177_pq_indexed"       -> Oracle.pqTopK,
    "q178_gap_fill"         -> Oracle.gapFillLocf,
    "q179_event_transitions" -> Oracle.eventTransitions,
    "q180_fk_audit"         -> Oracle.referentialAudit,
    "q181_rolling_features" -> Oracle.trailingFeatures,
    "q182_attribution"      -> Oracle.attributionLastTouch,
    "q183_touch_pairs"      -> Oracle.attributionPairs,
    "q184_lsh_md5_topk"     -> Oracle.lshMd5TopK,
    "q185_volume_anomalies" -> Oracle.volumeAnomalies,
    "q186_funnel_paths"     -> Oracle.funnelPaths,
    "q187_scd2_history"     -> Oracle.scd2History,
    "q188_incremental_gold" -> Oracle.incrementalGold,
    "q189_roc_auc"          -> Oracle.rocAuc,
    "q190_incremental_components" -> Oracle.components,
    "q191_overlap_join"     -> Oracle.overlapJoin,
    "q192_golden_record"    -> Oracle.goldenRecord,
    "q193_type_correlation" -> Oracle.typeCorrelation,
    "q194_avg_precision"    -> Oracle.avgPrecision,
    "q195_classifier_pr"    -> Oracle.classifierPr,
    "q196_recursive_tree"   -> Oracle.recursiveTree,
    "q197_unpivot_status"   -> Oracle.unpivotStatus,
    "q198_incremental_variance" -> Oracle.incrementalVariance,
    // stored ⊕ delta ≡ one-shot at pipeline grain: the incremental
    // folds answer the FULL-HISTORY oracles verbatim
    "q199_incremental_repeat" -> Oracle.monthlyRepeatRate,
    "q200_incremental_occupancy" -> Oracle.monthlyOccupancy,
    "q201_late_repair_repeat" -> Oracle.monthlyRepeatRate,
    "q202_quarter_city_revenue" -> Oracle.quarterCityRevenue,
    "q203_dim_repair_price" -> Oracle.dimRepairPrice,
    "q204_attr_repair_cities" -> Oracle.attrRepairCities,
    // the interleaved late+attr replay converges to the SAME one-shot
    // corrected-attrs table (late rows merge, then the repair's week
    // replacement reads the full history) — one oracle, two algebras
    "q205_interleaved_repair" -> Oracle.attrRepairCities,
    "q206_rate_repair"      -> Oracle.rateRepairRevenue,
    "q208_rate_late_repair" -> Oracle.rateRepairRevenue,
    "q209_compensate_roundtrip" -> Oracle.weeklyAvgListingPrice,
    "q210_two_night_compose" -> Oracle.twoNightCities,
    "q211_rollback_compose" -> Oracle.rollbackCities,
    "q207_incremental_engagement" -> Oracle.weeklyEngagement,
    "q25_minhash_dedup"     -> Oracle.minhashDedup,
    "q70_chunk_docs"        -> Oracle.chunkDocs,
    "q71_repetition"        -> Oracle.repetition
  )

  /** The rows-only ledger (r8, verdict item 7): every query WITHOUT
    * an [[oracleSql]] entry — all xxhash64-bound (DuckDB has no
    * xxhash64) — mapped to the ORACLE-GATED twin that replays the
    * same algorithm with an md5/deterministic hash. AllQueriesSpec
    * enforces the set equality (queries \ oracleSql ≡ this keySet,
    * twins ⊆ oracleSql), and Verify dumps it next to oracle_sql.json
    * so the correctness artifact carries the pointers. */
  def rowsOnlyTwins: Map[String, String] = Map(
    // xxhash64 SimHash signatures; q123 replays the identical bit
    // votes + block index with md5-derived hashes, hash-exact
    "q26_simhash" -> "q123_simhash_md5_dedup",
    "q65_simhash_dedup" -> "q123_simhash_md5_dedup",
    // xxhash64 winnowing min-k fingerprint sketch; q155 (and the
    // full MOSS pipeline q125) replay it md5-hashed, hash-exact
    "q29_fingerprint" -> "q155_fingerprint_md5",
    // sign-LSH multi-probe ANN over SplitMix64 hyperplanes; q184
    // replays the IDENTICAL pipeline (sign buckets, lowest-margin
    // flip probes, exact rerank) with md5 planes + fixed-point probe
    // scores, oracle-gated end-to-end; the per-round Bench recall
    // line additionally gates q32's production params at 0.912
    "q32_lsh_topk" -> "q184_lsh_md5_topk"
  )
}
