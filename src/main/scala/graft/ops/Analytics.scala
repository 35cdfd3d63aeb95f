package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Product-analytics extensions over the event/order tables — the
  * classic warehouse trio the reference's presentation layer stops
  * short of: cohort retention, RFM segmentation, and per-group
  * linear trend. All three follow the engine's determinism contract
  * (exact integer/decimal sums, unique window tie-breaks, IEEE
  * divisions only at the output boundary) so they gate hash-exact
  * against the DuckDB oracle like every other operator.
  */
object Analytics {

  /** Cohort retention matrix: users are cohorted by their FIRST
    * active month; each (cohort_month, months_since) cell counts how
    * many of that cohort were active again that many months later —
    * the standard product-retention artifact (month-0 row = cohort
    * size, retention_pct = 1.0).
    *
    * Scale shape: one distinct over (user, month) — ids only, the
    * event payload never shuffles; cohorts are a user-keyed
    * min-aggregate joined back on the user id; the matrix is a tiny
    * (months × months) aggregate. User ids and timestamps must be
    * non-null (the oracle's join/order null semantics differ —
    * filter first). Output: (cohort_month, months_since, n_active,
    * cohort_size, retention_pct). */
  def cohortRetention(events: DataFrame, userCol: String = "user_id",
                      tsCol: String = "ts"): DataFrame = {
    val monthly = events.select(col(userCol).as("user"),
        date_trunc("month", col(tsCol)).cast("date").as("month"))
      .distinct()
    val cohorts = monthly.groupBy("user")
      .agg(min("month").as("cohort_month"))
    val sizes = cohorts.groupBy("cohort_month")
      .agg(count(lit(1)).as("cohort_size"))
    monthly.join(cohorts, "user")
      .withColumn("months_since",
        months_between(col("month"), col("cohort_month")).cast(LongType))
      .groupBy("cohort_month", "months_since")
      .agg(count(lit(1)).as("n_active"))
      .join(sizes, "cohort_month")
      .select(col("cohort_month"), col("months_since"), col("n_active"),
        col("cohort_size"),
        (col("n_active").cast(DoubleType) /
          col("cohort_size").cast(DoubleType)).as("retention_pct"))
      .orderBy("cohort_month", "months_since")
  }

  /** RFM segmentation: per customer, Recency (days since their last
    * order, anchored at the corpus-wide latest date so the result is
    * reproducible), Frequency (order count) and Monetary (money-
    * rounded decimal revenue sum), each cut into `n` quantile tiers
    * by ntile with the customer id as the unique tie-break — so the
    * tier boundaries replay engine-exact. Tier 1 is always BEST
    * (most recent / most frequent / highest spend), giving the
    * familiar "111 = champion" segment code.
    *
    * Scale shape: one customer-keyed aggregate; the three ntile
    * windows are global but carry (custkey, metric) only — at
    * warehouse scale swap ntile for pre-computed quantile bounds
    * from [[Sketch.histQuantiles]] if a single-pass global sort is
    * unwanted. Customer keys and dates must be non-null (Spark
    * orders NULLS FIRST, the oracle NULLS LAST — filter first).
    * Output: (custkey, r_days, n_orders, monetary, r_tier, f_tier,
    * m_tier, segment). */
  def rfm(orders: DataFrame, n: Int = 4,
          custCol: String = "o_custkey",
          dateCol: String = "o_orderdate",
          priceCol: String = "o_totalprice"): DataFrame = {
    require(n >= 2, "need at least 2 tiers")
    import org.apache.spark.sql.expressions.Window
    val rW = Window.orderBy(col("r_days"), col("custkey"))
    val fW = Window.orderBy(col("n_orders").desc, col("custkey"))
    val mW = Window.orderBy(col("monetary").desc, col("custkey"))
    rfmBase(orders, custCol, dateCol, priceCol)
      .withColumn("r_tier", ntile(n).over(rW).cast(LongType))
      .withColumn("f_tier", ntile(n).over(fW).cast(LongType))
      .withColumn("m_tier", ntile(n).over(mW).cast(LongType))
      .select(col("custkey"), col("r_days"), col("n_orders"),
        col("monetary"), col("r_tier"), col("f_tier"), col("m_tier"),
        concat(col("r_tier"), col("f_tier"), col("m_tier")).as("segment"))
      .orderBy("custkey")
  }

  /** Shared R/F/M per-customer frame: (custkey, r_days, n_orders,
    * monetary) — one customer-keyed aggregate plus the broadcast
    * one-row anchor. [[rfm]] windows it; [[rfmSketch]] buckets it. */
  private def rfmBase(orders: DataFrame, custCol: String,
                      dateCol: String, priceCol: String): DataFrame = {
    val money: Column => Column = c =>
      floor(c * lit(100.0) + lit(0.5)).cast(DoubleType) / lit(100.0)
    val per = orders.groupBy(col(custCol).as("custkey"))
      .agg(max(col(dateCol)).as("last_date"),
        count(lit(1)).as("n_orders"),
        sum(money(col(priceCol)).cast(DecimalType(18, 2)))
          .cast(DoubleType).as("monetary"))
    val anchor = orders.agg(max(col(dateCol)).as("anchor"))
    per.crossJoin(broadcast(anchor))
      .withColumn("r_days",
        datediff(col("anchor"), col("last_date")).cast(LongType))
      .select("custkey", "r_days", "n_orders", "monetary")
  }

  /** The WAREHOUSE-SCALE RFM tiering ([[rfm]]'s scaladoc names the
    * swap; r7 verdict item 4): the three global single-direction
    * ntile sorts are replaced by fixed-width-histogram quantile
    * BOUNDS ([[Sketch.histSketch]]'s discipline — a map-side-combined
    * aggregate whose exchange carries ≤ `buckets` rows regardless of
    * customer count), so at 10⁹ customers nothing is globally sorted:
    * orders are scanned ONCE into the per-customer frame (eagerly
    * materialized — custkey + three numerics, GBs at warehouse
    * scale), each metric's histogram is one tiny aggregate over it,
    * and tier assignment is a broadcast-literal projection.
    *
    * Tier semantics: tiers are VALUE-cut at the estimated quantile
    * bounds (error ≤ one bucket width by the histogram-quantile
    * argument), so they agree with [[rfm]]'s ntile tiers for every
    * customer whose metric sits ≥ one bucket width from the exact
    * boundary — RfmSketchSpec proves that on testdata. Two honest
    * differences from ntile: boundary-adjacent customers can land
    * one tier off, and TIED metric values share a tier (ntile splits
    * ties by custkey to force equal-size groups; a value-based cut
    * cannot and should not). Tier 1 is BEST on all three axes, as in
    * [[rfm]]. Output schema = [[rfm]]'s. */
  def rfmSketch(orders: DataFrame, n: Int = 4, buckets: Int = 1024,
                custCol: String = "o_custkey",
                dateCol: String = "o_orderdate",
                priceCol: String = "o_totalprice"): DataFrame = {
    require(n >= 2, "need at least 2 tiers")
    require(buckets >= n, "need at least as many buckets as tiers")
    import org.apache.spark.sql.expressions.Window
    val per = rfmBase(orders, custCol, dateCol, priceCol)
      .localCheckpoint(true)
    val metrics = Seq("r_days", "n_orders", "monetary")
    // one row: global count + per-metric lo/hi (bounded collect —
    // the k-means-centroid convention)
    val statCols = count(lit(1)).as("n_cust") +:
      metrics.flatMap(m => Seq(
        min(col(m).cast(DoubleType)).as(s"lo_$m"),
        max(col(m).cast(DoubleType)).as(s"hi_$m")))
    val statsRow = per.agg(statCols.head, statCols.tail: _*).head()
    val nCust = statsRow.getAs[Long]("n_cust")
    require(nCust > 0, "no customers")
    // estimated quantile bounds per metric: the first histogram
    // bucket whose cumulative count reaches rank ⌈i/n·N⌉, linearly
    // interpolated within the bucket (histQuantiles arithmetic). ONE
    // histogram job for all three metrics (a per-metric histSketch
    // call would pass over the customer frame three times — the
    // ProfileSketch10x overhead finding): the identical clamp
    // arithmetic, grouped by (metric, bucket)
    val loHi = metrics.map(m => m -> (statsRow.getAs[Double](s"lo_$m"),
      statsRow.getAs[Double](s"hi_$m"))).toMap
    val live = metrics.filter { m =>
      val (lo, hi) = loHi(m); hi > lo // constant metric: 1 tier
    }
    val histAll: Map[String, Seq[(Int, Long, Long)]] =
      if (live.isEmpty) Map.empty
      else {
        val bucketed = live.map { m =>
          val (lo, hi) = loHi(m)
          val w = (hi - lo) / buckets
          struct(lit(m).as("met"),
            least(greatest(floor((col(m).cast(DoubleType) - lit(lo))
              / lit(w)), lit(0)), lit(buckets - 1)).cast("int")
              .as("bucket"))
        }
        per.select(explode(array(bucketed: _*)).as("mb"))
          .groupBy(col("mb.met").as("met"), col("mb.bucket").as("bucket"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("cum", sum(col("cnt")).over(
            Window.partitionBy("met").orderBy("bucket")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("cum_prev", col("cum") - col("cnt"))
          .collect() // ≤ 3·`buckets` rows by construction
          .map(r => (r.getAs[String]("met"), (r.getAs[Int]("bucket"),
            r.getAs[Long]("cum"), r.getAs[Long]("cum_prev"))))
          .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
      }
    val bounds: Map[String, Seq[Double]] = metrics.map { m =>
      val (lo, hi) = loHi(m)
      m -> (if (hi <= lo) Seq.empty[Double]
      else {
        val w = (hi - lo) / buckets
        val hist = histAll(m)
        (1 until n).map { i =>
          val rank = math.ceil(i.toDouble / n * nCust - 1e-9).toLong
          val (b, cum, cumPrev) =
            hist.find { case (_, c, p) => c >= rank && p < rank }.get
          lo + w * (b.toDouble + (rank - cumPrev).toDouble / (cum - cumPrev))
        }
      })
    }.toMap
    def gtCount(m: String): Column = bounds(m)
      .map(b => (col(m).cast(DoubleType) > lit(b)).cast(LongType))
      .foldLeft(lit(0L).cast(LongType))(_ + _)
    // recency: smaller is better → ascending cut; frequency/monetary:
    // larger is better → tier n − (#bounds exceeded). A constant
    // metric (empty bounds) carries no signal: everyone tier 1
    def ascTier(m: String): Column =
      if (bounds(m).isEmpty) lit(1L) else lit(1L) + gtCount(m)
    def descTier(m: String): Column =
      if (bounds(m).isEmpty) lit(1L) else lit(n.toLong) - gtCount(m)
    val rTier = ascTier("r_days")
    val fTier = descTier("n_orders")
    val mTier = descTier("monetary")
    per.select(col("custkey"), col("r_days"), col("n_orders"),
        col("monetary"), rTier.as("r_tier"), fTier.as("f_tier"),
        mTier.as("m_tier"))
      .withColumn("segment",
        concat(col("r_tier"), col("f_tier"), col("m_tier")))
      .orderBy("custkey")
  }

  /** Market-basket co-occurrence with LIFT — which item pairs are
    * ordered together more often than independence predicts (the
    * classic affinity artifact behind "frequently bought together").
    * Per unordered pair (a < b): pair_orders (distinct orders
    * containing both), each item's own order count, support =
    * pair/n_orders, and lift = pair·n / (n_a·n_b) — both ratios are
    * single IEEE divisions over exact integers, and the top-N cut
    * ranks by the exact pair COUNT (ties → a, b), so the result
    * replays hash-exact.
    *
    * Scale shape: the pair generation is an order-keyed self-join of
    * the distinct (order, item) set — row volume Σ_orders C(k, 2)
    * with k = items per order — and the pair aggregate is map-side
    * combined. `maxBasket` is the skew guard (the [[Dedup.maxBucket]]
    * discipline; r7 verdict item 5): a basket with more than
    * `maxBasket` distinct items is EXCLUDED from pair generation — a
    * single pathological 10⁶-line basket would otherwise contribute
    * C(10⁶,2) ≈ 5·10¹¹ pair rows on one shuffle key. The drop is
    * deterministic (a size predicate, no sampling), only the
    * quadratic expansion is capped: item counts, n_orders, and hence
    * both ratio denominators still count every order, so a capped
    * run UNDERSTATES a mega-basket pair's support/lift and never
    * inflates anything (and a basket that size is catalog noise, not
    * co-purchase signal). The basket-size count rides the same
    * hash(ord) exchange the self-join needs — AQE reuses it, no
    * extra shuffle. Item counts and n_orders are one aggregate each,
    * broadcast back. Output: (item_a, item_b, pair_orders, orders_a,
    * orders_b, support, lift). */
  def basketLift(lineitem: DataFrame, topN: Int = 100,
                 orderCol: String = "l_orderkey",
                 itemCol: String = "l_partkey",
                 maxBasket: Int = 4096): DataFrame = {
    require(topN > 0, "topN must be positive")
    require(maxBasket >= 2, "maxBasket must be at least 2")
    import org.apache.spark.sql.expressions.Window
    // materialized once: n_orders, item counts and both self-join
    // sides all consume the distinct (order, item) set —
    // un-checkpointed, the lineitem scan + distinct runs four times
    // (guide §2.4). Two-long rows; order lines never re-read.
    val items = lineitem.select(col(orderCol).as("ord"),
      col(itemCol).as("item")).distinct()
      .localCheckpoint(true)
    val nOrders = items.select(col("ord")).distinct()
      .agg(count(lit(1)).as("n_orders"))
    val itemCounts = items.groupBy("item")
      .agg(count(lit(1)).as("item_orders"))
    val capped = items.withColumn("__bn",
        count(lit(1)).over(Window.partitionBy("ord")))
      .filter(col("__bn") <= maxBasket).drop("__bn")
    val pairs = capped.select(col("ord"), col("item").as("item_a"))
      .join(capped.select(col("ord"), col("item").as("item_b")), "ord")
      .filter(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("pair_orders"))
    // cut FIRST: the top-N rank depends only on the exact pair count
    // (total tie order), so the item-count and total joins touch
    // topN rows, never the full pair set
    pairs
      .orderBy(col("pair_orders").desc, col("item_a"), col("item_b"))
      .limit(topN)
      .join(itemCounts.select(col("item").as("item_a"),
        col("item_orders").as("orders_a")), "item_a")
      .join(itemCounts.select(col("item").as("item_b"),
        col("item_orders").as("orders_b")), "item_b")
      .crossJoin(broadcast(nOrders))
      .select(col("item_a"), col("item_b"), col("pair_orders"),
        col("orders_a"), col("orders_b"),
        (col("pair_orders").cast(DoubleType) /
          col("n_orders").cast(DoubleType)).as("support"),
        ((col("pair_orders") * col("n_orders")).cast(DoubleType) /
          (col("orders_a") * col("orders_b")).cast(DoubleType))
          .as("lift"))
      .orderBy(col("pair_orders").desc, col("item_a"), col("item_b"))
  }

  /** Per-group linear TREND over a weekly series — closed-form least
    * squares on (week index, revenue in integer CENTS): slope =
    * [(n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)] / 100. Every sum is exact —
    * x is a week rank and y an INTEGER cent total, and BOTH sides
    * accumulate in decimal(38,0) in Spark ≡ HUGEINT in DuckDB (a
    * long Σx², or the sx·sx product below, would silently wrap at
    * ~7.8e4 weeks per group; a decimal-with-scale product would
    * overflow DuckDB's 38-digit multiply into DOUBLE at warehouse
    * magnitudes and break the exactness claim) — so the
    * two IEEE operations at the output boundary (one division, one
    * /100 rescale, identical order in both engines) are all a
    * regression needs to replay hash-exact, unlike a
    * float-accumulated `regr_slope`. The week index is the per-group
    * rank of the week (1..n, gaps collapsed), making slopes
    * comparable across groups with different calendars. Dates and
    * group keys must be non-null (a NULL week would rank NULLS FIRST
    * in Spark but NULLS LAST in the oracle — filter first).
    *
    * Scale shape: one (group, week) aggregate, one per-group rank
    * window over week rows (tiny), one group aggregate of the sums.
    * Output: (group, n_weeks, slope) — slope in money units per
    * week. */
  def trendSlope(df: DataFrame, groupCol: String, dateCol: String,
                 valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents =
      floor(col(valueCol) * lit(100.0) + lit(0.5)).cast(DecimalType(38, 0))
    val weekly = df.select(col(groupCol).as("grp"),
        date_trunc("week", col(dateCol)).cast("date").as("week"),
        cents.as("y0"))
      .groupBy("grp", "week").agg(sum("y0").as("y"))
      .withColumn("x", row_number().over(
        Window.partitionBy("grp").orderBy("week")).cast(LongType))
    // x-side terms go through decimal(38,0) BEFORE any multiply —
    // sum(BIGINT) promotes to HUGEINT in the DuckDB oracle, and a
    // long x*x (or the later sx*sx) would silently wrap in Spark at
    // ~7.8e4 weeks per group while the oracle keeps 128-bit exactness
    // (r7 ADVICE); the y side is already decimal
    val xd = col("x").cast(DecimalType(38, 0))
    weekly.groupBy(col("grp").as(groupCol))
      .agg(count(lit(1)).as("n_weeks"),
        sum(xd).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("y") * col("x")).as("sxy"),
        sum(xd * xd).as("sxx"))
      .select(col(groupCol), col("n_weeks"),
        // a single-week series has no slope: NULL, not a 0/0 NaN
        // whose rendering the two engines need not share
        when(col("n_weeks") * col("sxx") - col("sx") * col("sx") =!= 0,
          (col("n_weeks") * col("sxy") - col("sx") * col("sy"))
              .cast(DoubleType) /
            (col("n_weeks") * col("sxx") - col("sx") * col("sx"))
              .cast(DoubleType) / lit(100.0)).as("slope"))
      .orderBy(groupCol)
  }

  /** First-order event transition matrix: for each user's
    * (ts, id)-ordered event sequence, count prev→next type pairs and
    * normalize per source type — the Markov-chain view of user flows
    * that funnels (q18) fix to one hypothesized path. Used both for
    * product flow analysis and for QA-ing synthetic event streams
    * (a generator whose transition matrix drifts from production's
    * is caught here before training).
    *
    * Scale shape: the LAG window shuffles (user, ts, type, id) rows
    * keyed by user — per-partition volume is each user's own event
    * count; the pair aggregate map-side combines to ≤|types|² rows,
    * and the row-normalizing window runs over that tiny frame.
    * Counts are exact longs; the probability is one IEEE division at
    * the output boundary. Output: (from_type, to_type, n, p). */
  def eventTransitions(events: DataFrame, userCol: String = "user_id",
                       tsCol: String = "ts", typeCol: String = "event_type",
                       idCol: String = "event_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val pairs = events
      .select(col(userCol), col(tsCol), col(idCol),
        col(typeCol).as("to_type"),
        lag(col(typeCol), 1).over(w).as("from_type"))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val byFrom = org.apache.spark.sql.expressions.Window
      .partitionBy(col("from_type"))
    pairs.select(col("from_type"), col("to_type"), col("n"),
        (col("n").cast(DoubleType) /
          sum(col("n")).over(byFrom).cast(DoubleType)).as("p"))
      .orderBy("from_type", "to_type")
  }

  /** Ordered funnel paths with per-stage time caps — the sequential
    * complement of [[eventTransitions]] (adjacent pairs) and q18's
    * fixed weekly funnel: for every stage-0 event, the FIRST stage-1
    * event strictly after it within `maxGap`, then the first stage-2
    * event after THAT, and so on — the classic "view → click →
    * purchase within N days, per user" product question, one row per
    * stage-0 event with however far the user got
    * (`completed_stages`).
    *
    * Each hop is one [[AsOfJoin.asofForward]] pass — the union+window
    * formulation, O(shuffle(|stage events|)) per hop with NO join
    * operator and no O(matches) blow-up on dense histories (the same
    * argument as Attribution.lastTouch). "First within the cap" ≡
    * "first overall, nulled when beyond the cap": if the earliest
    * next event is already too late, no qualifying one exists.
    * Determinism: next = smallest (ts, id) strictly after the anchor
    * (equal timestamps are NOT after — microsecond data makes the
    * strictness observable only under crafted ties, which the spec
    * pins). A dead stage nulls every later stage by construction. */
  def funnelPaths(events: DataFrame, stages: Seq[String],
                  maxGap: String, keyCol: String = "user_id",
                  tsCol: String = "ts", typeCol: String = "event_type",
                  idCol: String = "event_id"): DataFrame = {
    require(stages.size >= 2, "a funnel needs at least two stages")
    val iv = expr(s"INTERVAL $maxGap")
    def stageEvents(st: String, i: Int): DataFrame =
      events.filter(col(typeCol) === st)
        .select(col(keyCol), col(tsCol).as(s"s${i}_ts"),
          col(idCol).as(s"s${i}_id"))
    val s0 = events.filter(col(typeCol) === stages.head)
      .select(col(keyCol), col(idCol).as("s0_id"), col(tsCol).as("s0_ts"))
    val walked = stages.zipWithIndex.tail.foldLeft(s0) {
      case (acc, (st, i)) =>
        val hopped = AsOfJoin.asofForward(acc, stageEvents(st, i),
          Seq(keyCol), leftTime = s"s${i - 1}_ts",
          rightTime = s"s${i}_ts", rightCols = Seq(s"s${i}_id"))
        // the cap, and the dead-anchor propagation: a null previous
        // stage nulls this one regardless of what the scan carried
        val ok = col(s"s${i - 1}_ts").isNotNull &&
          col(s"s${i}_ts") <= col(s"s${i - 1}_ts") + iv
        hopped
          .withColumn(s"s${i}_id", when(ok, col(s"s${i}_id")))
          .withColumn(s"s${i}_ts", when(ok, col(s"s${i}_ts")))
    }
    val completed = stages.indices
      .map(i => when(col(s"s${i}_id").isNotNull, 1L).otherwise(0L))
      .reduce(_ + _)
    walked.select(col(keyCol) +:
        stages.indices.flatMap(i =>
          Seq(col(s"s${i}_id"), col(s"s${i}_ts"))) :+
        completed.as("completed_stages"): _*)
      .orderBy("s0_id")
  }

  /** Exact Pearson correlation matrix between event-type DAILY count
    * series (r8-cont) — "do purchases move with views, do errors
    * anti-correlate with everything": the co-movement diagnostic
    * next to [[trendSlope]]'s per-series direction. NOT Spark's
    * `corr` (a double accumulator whose result depends on partition
    * order): counts are integers, every sum (Σx, Σy, Σxy, Σx², Σy²)
    * accumulates in decimal(38,0) ≡ HUGEINT, and the closed form
    *   r = (nΣxy − ΣxΣy) / (√(nΣx² − (Σx)²) · √(nΣy² − (Σy)²))
    * touches IEEE only at the boundary — casts of exact integers,
    * two correctly-rounded sqrts, one multiply, one divide, all
    * bit-identical across engines. Zero-variance series → NULL.
    *
    * Missing (day, type) cells count as ZERO, not absent: the day
    * grid is distinct-days × distinct-types, so a type that goes
    * quiet pulls its correlations down instead of silently shrinking
    * its observation set. Scale shape: the only corpus-sized pass is
    * the (day, type) count aggregate (map-side combined); the grid,
    * self-join and pair rollup are calendar × type-arity sized —
    * thousands of rows at any corpus size. */
  def typeCorrelationMatrix(events: DataFrame,
                            typeCol: String = "event_type",
                            tsCol: String = "ts"): DataFrame = {
    val day = to_date(date_trunc("day", col(tsCol)))
    val days = events.select(day.as("day")).distinct()
    val types = events.select(col(typeCol).as("event_type")).distinct()
    val counts = events
      .groupBy(day.as("day"), col(typeCol).as("event_type"))
      .agg(count(lit(1)).as("n"))
    val grid = days.crossJoin(broadcast(types))
      .join(counts, Seq("day", "event_type"), "left")
      .na.fill(0L, Seq("n"))
    val a = grid.select(col("day"), col("event_type").as("type_a"),
      col("n").as("na"))
    val b = grid.select(col("day").as("day_b"),
      col("event_type").as("type_b"), col("n").as("nb"))
    val dec = (c: Column) => c.cast(DecimalType(38, 0))
    val p = a.join(b, col("day") === col("day_b") &&
        col("type_a") < col("type_b"))
      .groupBy("type_a", "type_b")
      .agg(count(lit(1)).as("n_days"),
        sum(dec(col("na"))).as("sx"), sum(dec(col("nb"))).as("sy"),
        sum(dec(col("na")) * dec(col("nb"))).as("sxy"),
        sum(dec(col("na")) * dec(col("na"))).as("sxx"),
        sum(dec(col("nb")) * dec(col("nb"))).as("syy"))
    val n = dec(col("n_days"))
    val dx = n * col("sxx") - col("sx") * col("sx")
    val dy = n * col("syy") - col("sy") * col("sy")
    p.withColumn("r",
        when(dx > 0 && dy > 0,
          (n * col("sxy") - col("sx") * col("sy")).cast(DoubleType) /
            (sqrt(dx.cast(DoubleType)) * sqrt(dy.cast(DoubleType)))))
      .select("type_a", "type_b", "n_days", "r")
      .orderBy("type_a", "type_b")
  }
}
