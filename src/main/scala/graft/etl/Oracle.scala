package graft.etl

/** DuckDB oracle SQL for every parity query (driver contract — see
  * `SparkEntry.oracleSql`). Each statement reproduces the analog
  * mapping (graft.etl.Analog) + pipeline semantics in ANSI-ish SQL
  * runnable by DuckDB 1.x over the same parquet tables.
  *
  * Engine-portability rules (SURVEY §7.4):
  *  - `money(x)` = floor(x*100+0.5)/100 — bit-exact on both engines
  *    (never `round()` on doubles);
  *  - double sums go through DECIMAL(18,2) (exact, order-independent);
  *  - DuckDB `datediff('day', start, end)` ≡ Spark
  *    `datediff(end, start)`;
  *  - `date_trunc` is cast to DATE on both sides;
  *  - every `sum` over an integer column is wrapped
  *    `CAST(sum(..) AS BIGINT)` — DuckDB's sum(BIGINT) returns
  *    HUGEINT, which fails the driver's type-sensitive value hash
  *    against Spark's BIGINT;
  *  - every query ends in a total ORDER BY over a unique key.
  */
object Oracle {

  /** floor(x*100+0.5)/100 rendered in SQL. */
  def money(e: String): String = s"(floor(($e) * 100.0 + 0.5) / 100.0)"

  /** Exact order-independent sum of a 2-decimal double. */
  def decSum(e: String): String =
    s"CAST(sum(CAST(($e) AS DECIMAL(18,2))) AS DOUBLE)"

  /** Shared CTE prefix: rates dim + raw analogs + curated wide table —
    * mirrors Analog.bookingsRaw/apartmentsRaw/attributesRaw and
    * Curate.curate step for step. */
  val curatedCte: String = s"""
WITH rates(currency, usd_rate) AS (
  VALUES ('USD', 1.0), ('EUR', 1.1), ('INR', 0.012)),
bk AS (
  SELECT DISTINCT
    o_orderkey AS booking_id,
    o_custkey AS user_id,
    o_orderkey % 2100 AS apartment_id,
    CAST(o_orderdate AS DATE) AS booking_date,
    CAST(o_orderdate AS DATE) + CAST(o_orderkey % 3 AS INT) AS checkin_date,
    CAST(o_orderdate AS DATE)
      + CAST(o_orderkey % 3 + o_orderkey % 7 + 1 AS INT) AS checkout_date,
    o_totalprice AS total_price,
    CASE WHEN o_custkey % 97 = 0 THEN 'GBP'
         WHEN o_custkey % 3 = 0 THEN 'USD'
         WHEN o_custkey % 3 = 1 THEN 'EUR'
         ELSE 'INR' END AS currency,
    CASE WHEN o_orderstatus = 'F' THEN 'confirmed'
         WHEN o_orderstatus = 'O' THEN 'pending'
         ELSE 'canceled' END AS booking_status
  FROM orders),
apt AS (
  SELECT DISTINCT
    p_partkey AS id,
    p_name AS title,
    p_brand AS source,
    p_retailprice AS price,
    CASE WHEN p_partkey % 3 = 0 THEN 'USD'
         WHEN p_partkey % 3 = 1 THEN 'EUR'
         ELSE 'INR' END AS apt_currency,
    DATE '1995-01-01' + CAST(p_partkey % 1000 AS INT) AS listing_created_on,
    p_size % 2 = 0 AS is_active
  FROM part),
attr AS (
  SELECT DISTINCT
    p_partkey AS id,
    p_type AS category,
    p_size % 4 AS bathrooms,
    p_size % 5 AS bedrooms,
    p_size * 100 AS square_feet,
    n_name AS cityname
  FROM part JOIN nation ON p_partkey % 25 = n_nationkey
  WHERE p_partkey % 10 <> 0),
aptc AS (
  SELECT a.*, ${money("a.price * r.usd_rate")} AS price_usd
  FROM apt a LEFT JOIN rates r ON a.apt_currency = r.currency),
curated AS (
  SELECT
    b.booking_id, b.user_id, b.apartment_id, b.booking_date,
    b.checkin_date, b.checkout_date, b.booking_status, b.total_price,
    ${money("b.total_price * r.usd_rate")} AS total_price_usd,
    b.currency,
    a.price, a.price_usd, a.title, a.source, a.is_active,
    a.listing_created_on,
    t.category, t.bedrooms, t.bathrooms, t.square_feet, t.cityname
  FROM bk b
  LEFT JOIN aptc a ON b.apartment_id = a.id
  LEFT JOIN attr t ON a.id = t.id
  LEFT JOIN rates r ON b.currency = r.currency)
"""

  val dedupOrders: String = """
SELECT DISTINCT * FROM orders ORDER BY o_orderkey"""

  val typedProjection: String = """
SELECT CAST(p_partkey AS BIGINT) AS part_id,
       CAST(p_name AS VARCHAR) AS title,
       CAST(p_size AS INT) AS size,
       CAST(p_retailprice AS DOUBLE) AS price
FROM part ORDER BY part_id"""

  val dateRoundtrip: String = """
SELECT o_orderkey AS booking_id,
       CAST(strptime(strftime(o_orderdate, '%d/%m/%Y'), '%d/%m/%Y') AS DATE)
         AS booking_date
FROM orders ORDER BY booking_id"""

  val currencyConvert: String = s"""$curatedCte
SELECT id, title, apt_currency AS currency, price, price_usd
FROM aptc ORDER BY id"""

  val curatedTable: String = s"""$curatedCte
SELECT * FROM curated ORDER BY booking_id"""

  val weeklyAvgListingPrice: String = s"""$curatedCte
SELECT CAST(date_trunc('week', listing_created_on) AS DATE) AS week_start,
       ${money(s"${decSum("price_usd")} / count(price_usd)")} AS avg_price_usd
FROM aptc GROUP BY 1 ORDER BY week_start"""

  val monthlyOccupancy: String = s"""$curatedCte
SELECT CAST(date_trunc('month', checkin_date) AS DATE) AS month_start,
       count(*) AS total_bookings,
       CAST(sum(CAST(datediff('day', checkin_date, checkout_date) AS BIGINT))
         AS BIGINT) AS booked_nights,
       ${money("""sum(CAST(datediff('day', checkin_date, checkout_date) AS BIGINT)) * 100.0
         / (count(DISTINCT apartment_id)
            * day(last_day(CAST(date_trunc('month', checkin_date) AS DATE))))""")}
         AS occupancy_rate
FROM curated WHERE booking_status = 'confirmed'
GROUP BY 1 ORDER BY month_start"""

  val weeklyPopularCities: String = s"""$curatedCte
SELECT CAST(date_trunc('week', booking_date) AS DATE) AS week_start,
       cityname,
       count(*) AS total_bookings
FROM curated
WHERE booking_status = 'confirmed'
GROUP BY 1, 2
ORDER BY week_start, total_bookings DESC, cityname ASC NULLS FIRST"""

  val weeklyTopListings: String = s"""$curatedCte
SELECT CAST(date_trunc('week', booking_date) AS DATE) AS week_start,
       apartment_id,
       ${decSum("total_price_usd")} AS weekly_revenue
FROM curated
WHERE booking_status = 'confirmed'
GROUP BY 1, 2
ORDER BY week_start, weekly_revenue DESC NULLS LAST, apartment_id"""

  val bookingsPerUser: String = s"""$curatedCte
SELECT user_id, count(*) AS total_bookings
FROM curated WHERE booking_status = 'confirmed'
GROUP BY 1 ORDER BY user_id"""

  /** DuckDB twin of `Pipeline.quarterCityRevenue` (q202): the
    * engine's quarter predicate arrives via a month-dim join pruned
    * at runtime (DPP); semantically it is this plain quarter filter. */
  val quarterCityRevenue: String = s"""$curatedCte
SELECT cityname, ${decSum("total_price_usd")} AS revenue
FROM curated
WHERE booking_status = 'confirmed'
  AND year(booking_date) = 1995 AND quarter(booking_date) = 2
GROUP BY cityname
ORDER BY cityname ASC NULLS FIRST"""

  /** One-shot weekly listing-price average over the CORRECTED dim
    * (id % 7 = 3 → price × 1.1) — q203's engine side computes the
    * same table via the dim-repair algebra (stale state from the
    * original dim, touched weeks replaced); hash equality proves
    * repair ≡ one-shot. */
  val dimRepairPrice: String = s"""
WITH rates(currency, usd_rate) AS (
  VALUES ('USD', 1.0), ('EUR', 1.1), ('INR', 0.012)),
apt AS (
  SELECT DISTINCT
    p_partkey AS id,
    CASE WHEN p_partkey % 7 = 3 THEN p_retailprice * 1.1
         ELSE p_retailprice END AS price,
    CASE WHEN p_partkey % 3 = 0 THEN 'USD'
         WHEN p_partkey % 3 = 1 THEN 'EUR'
         ELSE 'INR' END AS apt_currency,
    DATE '1995-01-01' + CAST(p_partkey % 1000 AS INT) AS listing_created_on
  FROM part),
aptc AS (
  SELECT a.*, ${money("a.price * r.usd_rate")} AS price_usd
  FROM apt a LEFT JOIN rates r ON a.apt_currency = r.currency)
SELECT CAST(date_trunc('week', listing_created_on) AS DATE) AS week_start,
       ${money(s"${decSum("price_usd")} / count(price_usd)")} AS avg_price_usd
FROM aptc GROUP BY 1 ORDER BY week_start"""

  /** One-shot weekly city counts over the CORRECTED attributes
    * (id % 13 = 5 → cityname 'ATLANTIS') — q204's engine side
    * computes the same table via the attributes-repair algebra
    * (stale weekly state, touched weeks replaced wholesale). Built
    * by rewriting [[curatedCte]]'s attr projection, so the two can
    * never drift. */
  val attrRepairCities: String = {
    val corrected = curatedCte.replace("n_name AS cityname",
      "CASE WHEN p_partkey % 13 = 5 THEN 'ATLANTIS' " +
        "ELSE n_name END AS cityname")
    assert(corrected.contains("ATLANTIS"),
      "curatedCte attr projection changed — update attrRepairCities")
    s"""$corrected
SELECT CAST(date_trunc('week', booking_date) AS DATE) AS week_start,
       cityname,
       count(*) AS total_bookings
FROM curated
WHERE booking_status = 'confirmed'
GROUP BY 1, 2
ORDER BY week_start, total_bookings DESC, cityname ASC NULLS FIRST"""
  }

  /** One-shot weekly city counts over TWO cumulative attr
    * corrections (night 1: %13==5 → ATLANTIS; night 2: %11==7 →
    * NEOPOLIS, winning where both apply) — q210's engine side reaches
    * the same table by running the repair algebra twice in sequence
    * over the intermediate (night-1) state. Built by rewriting
    * [[curatedCte]]'s attr projection, so the two can never drift. */
  val twoNightCities: String = {
    val corrected = curatedCte.replace("n_name AS cityname",
      "CASE WHEN p_partkey % 11 = 7 THEN 'NEOPOLIS' " +
        "WHEN p_partkey % 13 = 5 THEN 'ATLANTIS' " +
        "ELSE n_name END AS cityname")
    assert(corrected.contains("NEOPOLIS"),
      "curatedCte attr projection changed — update twoNightCities")
    s"""$corrected
SELECT CAST(date_trunc('week', booking_date) AS DATE) AS week_start,
       cityname,
       count(*) AS total_bookings
FROM curated
WHERE booking_status = 'confirmed'
GROUP BY 1, 2
ORDER BY week_start, total_bookings DESC, cityname ASC NULLS FIRST"""
  }

  /** One-shot weekly city counts over corrections #1 and #3 ONLY
    * (%7==2 → ELDORADO winning over %13==5 → ATLANTIS where both
    * apply; the rolled-back #2 ABSENT) — q211's engine side reaches
    * this table by applying #1, applying #2, restoring #2's touched
    * weeks from their pre-fold undo snapshot, and then applying #3
    * over the restored state. Any residue of #2 (a NEOPOLIS row, a
    * week restored from post-#2 content) breaks the hash. Built by
    * rewriting [[curatedCte]]'s attr projection, so the two can never
    * drift. */
  val rollbackCities: String = {
    val corrected = curatedCte.replace("n_name AS cityname",
      "CASE WHEN p_partkey % 7 = 2 THEN 'ELDORADO' " +
        "WHEN p_partkey % 13 = 5 THEN 'ATLANTIS' " +
        "ELSE n_name END AS cityname")
    assert(corrected.contains("ELDORADO"),
      "curatedCte attr projection changed — update rollbackCities")
    s"""$corrected
SELECT CAST(date_trunc('week', booking_date) AS DATE) AS week_start,
       cityname,
       count(*) AS total_bookings
FROM curated
WHERE booking_status = 'confirmed'
GROUP BY 1, 2
ORDER BY week_start, total_bookings DESC, cityname ASC NULLS FIRST"""
  }

  /** One-shot weekly top-listing revenue over the CORRECTED rates
    * (EUR 1.1 → 1.2) — q206's engine side computes the same table via
    * the rate-repair algebra (stale state from the original rates,
    * the affected bookings' weeks replaced wholesale from the
    * re-derived rows). Built by rewriting [[curatedCte]]'s rates
    * VALUES, so the two can never drift. */
  val rateRepairRevenue: String = {
    val corrected = curatedCte.replace("('EUR', 1.1)", "('EUR', 1.2)")
    assert(corrected.contains("('EUR', 1.2)"),
      "curatedCte rates VALUES changed — update rateRepairRevenue")
    s"""$corrected
SELECT CAST(date_trunc('week', booking_date) AS DATE) AS week_start,
       apartment_id,
       ${decSum("total_price_usd")} AS weekly_revenue
FROM curated
WHERE booking_status = 'confirmed'
GROUP BY 1, 2
ORDER BY week_start, weekly_revenue DESC NULLS LAST, apartment_id"""
  }

  val monthlyAvgDuration: String = s"""$curatedCte
SELECT CAST(date_trunc('month', checkin_date) AS DATE) AS month_start,
       ${money("""CAST(sum(CAST(datediff('day', checkin_date, checkout_date) AS BIGINT)) AS DOUBLE)
         / count(*)""")} AS avg_duration_days
FROM curated WHERE booking_status = 'confirmed'
GROUP BY 1 ORDER BY month_start"""

  val monthlyRepeatRate: String = s"""$curatedCte,
ub AS (
  SELECT user_id, booking_id, booking_date FROM curated
  WHERE booking_status = 'confirmed'),
lagged AS (
  SELECT user_id, booking_date,
         lag(booking_date) OVER (
           PARTITION BY user_id ORDER BY booking_date, booking_id)
           AS prev_date
  FROM ub),
flags AS (
  SELECT user_id,
         CAST(date_trunc('month', booking_date) AS DATE) AS month_start,
         CASE WHEN prev_date IS NOT NULL
                   AND datediff('day', prev_date, booking_date) <= 30
              THEN 1 ELSE 0 END AS is_repeat
  FROM lagged)
SELECT month_start,
       count(DISTINCT CASE WHEN is_repeat = 1 THEN user_id END)
         AS repeat_customers,
       count(DISTINCT user_id) AS total_customers,
       ${money("""count(DISTINCT CASE WHEN is_repeat = 1 THEN user_id END) * 100.0
         / count(DISTINCT user_id)""")} AS repeat_rate_pct
FROM flags GROUP BY 1 ORDER BY month_start"""

  val weeklyEngagement: String = """
SELECT CAST(date_trunc('week', ts) AS DATE) AS week_start,
       event_type,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       max(value) AS max_value
FROM events GROUP BY 1, 2 ORDER BY week_start, event_type"""

  val orderRevenue: String = s"""
SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start,
       o_orderstatus,
       count(*) AS n_items,
       ${decSum(money("l_extendedprice * (1.0 - l_discount)"))} AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= DATE '1996-01-01'
GROUP BY 1, 2 ORDER BY week_start, o_orderstatus"""

  val sqlTempView: String = s"""$curatedCte
SELECT CAST(date_trunc('month', booking_date) AS DATE) AS month_start,
       CASE WHEN total_price_usd IS NULL THEN 'unpriced'
            ELSE 'priced' END AS price_class,
       count(*) AS n_bookings
FROM curated
WHERE booking_status = 'confirmed'
GROUP BY 1, 2
ORDER BY month_start, price_class"""

  val embeddingDedup: String = """
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
  WHERE vec_id < 2000),
dup AS (
  SELECT DISTINCT b.vec_id
  FROM v a, v b
  WHERE a.vec_id < b.vec_id
    AND list_dot_product(a.e, b.e)
        / (sqrt(list_dot_product(a.e, a.e))
           * sqrt(list_dot_product(b.e, b.e))) >= 0.9)
SELECT vec_id FROM v
WHERE vec_id NOT IN (SELECT vec_id FROM dup)
ORDER BY vec_id"""

  /** q56 oracle: exact all-pairs dedup over the SAME near-dup-injected
    * corpus the Spark side feeds through the LSH-bucketed path — a
    * hash match proves LSH-fed ≡ exact end-to-end. The ×1.25 scaled
    * copies round identically in both engines (IEEE double). */
  val lshDedup: String = """
WITH b AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
  WHERE vec_id < 2000),
v AS (
  SELECT * FROM b
  UNION ALL
  SELECT vec_id + 100000, list_transform(e, x -> x * 1.25) FROM b
  WHERE vec_id % 5 = 0),
dup AS (
  SELECT DISTINCT y.vec_id
  FROM v x, v y
  WHERE x.vec_id < y.vec_id
    AND list_dot_product(x.e, y.e)
        / (sqrt(list_dot_product(x.e, x.e))
           * sqrt(list_dot_product(y.e, y.e))) >= 0.9)
SELECT vec_id FROM v
WHERE vec_id NOT IN (SELECT vec_id FROM dup)
ORDER BY vec_id"""

  /** q55 oracle. approx_val replicates percentile_approx's
    * full-retention GK rule — the element at ascending rank ceil(q·n)
    * (verified empirically across group sizes and partitionings; holds
    * while n/group < accuracy/2 so the summary never compresses).
    * exact_val replicates Spark's `percentile` interpolation at
    * position q·(n−1) — the two-sided weighted form
    * (hi−pos)·v_lo + (pos−lo)·v_hi, evaluated on identical doubles in
    * the same order, so the match is bit-exact (the algebraically
    * equal v_lo + frac·(v_hi−v_lo) differs in the last ulp). */
  val approxQuantiles: String = """
WITH v AS (
  SELECT lang, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
         count(*) OVER (PARTITION BY lang) AS cnt
  FROM documents),
q AS (SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE)]) AS quantile),
g AS (
  SELECT lang, quantile, cnt,
         CAST(ceil(quantile * cnt) AS BIGINT) AS arn,
         quantile * (cnt - 1) AS pos,
         floor(quantile * (cnt - 1)) AS lo,
         ceil(quantile * (cnt - 1)) AS hi
  FROM (SELECT DISTINCT lang, cnt FROM v) CROSS JOIN q)
SELECT g.lang, g.quantile,
       CAST(av.n_chars AS BIGINT) AS approx_val,
       CASE WHEN g.hi = g.lo THEN CAST(lv.n_chars AS DOUBLE)
            ELSE (g.hi - g.pos) * CAST(lv.n_chars AS DOUBLE)
                 + (g.pos - g.lo) * CAST(hv.n_chars AS DOUBLE) END
         AS exact_val
FROM g
JOIN v av ON av.lang = g.lang AND av.rn = GREATEST(g.arn, 1)
JOIN v lv ON lv.lang = g.lang AND lv.rn = CAST(g.lo AS BIGINT) + 1
JOIN v hv ON hv.lang = g.lang AND hv.rn = CAST(g.hi AS BIGINT) + 1
ORDER BY g.lang, g.quantile"""

  /** q57 oracle: exact distinct-user counts (q48's oracle-gatable
    * half). */
  val exactDistinct: String = """
SELECT event_type,
       count(DISTINCT user_id) AS exact_users,
       count(*) AS n_events
FROM events GROUP BY event_type ORDER BY event_type"""

  /** q58 oracle: connected components by recursive transitive closure
    * over the same deterministic edge set — component = min reachable
    * id. Components are bounded (8-blocks + sparse links), so the
    * closure stays linear in nodes. */
  val components: String = """
WITH RECURSIVE e0 AS (
  SELECT o_orderkey AS src,
         o_orderkey - o_orderkey % 8 + (o_orderkey * 5 + 3) % 8 AS dst
  FROM orders
  UNION ALL
  SELECT o_orderkey, o_orderkey + 8 FROM orders WHERE o_orderkey % 100 = 0),
e AS (SELECT src, dst FROM e0 WHERE src <> dst),
sym AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
nodes AS (SELECT DISTINCT src AS id FROM sym),
reach(id, r) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT reach.id, sym.dst FROM reach JOIN sym ON sym.src = reach.r)
SELECT id, min(r) AS component FROM reach GROUP BY id ORDER BY id"""

  /** q59 oracle: identical sharded streaming-fill packing — exclusive
    * running token total, floor-divided by the budget (floor(), not
    * CAST: DuckDB's double→int cast rounds while Spark's truncates). */
  val packSequences: String = """
WITH t AS (
  SELECT lang, doc_id, doc_id % 4 AS shard,
         CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS n_tok
  FROM documents),
b AS (
  SELECT lang, doc_id, shard, n_tok,
         CAST(floor((sum(n_tok) OVER (PARTITION BY lang, shard
             ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tok)
           / 256) AS BIGINT) AS bin
  FROM t)
SELECT lang, shard, bin,
       count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM b GROUP BY lang, shard, bin ORDER BY lang, shard, bin"""

  /** q109 oracle: materialized packing replayed — the q59 assignment
    * CTEs plus an id-ordered string_agg per bin with the same
    * separator. */
  val packMaterialize: String = """
WITH t AS (
  SELECT lang, doc_id, text, doc_id % 4 AS shard,
         CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS n_tok
  FROM documents),
b AS (
  SELECT lang, doc_id, text, shard, n_tok,
         CAST(floor((sum(n_tok) OVER (PARTITION BY lang, shard
             ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tok)
           / 256) AS BIGINT) AS bin
  FROM t)
SELECT lang, shard, bin,
       count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       string_agg(text, ' <eot> ' ORDER BY doc_id) AS packed_text
FROM b GROUP BY lang, shard, bin ORDER BY lang, shard, bin"""

  /** q60 oracle: vocabulary ranking (count desc, token asc). */
  val buildVocab: String = """
WITH c AS (
  SELECT unnest(string_split_regex(trim(text), ' +')) AS token
  FROM documents),
n AS (SELECT token, count(*) AS n FROM c GROUP BY token HAVING count(*) >= 5)
SELECT CAST(row_number() OVER (ORDER BY n DESC, token) AS INTEGER) AS vocab_id,
       token, n
FROM n ORDER BY vocab_id"""

  /** q69 oracle: greedy longest-match encode replayed. The vocab is
    * the q60 rebuild (count desc, token asc ranking, minCount 5); the
    * greedy walk is a recursive CTE — each step consumes the LONGEST
    * vocab entry prefixing the remainder (len DESC LIMIT 1 is total:
    * two same-length prefixes of one position would be equal
    * strings), and a remainder with no prefix match emits one OOV
    * piece (vocab_id 0) and stops. word_pos/piece_pos are 0-based to
    * match Spark's posexplode. */
  val tokenize: String = """
WITH RECURSIVE
raw AS (
  SELECT doc_id, text, string_split_regex(trim(text), ' +') AS rtoks
  FROM documents),
c AS (SELECT unnest(rtoks) AS token FROM raw),
vc AS (SELECT token, count(*) AS n FROM c GROUP BY token
       HAVING count(*) >= 5),
v AS (SELECT CAST(row_number() OVER (ORDER BY n DESC, token) AS INTEGER)
         AS vocab_id, token
      FROM vc),
t AS (
  SELECT doc_id,
         string_split_regex(trim(
           text
           || CASE WHEN doc_id % 3 = 0
                   THEN ' ' || rtoks[1] || rtoks[1] ELSE '' END
           || CASE WHEN doc_id % 7 = 0
                   THEN ' ' || rtoks[1] || '9q' ELSE '' END), ' +') AS toks
  FROM raw),
words AS (
  SELECT doc_id, CAST(i - 1 AS INTEGER) AS word_pos, word
  FROM (SELECT doc_id, unnest(toks) AS word,
               generate_subscripts(toks, 1) AS i
        FROM t)),
rec(doc_id, word_pos, rem, piece_pos, piece, vocab_id) AS (
  SELECT doc_id, word_pos, word, CAST(-1 AS INTEGER),
         CAST(NULL AS VARCHAR), CAST(NULL AS INTEGER)
  FROM words
  UNION ALL
  SELECT doc_id, word_pos,
         CASE WHEN best IS NULL THEN ''
              ELSE substr(rem, CAST(len(best.token) + 1 AS INTEGER)) END,
         CAST(piece_pos + 1 AS INTEGER),
         CASE WHEN best IS NULL THEN rem ELSE best.token END,
         CAST(coalesce(best.vocab_id, 0) AS INTEGER)
  FROM (SELECT rec.*,
          (SELECT {'token': v.token, 'vocab_id': v.vocab_id}
           FROM v WHERE starts_with(rec.rem, v.token)
           ORDER BY len(v.token) DESC LIMIT 1) AS best
        FROM rec WHERE rem <> '')
)
SELECT doc_id, word_pos, piece_pos, piece, vocab_id
FROM rec WHERE piece_pos >= 0
ORDER BY doc_id, word_pos, piece_pos"""

  /** q63 oracle: the curation composite replayed stage by stage —
    * dup salt, quality gate (token floor + stopword-ratio ceiling),
    * min-id-per-md5 dedup, md5-ordered per-lang sample, streaming-
    * fill packing (q59's rule with shards=1, budget=256). */
  val curationPipeline: String = """
WITH base AS (
  SELECT doc_id, lang, text FROM documents
  UNION ALL
  SELECT doc_id + 10000, lang, text FROM documents WHERE doc_id % 10 = 0),
t AS (
  SELECT doc_id, lang, text,
         string_split_regex(trim(text), ' +') AS toks
  FROM base),
q AS (
  SELECT doc_id, lang, text, CAST(len(toks) AS BIGINT) AS n_tok
  FROM t
  WHERE len(toks) >= 30
    AND CAST(len(list_filter(toks, x ->
          list_contains(['the','a','of','and','is','to'], x))) AS DOUBLE)
        / len(toks) <= 0.10),
d AS (
  SELECT doc_id, lang, text, n_tok FROM (
    SELECT doc_id, lang, text, n_tok,
           min(doc_id) OVER (PARTITION BY md5(text)) AS keep
    FROM q)
  WHERE doc_id = keep),
s AS (
  SELECT doc_id, lang, n_tok FROM (
    SELECT doc_id, lang, n_tok,
           row_number() OVER (
             PARTITION BY lang ORDER BY md5(text), doc_id) AS rn
    FROM d)
  WHERE rn <= 10),
b AS (
  SELECT lang, doc_id, doc_id % 1 AS shard, n_tok,
         CAST(floor((sum(n_tok) OVER (PARTITION BY lang, doc_id % 1
             ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tok)
           / 256) AS BIGINT) AS bin
  FROM s)
SELECT lang, shard, bin,
       count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM b GROUP BY lang, shard, bin ORDER BY lang, shard, bin"""

  /** q66 oracle: transitive near-dup dedup replayed with brute force —
    * all-pairs 3-shingle Jaccard ≥ 0.8 as the edge set (the LSH
    * candidates provably cover it: TextDedupSpec), then the q58-style
    * recursive closure; survivors are component minima + unpaired
    * docs. Shingle construction mirrors TextOps.shingles: windows of
    * 3 tokens, short docs yield one (shorter) window. */
  val clusterDedup: String = """
WITH RECURSIVE t AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
  FROM documents WHERE doc_id < 1000),
s AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(toks) - 3, 0) + 2),
           i -> array_to_string(toks[i:i+2], ' '))) AS sh
  FROM t),
e AS (
  SELECT a.doc_id AS src, b.doc_id AS dst
  FROM s a, s b
  WHERE a.doc_id < b.doc_id
    AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
        >= 0.8),
sym AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
nodes AS (SELECT DISTINCT src AS id FROM sym),
reach(id, r) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT reach.id, sym.dst FROM reach JOIN sym ON sym.src = reach.r),
cc AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
SELECT doc_id FROM t
WHERE doc_id NOT IN (SELECT id FROM cc WHERE id <> component)
ORDER BY doc_id"""

  /** q70 oracle: context-window chunking replayed — identical integer
    * chunk-count arithmetic (1 + ceil(max(n−64,0)/48) via the
    * +stride−1 floor), clamped inclusive list slices, space joins. */
  val chunkDocs: String = """
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
  FROM documents),
x AS (
  SELECT doc_id, toks, len(toks) AS n,
         CAST(floor((greatest(len(toks) - 64, 0) + 47) / 48.0)
           AS INTEGER) AS extra
  FROM t),
c AS (
  SELECT doc_id, CAST(unnest(range(0, extra + 1)) AS INTEGER) AS i,
         toks, n
  FROM x)
SELECT doc_id, i AS chunk_idx, CAST(i * 48 AS BIGINT) AS start_tok,
       CAST(least(64, n - i * 48) AS BIGINT) AS n_chunk_tokens,
       array_to_string(toks[i * 48 + 1 : i * 48 + 64], ' ') AS chunk_text
FROM c ORDER BY doc_id, chunk_idx"""

  /** q71 oracle: repetition signals replayed — list lengths vs
    * distinct lengths and one IEEE division each (1e0, not the
    * DECIMAL literal 1.0). */
  val repetition: String = """
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
  FROM documents),
s AS (
  SELECT doc_id, toks,
         list_transform(range(1, greatest(len(toks) - 3, 0) + 2),
           i -> array_to_string(toks[i:i+2], ' ')) AS sh
  FROM t)
SELECT doc_id,
       CAST(len(sh) AS BIGINT) AS n_shingles,
       CAST(len(list_distinct(sh)) AS BIGINT) AS n_shingles_distinct,
       1e0 - CAST(len(list_distinct(sh)) AS DOUBLE) / len(sh)
         AS shingle_rep_ratio,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(toks)) AS BIGINT) AS n_tokens_distinct,
       1e0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
         AS token_rep_ratio
FROM s ORDER BY doc_id"""

  /** q25 oracle: MinHash-LSH near-dup dedup replayed with brute-force
    * shingle-Jaccard pairs — valid because the LSH candidate cover is
    * spec-proven complete on this corpus (TextDedupSpec: LSH ≡
    * brute-force shingle dedup), the same argument that oracle-gates
    * q66/q68. Batch drop rule: a doc survives iff it has no lower-id
    * partner at 3-shingle Jaccard ≥ 0.8. */
  val minhashDedup: String = """
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
  FROM documents),
s AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(toks) - 3, 0) + 2),
           i -> array_to_string(toks[i:i+2], ' '))) AS sh
  FROM t),
e AS (
  SELECT a.doc_id AS lo, b.doc_id AS hi
  FROM s a, s b
  WHERE a.doc_id < b.doc_id
    AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
        >= 0.8)
SELECT doc_id FROM t
WHERE doc_id NOT IN (SELECT hi FROM e)
ORDER BY doc_id"""

  /** q68 oracle: incremental dedup vs a persisted index, replayed
    * with brute-force shingle-Jaccard pairs (the LSH candidate cover
    * is spec-proven complete on this corpus). Index-canonical rule:
    * an odd (shard) doc is dropped iff it has an even (indexed)
    * partner at ANY id — indexed docs are never dropped, so a higher
    * even partner still drops the odd doc — or a LOWER odd partner
    * (the within-shard batch rule). Same 3-shingle measure as
    * clusterDedup. */
  val incrementalDedup: String = """
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
  FROM documents WHERE doc_id < 1000),
s AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(toks) - 3, 0) + 2),
           i -> array_to_string(toks[i:i+2], ' '))) AS sh
  FROM t),
e AS (
  SELECT a.doc_id AS lo, b.doc_id AS hi
  FROM s a, s b
  WHERE a.doc_id < b.doc_id
    AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
        >= 0.8)
SELECT doc_id FROM t
WHERE doc_id % 2 = 1
  AND NOT EXISTS (SELECT 1 FROM e
                  WHERE e.hi = t.doc_id
                     OR (e.lo = t.doc_id AND e.hi % 2 = 0))
ORDER BY doc_id"""

  /** q67 oracle: benchmark decontamination replayed — identical
    * 5-shingle derivation (the clusterDedup formulation with n=5),
    * pooled distinct eval shingles, per-doc matched/total counts from
    * one LEFT JOIN (count(*) = denominator, count(matched) =
    * numerator — the same single-pass shape as the Spark plan), and
    * one IEEE division for the ratio. */
  val decontaminate: String = """
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
  FROM documents),
s AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(toks) - 5, 0) + 2),
           i -> array_to_string(toks[i:i+4], ' '))) AS sh
  FROM t),
pool AS (
  SELECT DISTINCT unnest(sh) AS shingle FROM s WHERE doc_id % 40 = 0),
cs AS (SELECT doc_id, unnest(sh) AS shingle FROM s),
m AS (
  SELECT cs.doc_id,
         count(*) AS n_shingles,
         count(pool.shingle) AS n_matched
  FROM cs LEFT JOIN pool ON cs.shingle = pool.shingle
  GROUP BY cs.doc_id)
SELECT doc_id, n_shingles, n_matched,
       CAST(n_matched AS DOUBLE) / n_shingles AS overlap,
       (CAST(n_matched AS DOUBLE) / n_shingles) >= 0.5 AS contaminated
FROM m ORDER BY doc_id"""

  /** q64 oracle: systematic PPS sampling replayed — same cumulative-
    * weight grid, floor() (never CAST: rounding differs), identical
    * IEEE divisions. */
  val ppsSample: String = """
WITH c AS (
  SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS w,
         sum(CAST(n_chars AS BIGINT)) OVER (
           PARTITION BY lang ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
           AS cum,
         sum(CAST(n_chars AS BIGINT)) OVER (PARTITION BY lang) AS total
  FROM documents),
p AS (
  SELECT lang, doc_id, w,
         CAST(floor(CAST(cum AS DOUBLE) / (CAST(total AS DOUBLE) / 8))
            - floor(CAST(cum - w AS DOUBLE) / (CAST(total AS DOUBLE) / 8))
           AS BIGINT) AS n_picks
  FROM c WHERE total > 0)
SELECT lang, doc_id, w AS weight, n_picks
FROM p WHERE n_picks > 0 ORDER BY lang, doc_id"""

  /** q62 oracle: identical PII salt + scrub. The patterns use only
    * syntax Java regex (Spark) and RE2 (DuckDB) agree on; the 'g'
    * flag matches Spark's replace-all default; numbers are counted
    * after email removal, mirroring the Spark expression tree. */
  val piiScrub: String = """
WITH s AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 7 = 0
                 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN ' ref 99' || CAST(doc_id AS VARCHAR) || '0042'
                 ELSE '' END AS t
  FROM documents),
e AS (
  SELECT doc_id, t,
         regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                        '<EMAIL>', 'g') AS te
  FROM s)
SELECT doc_id,
       regexp_replace(te, '[0-9]{6,}', '<NUM>', 'g') AS scrubbed,
       CAST(len(regexp_extract_all(t,
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
         AS n_emails,
       CAST(len(regexp_extract_all(te, '[0-9]{6,}')) AS BIGINT) AS n_numbers
FROM e ORDER BY doc_id"""

  /** q61 oracle: weighted-fair-queueing interleave — per-lang rank in
    * id order, virtual finish time rank/weight, first 100 of the
    * merged stream. rank and weight are identical values in both
    * engines, so the IEEE division ties out bit-exactly. */
  val interleave: String = """
WITH r AS (
  SELECT lang, doc_id,
         row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS r
  FROM documents),
w(lang, wt) AS (VALUES ('de', 0.125), ('en', 0.5), ('es', 0.125),
                       ('fr', 0.125), ('zh', 0.125)),
v AS (
  SELECT r.lang, r.doc_id, r.r,
         r.r / CAST(w.wt AS DOUBLE) AS vft  -- bare 0.125 is DECIMAL
  FROM r JOIN w ON r.lang = w.lang),
sel AS (SELECT * FROM v ORDER BY vft, lang, r LIMIT 100)
SELECT CAST(row_number() OVER (ORDER BY vft, lang, r) AS INTEGER) AS mix_pos,
       doc_id, lang
FROM sel ORDER BY mix_pos"""

  val semiAnti: String = """
SELECT c_custkey,
       CASE WHEN EXISTS (
         SELECT 1 FROM orders
         WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
       THEN 'active' ELSE 'inactive' END AS segment
FROM customer ORDER BY c_custkey"""

  val pivotStatus: String = s"""$curatedCte
SELECT CAST(date_trunc('month', booking_date) AS DATE) AS month_start,
       count(CASE WHEN booking_status = 'confirmed' THEN 1 END) AS confirmed,
       count(CASE WHEN booking_status = 'pending' THEN 1 END) AS pending,
       count(CASE WHEN booking_status = 'canceled' THEN 1 END) AS canceled
FROM curated GROUP BY 1 ORDER BY month_start"""

  /** q197 oracle: the melt replayed as the month × fixed-status grid
    * with zero-filled counts — the explicit-zeros contract that
    * distinguishes unpivot(pivot(x)) from a plain GROUP BY. */
  val unpivotStatus: String = s"""$curatedCte,
months AS (
  SELECT DISTINCT CAST(date_trunc('month', booking_date) AS DATE)
    AS month_start FROM curated),
statuses AS (
  SELECT * FROM (VALUES ('confirmed'), ('pending'), ('canceled'))
    s(booking_status)),
counts AS (
  SELECT CAST(date_trunc('month', booking_date) AS DATE) AS month_start,
         booking_status, count(*) AS n
  FROM curated GROUP BY 1, 2)
SELECT m.month_start, s.booking_status,
       coalesce(c.n, 0) AS n_bookings
FROM months m CROSS JOIN statuses s
LEFT JOIN counts c
  ON c.month_start = m.month_start
 AND c.booking_status = s.booking_status
ORDER BY m.month_start, s.booking_status"""

  val viewingFunnel: String = """
WITH uv AS (
  SELECT DISTINCT user_id, event_id % 2100 AS apartment_id,
         CAST(ts AS DATE) AS viewed_at,
         event_type = 'view' AS is_wishlisted,
         event_type AS call_to_action
  FROM events)
SELECT CAST(date_trunc('week', viewed_at) AS DATE) AS week_start,
       call_to_action,
       count(*) AS n_views,
       CAST(sum(CASE WHEN is_wishlisted THEN 1 ELSE 0 END) AS BIGINT)
         AS n_wishlisted
FROM uv GROUP BY 1, 2 ORDER BY week_start, call_to_action"""

  val rollupRevenue: String = s"""
SELECT CAST(year(o_orderdate) AS INT) AS order_year,
       CAST(month(o_orderdate) AS INT) AS order_month,
       count(*) AS n_orders,
       ${decSum(money("o_totalprice"))} AS revenue
FROM orders WHERE o_orderstatus = 'F'
GROUP BY ROLLUP (order_year, order_month)
ORDER BY order_year ASC NULLS FIRST, order_month ASC NULLS FIRST"""

  val asofJoin: String = """
WITH p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
v AS (
  SELECT user_id, ts AS view_ts, event_id AS view_event_id,
         value AS view_value
  FROM events WHERE event_type = 'view')
SELECT p.event_id, p.user_id, p.ts,
       v.view_event_id, v.view_value, v.view_ts
FROM p ASOF LEFT JOIN v
  ON p.user_id = v.user_id AND v.view_ts <= p.ts
ORDER BY p.event_id"""

  // —— extension operators (training-data pipeline) ————————————————

  val exactDedupDocs: String = """
SELECT doc_id, md5(text) AS text_hash FROM (
  SELECT doc_id, text,
         min(doc_id) OVER (PARTITION BY md5(text)) AS keep
  FROM documents)
WHERE doc_id = keep ORDER BY doc_id"""

  val tokenStats: String = """
SELECT doc_id,
       CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents ORDER BY doc_id"""

  val qualityScore: String = """
WITH t AS (
  SELECT doc_id, text,
         string_split_regex(trim(text), ' +') AS toks
  FROM documents),
f AS (
  SELECT doc_id, text, toks,
         len(list_filter(toks, x ->
           list_contains(['the','a','of','and','is','to'], x))) AS n_stop
  FROM t)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(n_stop AS BIGINT) AS n_stopwords,
       CAST(n_stop AS DOUBLE) / len(toks) AS stopword_ratio,
       CAST(length(text) - (len(toks) - 1) AS DOUBLE) / len(toks)
         AS avg_word_len
FROM f ORDER BY doc_id"""

  val langStats: String = """
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT))
         AS BIGINT) AS total_tokens,
       max(n_chars) AS max_chars
FROM documents GROUP BY 1 ORDER BY lang"""

  val subwordCounts: String = """
SELECT doc_id,
       CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS n_words,
       CAST(list_sum(list_transform(string_split_regex(trim(text), ' +'),
         w -> CAST(ceil(length(w) / 4.0) AS BIGINT))) AS BIGINT) AS n_subwords
FROM documents ORDER BY doc_id"""

  // NULLIF('') mirrors get_json_object's NULL on missing key; the
  // -? covers negatives — keeps the regexp twin aligned with Spark's
  // JSON semantics for any plausible props shape.
  val jsonExtract: String = """
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(NULLIF(regexp_extract(props, '"k":\s*(-?\d+)', 1), '')
           AS BIGINT)) AS BIGINT) AS sum_k,
       max(CAST(NULLIF(regexp_extract(props, '"k":\s*(-?\d+)', 1), '')
           AS BIGINT)) AS max_k
FROM events GROUP BY 1 ORDER BY event_type"""

  val stratifiedSample: String = """
SELECT lang, doc_id, md5(text) AS sample_key FROM (
  SELECT lang, doc_id, text,
         row_number() OVER (
           PARTITION BY lang ORDER BY md5(text), doc_id) AS rn
  FROM documents)
WHERE rn <= 10 ORDER BY lang, doc_id"""

  val lengthQuantiles: String = """
SELECT lang,
       quantile_cont(n_chars, 0.5) AS p50_chars,
       quantile_cont(n_chars, 0.9) AS p90_chars,
       max(n_chars) AS max_chars
FROM documents GROUP BY 1 ORDER BY lang"""

  val jaccardTopPairs: String = """
WITH s AS (
  SELECT doc_id, list_distinct(string_split_regex(trim(text), ' +')) AS toks
  FROM documents WHERE doc_id < 1000),
p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         len(list_filter(a.toks, x -> list_contains(b.toks, x))) AS n_inter,
         len(a.toks) AS na, len(b.toks) AS nb
  FROM s a, s b WHERE a.doc_id < b.doc_id)
SELECT id_a, id_b,
       CAST(n_inter AS DOUBLE) / (na + nb - n_inter) AS jaccard
FROM p ORDER BY jaccard DESC, id_a, id_b LIMIT 100"""

  /** q173 oracle: market-basket lift replayed — distinct (order,
    * item), order-keyed pair self-join (a < b), exact counts, the
    * same total-order top-100 cut and the two boundary divisions. */
  val basketLift: String = """
WITH i AS (
  SELECT DISTINCT l_orderkey AS ord, l_partkey AS item FROM lineitem),
n AS (SELECT count(DISTINCT ord) AS n_orders FROM i),
c AS (SELECT item, count(*) AS item_orders FROM i GROUP BY 1),
keep AS (SELECT ord FROM i GROUP BY ord HAVING count(*) <= 4096),
cap AS (SELECT i.* FROM i JOIN keep USING (ord)),
p AS (
  SELECT a.item AS item_a, b.item AS item_b, count(*) AS pair_orders
  FROM cap a JOIN cap b ON a.ord = b.ord AND a.item < b.item
  GROUP BY 1, 2),
t AS (
  SELECT p.item_a, p.item_b, p.pair_orders,
         ca.item_orders AS orders_a, cb.item_orders AS orders_b
  FROM p JOIN c ca ON ca.item = p.item_a
         JOIN c cb ON cb.item = p.item_b)
SELECT item_a, item_b, CAST(pair_orders AS BIGINT) AS pair_orders,
       CAST(orders_a AS BIGINT) AS orders_a,
       CAST(orders_b AS BIGINT) AS orders_b,
       CAST(pair_orders AS DOUBLE) / CAST(n_orders AS DOUBLE)
         AS support,
       CAST(pair_orders * n_orders AS DOUBLE)
         / CAST(orders_a * orders_b AS DOUBLE) AS lift
FROM t, n
ORDER BY pair_orders DESC, item_a, item_b LIMIT 100"""

  /** q170 oracle: cohort retention replayed — distinct (customer,
    * month), first-month cohorts, month-difference cells, one IEEE
    * division per cell. */
  val cohortRetention: String = """
WITH m AS (
  SELECT DISTINCT o_custkey AS user_id,
         CAST(date_trunc('month', o_orderdate) AS DATE) AS month
  FROM orders),
c AS (SELECT user_id, min(month) AS cohort_month FROM m GROUP BY 1),
s AS (SELECT cohort_month, count(*) AS cohort_size FROM c GROUP BY 1),
a AS (
  SELECT c.cohort_month,
         date_diff('month', c.cohort_month, m.month) AS months_since,
         count(*) AS n_active
  FROM m JOIN c USING (user_id) GROUP BY 1, 2)
SELECT a.cohort_month, CAST(a.months_since AS BIGINT) AS months_since,
       CAST(a.n_active AS BIGINT) AS n_active,
       CAST(s.cohort_size AS BIGINT) AS cohort_size,
       CAST(a.n_active AS DOUBLE) / CAST(s.cohort_size AS DOUBLE)
         AS retention_pct
FROM a JOIN s USING (cohort_month)
ORDER BY cohort_month, months_since"""

  /** q171 oracle: RFM segmentation replayed — money-rounded decimal
    * monetary sums, the shared anchor recency, and ntile tiers whose
    * order keys carry the custkey tie-break. */
  val rfmSegments: String = s"""
WITH per AS (
  SELECT o_custkey AS custkey, max(o_orderdate) AS last_date,
         count(*) AS n_orders,
         CAST(sum(CAST(${money("o_totalprice")} AS DECIMAL(18, 2)))
           AS DOUBLE) AS monetary
  FROM orders GROUP BY 1),
a AS (SELECT max(o_orderdate) AS anchor FROM orders),
t AS (
  SELECT custkey, date_diff('day', last_date, anchor) AS r_days,
         n_orders, monetary,
         ntile(4) OVER (ORDER BY date_diff('day', last_date, anchor),
           custkey) AS r_tier,
         ntile(4) OVER (ORDER BY n_orders DESC, custkey) AS f_tier,
         ntile(4) OVER (ORDER BY monetary DESC, custkey) AS m_tier
  FROM per, a)
SELECT custkey, CAST(r_days AS BIGINT) AS r_days,
       CAST(n_orders AS BIGINT) AS n_orders, monetary,
       CAST(r_tier AS BIGINT) AS r_tier,
       CAST(f_tier AS BIGINT) AS f_tier,
       CAST(m_tier AS BIGINT) AS m_tier,
       CAST(r_tier AS VARCHAR) || CAST(f_tier AS VARCHAR)
         || CAST(m_tier AS VARCHAR) AS segment
FROM t ORDER BY custkey"""

  /** q174 oracle: the SKETCH RFM tiering replayed end-to-end — the
    * q171 per-customer base, per-metric min/max, the fixed-width
    * 1024-bucket histogram (identical clamp arithmetic to
    * Sketch.histSketch), running-count quantile bounds with the same
    * in-bucket interpolation and ceil(q·N − 1e-9) ranks, and the
    * value-cut tier assignment (asc for recency, n−gt for
    * frequency/monetary). Every bound is the same IEEE chain in the
    * same order, so the tiers replay hash-exact — proving the
    * "no global sort" scale path computes REAL quantile tiers, not
    * approximately-blessed ones. Assumes non-constant metrics
    * (testdata is; the degenerate branch is RfmSketchSpec's job). */
  val rfmSketch: String = s"""
WITH per AS (
  SELECT o_custkey AS custkey, max(o_orderdate) AS last_date,
         count(*) AS n_orders,
         CAST(sum(CAST(${money("o_totalprice")} AS DECIMAL(18, 2)))
           AS DOUBLE) AS monetary
  FROM orders GROUP BY 1),
a AS (SELECT max(o_orderdate) AS anchor FROM orders),
base AS (
  SELECT custkey,
         CAST(date_diff('day', last_date, anchor) AS BIGINT) AS r_days,
         CAST(n_orders AS BIGINT) AS n_orders, monetary
  FROM per, a),
m AS (
  SELECT custkey, 'r' AS met, CAST(r_days AS DOUBLE) AS v FROM base
  UNION ALL
  SELECT custkey, 'f', CAST(n_orders AS DOUBLE) FROM base
  UNION ALL
  SELECT custkey, 'm', monetary FROM base),
st AS (
  SELECT met, min(v) AS lo, max(v) AS hi, count(*) AS n_cust
  FROM m GROUP BY 1),
h AS (
  SELECT m.met,
         CAST(least(greatest(floor((m.v - st.lo)
           / ((st.hi - st.lo) / 1024)), 0), 1023) AS INTEGER) AS bucket,
         count(*) AS cnt
  FROM m JOIN st ON st.met = m.met
  GROUP BY 1, 2),
c AS (
  SELECT met, bucket, cnt,
         sum(cnt) OVER (PARTITION BY met ORDER BY bucket) AS cum
  FROM h),
r AS (
  SELECT st.met, i.i,
         CAST(ceil(CAST(i.i AS DOUBLE) / 4 * st.n_cust
           - 0.000000001) AS BIGINT) AS rnk
  FROM st, (SELECT unnest([1, 2, 3]) AS i) i),
b AS (
  SELECT r.met, r.i,
         st.lo + ((st.hi - st.lo) / 1024) *
           (CAST(c.bucket AS DOUBLE) +
            CAST(r.rnk - (c.cum - c.cnt) AS DOUBLE)
              / CAST(c.cnt AS DOUBLE)) AS bound
  FROM r JOIN c ON c.met = r.met
    AND c.cum >= r.rnk AND (c.cum - c.cnt) < r.rnk
  JOIN st ON st.met = r.met),
gt AS (
  SELECT m.custkey, m.met,
         count(CASE WHEN m.v > b.bound THEN 1 END) AS n_gt
  FROM m LEFT JOIN b ON b.met = m.met
  GROUP BY 1, 2),
t AS (
  SELECT custkey,
         max(CASE WHEN met = 'r' THEN 1 + n_gt END) AS r_tier,
         max(CASE WHEN met = 'f' THEN 4 - n_gt END) AS f_tier,
         max(CASE WHEN met = 'm' THEN 4 - n_gt END) AS m_tier
  FROM gt GROUP BY 1)
SELECT base.custkey, base.r_days, base.n_orders, base.monetary,
       CAST(r_tier AS BIGINT) AS r_tier,
       CAST(f_tier AS BIGINT) AS f_tier,
       CAST(m_tier AS BIGINT) AS m_tier,
       CAST(r_tier AS VARCHAR) || CAST(f_tier AS VARCHAR)
         || CAST(m_tier AS VARCHAR) AS segment
FROM base JOIN t USING (custkey) ORDER BY custkey"""

  /** q172 oracle: per-group weekly trend replayed — integer-cent
    * HUGEINT sums (≡ Spark's decimal(38,0); a scaled-decimal product
    * would silently overflow DuckDB's 38-digit multiply into DOUBLE)
    * and the same guarded division + /100 rescale in the same
    * order. */
  val trendSlope: String = """
WITH w AS (
  SELECT o_orderpriority,
         CAST(date_trunc('week', o_orderdate) AS DATE) AS week,
         sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS HUGEINT)) AS y
  FROM orders GROUP BY 1, 2),
x AS (
  SELECT o_orderpriority, y,
         CAST(row_number() OVER (PARTITION BY o_orderpriority
           ORDER BY week) AS BIGINT) AS x
  FROM w),
s AS (
  SELECT o_orderpriority, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(y * x) AS sxy, sum(x * x) AS sxx
  FROM x GROUP BY 1)
SELECT o_orderpriority, CAST(n AS BIGINT) AS n_weeks,
       CASE WHEN n * sxx - sx * sx <> 0 THEN
         CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE) / 100.0 END AS slope
FROM s ORDER BY o_orderpriority"""

  /** q169 oracle: k-center greedy coreset replayed — the seed is the
    * lowest id, each later pick an unrolled CTE taking the argmax of
    * the exact min over the previously selected rows' cosine
    * distances (variadic `least` ≡ Spark's least fold: an exact min
    * is order-free), ties → lowest id. */
  val coresetSelect: String = {
    val k = 8
    def cos(p: String) =
      s"list_dot_product(v.e, $p.e) / (sqrt(list_dot_product(v.e, v.e))" +
        s" * sqrt(list_dot_product($p.e, $p.e)))"
    val sb = new StringBuilder
    sb ++= "WITH v AS (\n  SELECT vec_id AS id, CAST(embedding AS " +
      "DOUBLE[]) AS e FROM embeddings),\ns1 AS (SELECT id, e, 0.0 AS d " +
      "FROM v ORDER BY id LIMIT 1)"
    for (r <- 2 to k) {
      val prev = (1 until r).map(i => s"s$i")
      val terms = prev.map(p => s"1.0 - (${cos(p)})")
      val dexpr =
        if (terms.size == 1) terms.head
        else terms.mkString("least(", ", ", ")")
      sb ++= s",\ns$r AS (\n  SELECT v.id, v.e, $dexpr AS d\n  FROM v, " +
        s"${prev.mkString(", ")}\n  WHERE v.id NOT IN " +
        s"(${prev.map(_ + ".id").mkString(", ")})\n" +
        "  ORDER BY d DESC, v.id LIMIT 1)"
    }
    sb ++= "\n" + (1 to k).map(i =>
      s"SELECT CAST($i AS BIGINT) AS sel_rank, id AS vec_id, " +
        s"d AS min_dist FROM s$i").mkString("\nUNION ALL\n")
    sb ++= "\nORDER BY sel_rank"
    sb.toString
  }

  /** q167 oracle: embedding validity audit replayed — the identical
    * plants (zeroed, truncated-to-32, NaN-prepended, Inf-prepended),
    * the shared sequential-fold norm, NaN routing through has_nan
    * (NaN compares false against the zero epsilon in both engines)
    * and ±Inf through has_inf (isinf(NaN) is false, so the flags
    * stay independent). */
  val embeddingAudit: String = """
WITH v0 AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
plant AS (
  SELECT vec_id + 100000 AS vec_id, list_transform(e, x -> 0.0) AS e
  FROM v0 WHERE vec_id = 0
  UNION ALL
  SELECT vec_id + 100000, e[1:32] FROM v0 WHERE vec_id = 1
  UNION ALL
  SELECT vec_id + 100000, list_concat(['NaN'::DOUBLE], e[2:64])
  FROM v0 WHERE vec_id = 2
  UNION ALL
  SELECT vec_id + 100000, list_concat(['Infinity'::DOUBLE], e[2:64])
  FROM v0 WHERE vec_id = 3),
u AS (SELECT vec_id, e FROM v0 UNION ALL SELECT vec_id, e FROM plant)
SELECT vec_id, CAST(len(e) AS BIGINT) AS dim,
       sqrt(list_dot_product(e, e)) AS l2_norm,
       (len(e) = 64) AS dim_ok,
       (sqrt(list_dot_product(e, e)) < 0.000001) AS is_zero,
       (len(list_filter(e, x -> isnan(x))) > 0) AS has_nan,
       (len(list_filter(e, x -> isinf(x))) > 0) AS has_inf,
       ((len(e) = 64)
         AND NOT (sqrt(list_dot_product(e, e)) < 0.000001)
         AND NOT (len(list_filter(e, x -> isnan(x))) > 0)
         AND NOT (len(list_filter(e, x -> isinf(x))) > 0)) AS ok
FROM u ORDER BY vec_id"""

  /** q168 oracle: pairwise Jaccard histogram replayed — the q27
    * bounded all-pairs token-set Jaccard, identical bucket floor
    * (j·20) and the bucket_lo division. */
  val jaccardHistogram: String = """
WITH s AS (
  SELECT doc_id, list_distinct(string_split_regex(trim(text), ' +')) AS toks
  FROM documents WHERE doc_id < 1000),
p AS (
  SELECT len(list_filter(a.toks, x -> list_contains(b.toks, x))) AS n_inter,
         len(a.toks) AS na, len(b.toks) AS nb
  FROM s a, s b WHERE a.doc_id < b.doc_id),
j AS (
  SELECT CAST(floor(CAST(n_inter AS DOUBLE) / (na + nb - n_inter)
           * 20.0) AS BIGINT) AS bucket
  FROM p)
SELECT CAST(bucket AS DOUBLE) / 20.0 AS bucket_lo,
       count(*) AS n_pairs
FROM j GROUP BY bucket ORDER BY bucket_lo"""

  val cosineTopK: String = """
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
q AS (SELECT * FROM v WHERE vec_id < 50),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
         list_dot_product(q.e, c.e)
           / (sqrt(list_dot_product(q.e, q.e))
              * sqrt(list_dot_product(c.e, c.e))) AS cosine_sim
  FROM q, v c WHERE c.vec_id <> q.vec_id),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine_sim DESC, corpus_id) AS "rank"
  FROM scored)
SELECT query_id, CAST("rank" AS INT) AS "rank", corpus_id, cosine_sim
FROM ranked WHERE "rank" <= 5 ORDER BY query_id, "rank""""

  /** q135 oracle: MMR diversified top-k replayed — the q28 exact
    * top-20 candidates, pairwise candidate cosines, and the five
    * greedy rounds unrolled as CTEs: round 1 is the relevance
    * argmax; each later round scores the unpicked candidates with
    * 0.7·rel − (1−0.7)·maxSimToPicked — the (1−λ) factor is a
    * CAST-to-DOUBLE subtraction because DuckDB folds bare
    * `1.0 - 0.7` in DECIMAL (exact 0.3), while Spark's
    * `lit(1.0 - lambda)` is the IEEE double 0.30000000000000004 —
    * then takes the (mmr desc, corpus_id) argmax. */
  val mmrTopK: String = {
    val k = 5
    val sb = new StringBuilder
    sb ++= """WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
q AS (SELECT * FROM v WHERE vec_id < 50),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
         list_dot_product(q.e, c.e)
           / (sqrt(list_dot_product(q.e, q.e))
              * sqrt(list_dot_product(c.e, c.e))) AS rel
  FROM q, v c WHERE c.vec_id <> q.vec_id),
cands AS (
  SELECT query_id, corpus_id, rel FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
      ORDER BY rel DESC, corpus_id) AS rn FROM scored)
  WHERE rn <= 20),
sims AS (
  SELECT a.query_id, a.corpus_id AS a, b.corpus_id AS b,
         list_dot_product(av.e, bv.e)
           / (sqrt(list_dot_product(av.e, av.e))
              * sqrt(list_dot_product(bv.e, bv.e))) AS sim
  FROM cands a JOIN cands b ON a.query_id = b.query_id
       AND a.corpus_id <> b.corpus_id
  JOIN v av ON av.vec_id = a.corpus_id
  JOIN v bv ON bv.vec_id = b.corpus_id),
pk1 AS (
  SELECT query_id, corpus_id, rel, rel AS mmr_score,
         CAST(1 AS INTEGER) AS "rank"
  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
          ORDER BY rel DESC, corpus_id) AS rn FROM cands)
  WHERE rn = 1)"""
    for (r <- 2 to k) {
      sb ++= s""",
ms$r AS (
  SELECT s.query_id, s.a AS corpus_id, max(s.sim) AS ms
  FROM sims s JOIN pk${r - 1} p
    ON p.query_id = s.query_id AND p.corpus_id = s.b
  GROUP BY 1, 2),
sc$r AS (
  SELECT c.query_id, c.corpus_id, c.rel,
         0.7 * c.rel
           - (CAST(1.0 AS DOUBLE) - CAST(0.7 AS DOUBLE)) * m.ms
           AS mmr_score
  FROM cands c
  JOIN ms$r m ON m.query_id = c.query_id AND m.corpus_id = c.corpus_id
  WHERE NOT EXISTS (SELECT 1 FROM pk${r - 1} p
    WHERE p.query_id = c.query_id AND p.corpus_id = c.corpus_id)),
p$r AS (
  SELECT query_id, corpus_id, rel, mmr_score,
         CAST($r AS INTEGER) AS "rank"
  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
          ORDER BY mmr_score DESC, corpus_id) AS rn FROM sc$r)
  WHERE rn = 1),
pk$r AS (SELECT * FROM pk${r - 1} UNION ALL SELECT * FROM p$r)"""
    }
    sb ++= s"""
SELECT query_id, "rank", corpus_id, rel AS cosine_sim, mmr_score
FROM pk$k ORDER BY query_id, "rank""""
    sb.toString
  }

  /** q137 oracle: embedding-space decontamination replayed — the q56
    * scaled-copy injection as the eval pool, exact cosine of every
    * corpus vector against every pool vector, argmax by
    * (sim desc, eval_id), one threshold verdict. */
  val embeddingDecon: String = """
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
  WHERE vec_id < 2000),
ev AS (
  SELECT vec_id + 100000 AS eval_id,
         list_transform(e, x -> x * 1.25) AS e
  FROM v WHERE vec_id % 5 = 0),
sims AS (
  SELECT c.vec_id, ev.eval_id,
         list_dot_product(c.e, ev.e)
           / (sqrt(list_dot_product(c.e, c.e))
              * sqrt(list_dot_product(ev.e, ev.e))) AS sim
  FROM v c, ev),
r AS (
  SELECT *, row_number() OVER (PARTITION BY vec_id
    ORDER BY sim DESC, eval_id) AS rn
  FROM sims)
SELECT vec_id, eval_id AS nearest_eval_id, sim AS max_eval_sim,
       sim >= 0.9 AS contaminated
FROM r WHERE rn = 1 ORDER BY vec_id"""

  /** q110 oracle: hard-negative mining replayed — the q28 exact
    * ranking with the band-pass ceiling filter applied before the
    * rank, identical IEEE cosine. */
  val hardNegatives: String = """
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
q AS (SELECT * FROM v WHERE vec_id < 50),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
         list_dot_product(q.e, c.e)
           / (sqrt(list_dot_product(q.e, q.e))
              * sqrt(list_dot_product(c.e, c.e))) AS cosine_sim
  FROM q, v c WHERE c.vec_id <> q.vec_id),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine_sim DESC, corpus_id) AS "rank"
  FROM scored WHERE cosine_sim < 0.95)
SELECT query_id, CAST("rank" AS INT) AS "rank", corpus_id, cosine_sim
FROM ranked WHERE "rank" <= 5 ORDER BY query_id, "rank""""

  val multimodalMeta: String = """
SELECT CAST(doc_id AS BIGINT) AS asset_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       sha256(text) AS sha
FROM documents ORDER BY asset_id"""

  /** Twin of Multimodal.decodeAssets: the decode stub derives
    * width/height from sha256 hex digits, so DuckDB reproduces the
    * full decoded row ('0x…'::BIGINT parses the hex substring). */
  val multimodalDecode: String = """
SELECT CAST(doc_id AS BIGINT) AS asset_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       sha256(text) AS sha,
       CAST(16 + CAST('0x' || substr(sha256(text), 1, 5) AS BIGINT) % 1024
         AS INT) AS width,
       CAST(16 + CAST('0x' || substr(sha256(text), 6, 5) AS BIGINT) % 1024
         AS INT) AS height,
       'stub' AS format
FROM documents ORDER BY asset_id"""

  /** Twin of TextOps.langId: argmax over per-language marker-hit
    * scores via list_max of (score, lang) structs — the same
    * (max score, then max lang) total order Spark's array_max uses.
    * Marker lists are generated from TextOps.LangMarkers so the two
    * sides cannot drift. */
  val langId: String = {
    val branches = graft.ops.TextOps.LangMarkers.toSeq.sortBy(_._1)
      .map { case (lang, ms) =>
        val inList = ms.map(m => s"'${m.replace("'", "''")}'").mkString(", ")
        s"struct_pack(score := len(list_filter(toks, t -> t IN ($inList)))," +
          s" lang := '$lang')"
      }.mkString(",\n         ")
    s"""
WITH t AS (
  SELECT doc_id, lang, string_split_regex(trim(text), ' +') AS toks
  FROM documents)
SELECT doc_id,
       (list_max([$branches])).lang AS predicted_lang,
       lang AS actual_lang
FROM t ORDER BY doc_id"""
  }

  val sqlDotProduct: String = """
SELECT vec_id,
       list_dot_product(CAST(embedding AS DOUBLE[]),
                        CAST(embedding AS DOUBLE[])) AS self_dot
FROM embeddings WHERE vec_id < 100 ORDER BY vec_id"""

  val sessionize: String = """
WITH l AS (
  SELECT user_id, event_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_ts
  FROM events),
f AS (
  SELECT user_id, event_id, ts,
         CASE WHEN prev_ts IS NULL
                   OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM l),
s AS (
  SELECT user_id, ts,
         sum(new_session) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM f)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       count(*) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end
FROM s GROUP BY 1, 2 ORDER BY user_id, session_id"""

  /** Twin of q42 (ops.RangeJoin.binned): plain BETWEEN join — the
    * bin quantization is internal, the visible semantics are the
    * half-open interval. */
  val rangeJoin: String = s"""
WITH promo AS (
  SELECT o_orderkey AS promo_id,
         TIMESTAMP '2024-01-01'
           + INTERVAL (o_orderkey % 28) DAY
           + INTERVAL ((o_orderkey % 5) * 3) HOUR AS promo_start,
         TIMESTAMP '2024-01-01'
           + INTERVAL (o_orderkey % 28 + 3) DAY
           + INTERVAL ((o_orderkey % 5) * 3) HOUR AS promo_end
  FROM orders WHERE o_orderkey % 1000 = 0)
SELECT promo_id,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       ${decSum(money("value"))} AS value_sum
FROM events e JOIN promo p
  ON e.ts >= p.promo_start AND e.ts < p.promo_end
GROUP BY promo_id ORDER BY promo_id"""

  /** Twin of q43: GROUP BY CUBE with GROUPING() (first arg = MSB on
    * both engines — verified empirically). */
  val cubeRevenue: String = s"""
$curatedCte
SELECT cityname, booking_status,
       GROUPING(cityname, booking_status) AS gid,
       count(*) AS n_bookings,
       ${decSum("total_price_usd")} AS revenue
FROM curated
GROUP BY CUBE (cityname, booking_status)
ORDER BY gid, cityname NULLS FIRST, booking_status NULLS FIRST"""

  /** Twin of q44 (ops.Upsert.latestByKey): the window formulation —
    * the struct-max aggregate picks the same (max ts, max event_id)
    * row as ORDER BY ts DESC, event_id DESC. */
  val scdUpsert: String = """
SELECT user_id, event_type, ts, event_id, value
FROM events
QUALIFY row_number() OVER (
  PARTITION BY user_id, event_type
  ORDER BY ts DESC, event_id DESC) = 1
ORDER BY user_id, event_type"""

  /** Twin of q45 (functions.TopKByValue): the window-rank
    * formulation the aggregate replaces. */
  val topkPerCity: String = s"""
$curatedCte
SELECT cityname, CAST(rn AS INT) AS rank,
       CAST(booking_id AS BIGINT) AS booking_id,
       total_price_usd AS price_usd
FROM (
  SELECT cityname, booking_id, total_price_usd,
         row_number() OVER (
           PARTITION BY cityname
           ORDER BY total_price_usd DESC, booking_id) AS rn
  FROM curated
  WHERE cityname IS NOT NULL AND total_price_usd IS NOT NULL)
WHERE rn <= 3
ORDER BY cityname, rank"""

  /** Twin of q46: frame-bounded running windows + ntile. */
  val runningTotals: String = s"""
SELECT o_orderkey, o_custkey,
       count(*) OVER cum AS running_n,
       CAST(sum(CAST(${money("o_totalprice")} AS DECIMAL(18,2)))
         OVER cum AS DOUBLE) AS running_rev,
       CAST(ntile(4) OVER rnk AS INT) AS quartile
FROM orders
WINDOW cum AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       rnk AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, o_orderkey"""

  /** Twin of q49 (ops.Diff.changes): FULL OUTER JOIN + IS DISTINCT
    * FROM classification. */
  val snapshotDiff: String = s"""
WITH old AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 7 <> 0),
new AS (
  SELECT o_orderkey, o_orderstatus,
         CASE WHEN o_orderkey % 5 = 0
              THEN ${money("o_totalprice * 1.05")}
              ELSE o_totalprice END AS o_totalprice
  FROM orders WHERE o_orderkey % 11 <> 0)
SELECT o_orderkey, change_type FROM (
  SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
         CASE WHEN o.o_orderkey IS NULL THEN 'added'
              WHEN n.o_orderkey IS NULL THEN 'removed'
              WHEN (o.o_orderstatus IS DISTINCT FROM n.o_orderstatus)
                OR (o.o_totalprice IS DISTINCT FROM n.o_totalprice)
              THEN 'changed'
              ELSE 'unchanged' END AS change_type
  FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey)
WHERE change_type <> 'unchanged'
ORDER BY o_orderkey"""

  /** Twin of q53 (Multimodal.frameSample): per-asset frame fan-out
    * via generate_series; n_frames = clamp(byte_len/64, 1, 16). */
  val frameSample: String = """
WITH a AS (
  SELECT CAST(doc_id AS BIGINT) AS asset_id,
         CAST(octet_length(encode(text)) AS BIGINT) AS byte_len
  FROM documents),
n AS (
  SELECT asset_id, byte_len,
         least(greatest(byte_len // 64, 1), 16) AS n_frames
  FROM a)
SELECT asset_id, byte_len, n_frames,
       UNNEST(generate_series(0, n_frames - 1)) AS frame_idx,
       UNNEST(generate_series(0, n_frames - 1)) * 64 AS frame_offset
FROM n ORDER BY asset_id, frame_idx"""

  /** Twin of q54 (Multimodal.resizePlan): sha-derived stub dims +
    * aspect-preserving integer resize (// = floor division, matching
    * Spark's DIV on non-negative ints). */
  val resizePlan: String = """
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS asset_id,
         CAST(16 + CAST('0x' || substr(sha256(text), 1, 5) AS BIGINT) % 1024
           AS INT) AS width,
         CAST(16 + CAST('0x' || substr(sha256(text), 6, 5) AS BIGINT) % 1024
           AS INT) AS height
  FROM documents)
SELECT asset_id, width, height,
       CAST(CASE WHEN greatest(width, height) <= 512 THEN width
            ELSE (CAST(width AS BIGINT) * 512) // greatest(width, height)
            END AS INT) AS out_w,
       CAST(CASE WHEN greatest(width, height) <= 512 THEN height
            ELSE (CAST(height AS BIGINT) * 512) // greatest(width, height)
            END AS INT) AS out_h
FROM d ORDER BY asset_id"""

  /** Twin of q50: hopping windows expanded per event — an event at
    * ts belongs to the 7 daily-aligned 7-day windows starting in
    * [trunc_day(ts)-6d, trunc_day(ts)] (Spark's epoch-aligned slide
    * is date-aligned in UTC). */
  val hoppingWindow: String = s"""
WITH w AS (
  SELECT UNNEST(generate_series(
           CAST(date_trunc('day', ts) AS TIMESTAMP) - INTERVAL 6 DAY,
           CAST(date_trunc('day', ts) AS TIMESTAMP),
           INTERVAL 1 DAY)) AS win_start_ts,
         event_type, value
  FROM events WHERE event_type = 'purchase')
SELECT CAST(win_start_ts AS DATE) AS win_start, event_type,
       count(*) AS n_events,
       ${decSum(money("value"))} AS value_sum
FROM w GROUP BY 1, 2 ORDER BY win_start, event_type"""

  /** Twin of q51: INTERSECT / EXCEPT (both distinct-set semantics on
    * both engines). */
  val setOps: String = """
WITH fh AS (SELECT user_id FROM events WHERE ts < TIMESTAMP '2024-01-16'),
sh AS (SELECT user_id FROM events WHERE ts >= TIMESTAMP '2024-01-16')
SELECT user_id, 'retained' AS segment
FROM (SELECT user_id FROM fh INTERSECT SELECT user_id FROM sh)
UNION ALL
SELECT user_id, 'churned' AS segment
FROM (SELECT user_id FROM fh EXCEPT SELECT user_id FROM sh)
ORDER BY user_id"""

  /** Twin of q47: UNNEST(string_split) word frequencies. */
  val wordCounts: String = """
SELECT word, count(*) AS n,
       count(DISTINCT p_partkey) AS n_parts
FROM (SELECT p_partkey, UNNEST(string_split(p_name, ' ')) AS word
      FROM part)
GROUP BY word ORDER BY word"""

  /** q72 oracle: the bloom prefilter provably changes nothing (no
    * false negatives + exact verification), so the oracle replays the
    * plain exact rule over the identically-salted shard: keep a shard
    * doc iff its text matches no corpus doc and no lower-id shard
    * doc. */
  val bloomDedup: String = """
WITH shard AS (
  SELECT doc_id + 1000000 AS doc_id, text
  FROM documents WHERE doc_id % 10 = 3
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id,
         text || ' shardnew ' || CAST(doc_id AS VARCHAR) AS text
  FROM documents WHERE doc_id % 10 = 7
  UNION ALL
  SELECT doc_id + 3000000 AS doc_id,
         text || ' shardnew ' || CAST(doc_id AS VARCHAR) AS text
  FROM documents WHERE doc_id % 10 = 7)
SELECT s.doc_id FROM shard s
WHERE NOT EXISTS (SELECT 1 FROM documents c WHERE c.text = s.text)
  AND NOT EXISTS (SELECT 1 FROM shard s2
                  WHERE s2.text = s.text AND s2.doc_id < s.doc_id)
ORDER BY doc_id"""

  /** q73 oracle: α=0.5 temperature targets — sqrt is IEEE
    * correctly-rounded on both engines, and the weight total is a
    * sequential fold in lang order (list_reduce over an ORDER BY
    * list ≡ Spark's aggregate over an array_sort'ed collect_list), so
    * the one double division and the floor(+0.5) land identically.
    * Selection replays the min-k md5 window. */
  val temperatureSample: String = """
WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
s AS (SELECT list_reduce(
         list(sqrt(CAST(n_docs AS DOUBLE)) ORDER BY lang),
         (a, b) -> a + b) AS total FROM c),
t AS (SELECT lang,
         CAST(floor(100.0 * sqrt(CAST(n_docs AS DOUBLE)) / total + 0.5)
              AS BIGINT) AS n_target
      FROM c, s),
r AS (SELECT lang, doc_id,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(text), doc_id) AS rn
      FROM documents)
SELECT r.lang, r.doc_id, CAST(rn AS BIGINT) AS sample_rank
FROM r JOIN t ON r.lang = t.lang
WHERE rn <= t.n_target
ORDER BY r.lang, sample_rank"""

  /** q74 oracle: rational-idf TF-IDF — tf·N/df in the same two
    * fixed-order IEEE ops as the Spark plan (no log: libm rounding is
    * engine-specific), ties on term asc. */
  val tfIdfTerms: String = """
WITH tf AS (
  SELECT doc_id, word AS term, count(*) AS tf
  FROM (SELECT doc_id,
               UNNEST(string_split_regex(trim(text), ' +')) AS word
        FROM documents WHERE doc_id < 100)
  GROUP BY doc_id, word),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM documents WHERE doc_id < 100),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         CAST(tf.tf AS DOUBLE) * n.n_docs / df.df AS score
  FROM tf JOIN df ON tf.term = df.term, n),
ranked AS (
  SELECT doc_id, term, tf, df, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, term) AS rank
  FROM scored)
SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, tf, df, score
FROM ranked WHERE rank <= 3
ORDER BY doc_id, rank"""

  /** q75 oracle: symmetric int8 quantization replayed element-wise —
    * scale = max|v|/127, q = floor(v/scale + 0.5) (the money()
    * rounding rule; |v| ≤ max|v| bounds q in [−127,127] with no
    * clamp). Arrays cast to DOUBLE first, like every embedding
    * oracle. */
  val quantizeInt8: String = """
WITH e AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings WHERE vec_id < 100),
m AS (
  SELECT vec_id, v,
         list_max(list_transform(v, x -> abs(x))) AS mx
  FROM e),
sc AS (
  SELECT vec_id, v,
         CASE WHEN mx = 0 THEN 0.0 ELSE mx / 127.0 END AS scale
  FROM m)
SELECT vec_id,
       CAST(i - 1 AS BIGINT) AS pos,
       CASE WHEN scale = 0 THEN 0
            ELSE CAST(floor(val / scale + 0.5) AS BIGINT) END AS qval,
       scale
FROM (SELECT vec_id, scale, unnest(v) AS val,
             generate_subscripts(v, 1) AS i
      FROM sc)
ORDER BY vec_id, pos"""

  /** q76 oracle: corpus-trained bigram LM replayed — identical
    * bigram derivation (1-based adjacent token pairs), count joins,
    * one IEEE division per p, and the per-doc sum as a
    * position-ordered list_reduce (≡ Spark's sorted-struct fold:
    * 0.0 + p₁ is exact, so the missing explicit init changes
    * nothing). */
  val lmScore: String = """
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
  FROM documents),
b AS (
  SELECT doc_id, i AS pos, toks[i] || ' ' || toks[i + 1] AS bigram
  FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
        FROM t WHERE len(toks) >= 2)),
cb AS (SELECT bigram, count(*) AS c_bigram FROM b GROUP BY bigram),
cp AS (SELECT string_split(bigram, ' ')[1] AS prefix,
              count(*) AS c_prefix
       FROM b GROUP BY 1),
p AS (
  SELECT b.doc_id, b.pos,
         CAST(cb.c_bigram AS DOUBLE) / cp.c_prefix AS p
  FROM b
  JOIN cb ON b.bigram = cb.bigram
  JOIN cp ON string_split(b.bigram, ' ')[1] = cp.prefix)
SELECT doc_id, count(*) AS n_bigrams,
       list_reduce(list(p ORDER BY pos), (a, x) -> a + x) / count(*)
         AS lm_score
FROM p GROUP BY doc_id
ORDER BY doc_id"""

  /** q104 oracle: explicit-mixture materialization replayed —
    * identical weight CASE, floor(budget·w + 0.5) targets capped at
    * inventory, identical md5 min-k order. */
  val mixtureApply: String = """
WITH tgt AS (
  SELECT source,
         least(CAST(floor(120.0 * CASE source
                 WHEN 'src0' THEN 0.5 WHEN 'src1' THEN 0.25
                 WHEN 'src2' THEN 0.15 WHEN 'src3' THEN 0.1
                 END + 0.5) AS BIGINT), count(*)) AS n_keep
  FROM documents GROUP BY source
  HAVING source IN ('src0', 'src1', 'src2', 'src3')),
r AS (
  SELECT source, doc_id, row_number() OVER (
    PARTITION BY source
    ORDER BY md5(concat('mix', ':', CAST(doc_id AS VARCHAR))), doc_id)
    AS rn
  FROM documents)
SELECT r.source, r.doc_id, CAST(rn AS BIGINT) AS sample_rank
FROM r JOIN tgt USING (source)
WHERE rn <= n_keep
ORDER BY r.source, rn"""

  /** q160 oracle: epoch-repetition mixture replayed — budget = corpus
    * size (SF-invariant shapes), the same floor(budget·w + 0.5)
    * target with the maxEpochs·n cap, integer full/remainder split,
    * the shared md5 selection order (salt "epoch"), and the epoch
    * fan-out as an unnested range — exactly t_s rows per source. */
  val epochMixture: String = """
WITH d AS (SELECT doc_id, source FROM documents),
b AS (SELECT CAST(count(*) AS DOUBLE) AS budget FROM d),
inv AS (SELECT source, count(*) AS n FROM d
        GROUP BY 1 HAVING source IN ('src0', 'src1', 'src2')),
t AS (
  SELECT source, n,
         least(CAST(floor(budget * CASE source WHEN 'src0' THEN 0.22
                 WHEN 'src1' THEN 0.06 WHEN 'src2' THEN 0.02
                 END + 0.5) AS BIGINT), 4 * n) AS tgt
  FROM inv, b),
f AS (SELECT source, tgt // n AS ful, tgt % n AS rem FROM t),
r AS (
  SELECT doc_id, source, row_number() OVER (
    PARTITION BY source
    ORDER BY md5(concat('epoch', ':', CAST(doc_id AS VARCHAR))), doc_id)
    AS rn
  FROM d WHERE source IN ('src0', 'src1', 'src2')),
e AS (
  SELECT r.source, r.doc_id, r.rn,
         ful + CASE WHEN rn <= rem THEN 1 ELSE 0 END AS n_ep
  FROM r JOIN f USING (source)),
g AS (SELECT source, doc_id, rn,
             unnest(range(1, n_ep + 1)) AS epoch
      FROM e)
SELECT source, doc_id, CAST(epoch AS BIGINT) AS epoch,
       CAST(rn AS BIGINT) AS sample_rank
FROM g ORDER BY source, doc_id, epoch"""

  /** q106 oracle: token-budget mixture replayed — identical weight
    * CASE, floor(budget·w + 0.5) token targets, md5-ordered running
    * sums (unique order key, so RANGE ≡ ROWS framing), and the
    * streaming-fill keep rule cum − n < target. */
  val tokenMixture: String = """
WITH d AS (
  SELECT source, doc_id,
         CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT)
           AS n_tokens,
         CASE source WHEN 'src0' THEN 0.4 WHEN 'src1' THEN 0.3
              WHEN 'src2' THEN 0.2 WHEN 'src3' THEN 0.1 END AS w
  FROM documents),
c AS (
  SELECT source, doc_id, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY source
           ORDER BY md5(concat('mix', ':', CAST(doc_id AS VARCHAR))),
             doc_id) AS BIGINT) AS cum_tokens,
         CAST(floor(3000.0 * w + 0.5) AS BIGINT) AS target
  FROM d WHERE w IS NOT NULL)
SELECT source, doc_id, n_tokens, cum_tokens
FROM c WHERE cum_tokens - n_tokens < target
ORDER BY source, cum_tokens"""

  /** q107 oracle: multi-benchmark decontamination replayed — per-set
    * pooled distinct 5-shingles, corpus distinct shingles, hit join,
    * per-doc denominators, (doc, set) attribution rows only where
    * ≥ 1 shingle matched. */
  val multiDecon: String = """
WITH ev AS (
  SELECT (doc_id // 40) % 3 AS eval_id,
         string_split_regex(trim(text), ' +') AS toks
  FROM documents WHERE doc_id % 40 = 0),
pool AS (
  SELECT DISTINCT eval_id,
         unnest(list_distinct(list_transform(
           range(1, greatest(len(toks) - 5, 0) + 2),
           i -> array_to_string(toks[i:i+4], ' ')))) AS shingle
  FROM ev),
t AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
  FROM documents),
cs AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           range(1, greatest(len(toks) - 5, 0) + 2),
           i -> array_to_string(toks[i:i+4], ' ')))) AS shingle
  FROM t),
cn AS (SELECT doc_id, count(*) AS n_shingles FROM cs GROUP BY doc_id),
m AS (
  SELECT cs.doc_id, pool.eval_id, count(*) AS n_matched
  FROM cs JOIN pool USING (shingle)
  GROUP BY cs.doc_id, pool.eval_id)
SELECT m.doc_id, m.eval_id, cn.n_shingles, m.n_matched,
       CAST(m.n_matched AS DOUBLE) / cn.n_shingles AS overlap,
       CAST(m.n_matched AS DOUBLE) / cn.n_shingles >= 0.5
         AS contaminated
FROM m JOIN cn USING (doc_id)
ORDER BY m.doc_id, m.eval_id"""

  /** q108 oracle: normalized exact dedup replayed — identical
    * normalization chain (lower → strip non-[a-z0-9 ] → collapse
    * spaces → trim; DuckDB regexp_replace needs the explicit 'g'
    * flag Spark applies by default) over the same case/punct-mangled
    * salt, min id per class. */
  val normalizedDedup: String = """
WITH corp AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 500000 AS doc_id, upper(text) || ' !!' AS text
  FROM documents WHERE doc_id % 20 = 0),
k AS (
  SELECT doc_id,
         md5(trim(regexp_replace(regexp_replace(lower(text),
           '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS kk
  FROM corp)
SELECT min(doc_id) AS doc_id FROM k GROUP BY kk ORDER BY doc_id"""

  /** q112 oracle: the exact Jaccard join replayed brute-force over
    * ALL pairs (valid because the Spark side's prefix cover is
    * lossless for J ≥ θ — J ≤ C, so both directions' prefixes must
    * hit); identical intersection counts and division order. */
  val exactJaccardJoin: String = """
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
  FROM documents),
s AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(toks) - 3, 0) + 2),
           i -> array_to_string(toks[i:i+2], ' '))) AS sh
  FROM t),
e AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(len(a.sh) AS BIGINT) AS n_a,
         CAST(len(b.sh) AS BIGINT) AS n_b,
         CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
           / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
           AS jaccard
  FROM s a, s b WHERE a.doc_id < b.doc_id)
SELECT id_a, id_b, n_a, n_b, jaccard
FROM e WHERE jaccard >= 0.8 ORDER BY id_a, id_b"""

  /** q138 oracle: contrastive triplet mining replayed — the salted
    * corpus (drop-first-token near-copies J≈0.98, first-half copies
    * J≈0.48), brute-force 3-shingle Jaccard over all pairs (valid:
    * the Spark prefix cover is lossless at the `negLo` threshold),
    * symmetrized, per-anchor argmax windows for the positive
    * (J ≥ 0.8) and band negative (0.4 ≤ J < 0.7), inner-joined. */
  val tripletMine: String = """
WITH corp AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 400000 AS doc_id,
         array_to_string(
           (string_split_regex(trim(text), ' +'))[2:], ' ') AS text
  FROM documents WHERE doc_id % 20 = 0
  UNION ALL
  SELECT doc_id + 500000 AS doc_id,
         array_to_string((string_split_regex(trim(text), ' +'))
           [1:CAST((len(string_split_regex(trim(text), ' +')) + 1) // 2
                AS INTEGER)], ' ') AS text
  FROM documents WHERE doc_id % 20 = 0),
t AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
  FROM corp),
s AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(toks) - 3, 0) + 2),
           i -> array_to_string(toks[i:i+2], ' '))) AS sh
  FROM t),
e AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
           / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
           AS jaccard
  FROM s a, s b WHERE a.doc_id < b.doc_id),
p AS (SELECT * FROM e WHERE jaccard >= 0.4),
sym AS (
  SELECT id_a AS anchor, id_b AS partner, jaccard FROM p
  UNION ALL
  SELECT id_b AS anchor, id_a AS partner, jaccard FROM p),
pos AS (
  SELECT anchor, partner AS pos_id, jaccard AS pos_jaccard
  FROM (SELECT *, row_number() OVER (PARTITION BY anchor
          ORDER BY jaccard DESC, partner) AS rn
        FROM sym WHERE jaccard >= 0.8)
  WHERE rn = 1),
neg AS (
  SELECT anchor, partner AS neg_id, jaccard AS neg_jaccard
  FROM (SELECT *, row_number() OVER (PARTITION BY anchor
          ORDER BY jaccard DESC, partner) AS rn
        FROM sym WHERE jaccard >= 0.4 AND jaccard < 0.7)
  WHERE rn = 1)
SELECT pos.anchor AS anchor_id, pos_id, neg_id,
       pos_jaccard, neg_jaccard
FROM pos JOIN neg ON pos.anchor = neg.anchor
ORDER BY anchor_id"""

  /** q105 oracle: the cross-source near-dup matrix replayed — brute-
    * force 3-shingle Jaccard pairs (bounded corpus), source lookups,
    * canonical (least, greatest) pair, one group-by. */
  val crossSourceDups: String = """
WITH t AS (
  SELECT doc_id, source, string_split_regex(trim(text), ' +') AS toks
  FROM documents WHERE doc_id < 1000),
s AS (
  SELECT doc_id, source,
         list_distinct(list_transform(
           range(1, greatest(len(toks) - 3, 0) + 2),
           i -> array_to_string(toks[i:i+2], ' '))) AS sh
  FROM t),
e AS (
  SELECT least(a.source, b.source) AS source_a,
         greatest(a.source, b.source) AS source_b
  FROM s a, s b
  WHERE a.doc_id < b.doc_id
    AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
        >= 0.8)
SELECT source_a, source_b, count(*) AS n_dup_pairs
FROM e GROUP BY source_a, source_b
ORDER BY source_a, source_b"""

  /** The q76/q102/q175 LM-score CTEs (shared so the two bucket
    * variants can never drift on the scoring arithmetic): per-doc
    * mean bigram probability via the sequential in-document fold. */
  private val lmScoreCtes: String = """t AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
  FROM documents),
b AS (
  SELECT doc_id, i AS pos, toks[i] || ' ' || toks[i + 1] AS bigram
  FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
        FROM t WHERE len(toks) >= 2)),
cb AS (SELECT bigram, count(*) AS c_bigram FROM b GROUP BY bigram),
cp AS (SELECT string_split(bigram, ' ')[1] AS prefix,
              count(*) AS c_prefix
       FROM b GROUP BY 1),
p AS (
  SELECT b.doc_id, b.pos,
         CAST(cb.c_bigram AS DOUBLE) / cp.c_prefix AS p
  FROM b
  JOIN cb ON b.bigram = cb.bigram
  JOIN cp ON string_split(b.bigram, ' ')[1] = cp.prefix),
sc AS (
  SELECT doc_id,
         list_reduce(list(p ORDER BY pos), (a, x) -> a + x) / count(*)
           AS lm_score
  FROM p GROUP BY doc_id)"""

  /** The q102/q175 per-bucket min-k-md5 keep tail (shared — it is
    * byte-identical code on the Spark side too, TextOps.bucketKeep).
    * Expects a CTE `bk(doc_id, lm_score, bucket)`. */
  private val bucketKeepTail: String = """r AS (
  SELECT doc_id, lm_score, bucket,
         row_number() OVER (PARTITION BY bucket
           ORDER BY md5(concat('ppl', ':', CAST(doc_id AS VARCHAR))),
             doc_id) AS rn,
         count(*) OVER (PARTITION BY bucket) AS n
  FROM bk)
SELECT doc_id, lm_score, CAST(bucket AS BIGINT) AS bucket,
       rn <= CAST(floor((CASE bucket WHEN 1 THEN 1.0 WHEN 2 THEN 0.5
                         ELSE 0.0 END) * n + 0.5) AS BIGINT) AS kept
FROM r ORDER BY doc_id"""

  /** q102 oracle: CCNet-style perplexity buckets replayed — the q76
    * LM-score CTEs, the same ntile(3) over (score desc, id), and the
    * same md5 min-k selection with floor(frac·n + 0.5) per-bucket
    * keep counts. */
  val pplBuckets: String = s"""
WITH $lmScoreCtes,
bk AS (
  SELECT doc_id, lm_score,
         ntile(3) OVER (ORDER BY lm_score DESC, doc_id) AS bucket
  FROM sc),
$bucketKeepTail"""

  /** q175 oracle: the SKETCH perplexity buckets replayed — q102's
    * LM-score CTEs, then the q174 histogram-quantile arithmetic
    * (min/max, 1024-bucket clamp, running-count ranks with the same
    * interpolation) and the descending value cut 3 − #(score >
    * bound), then the shared keep tail. Assumes non-constant scores
    * (testdata is; the degenerate branch is PplSketchSpec's job). */
  val pplBucketsSketch: String = s"""
WITH $lmScoreCtes,
st AS (
  SELECT count(*) AS n, min(lm_score) AS lo, max(lm_score) AS hi
  FROM sc),
h AS (
  SELECT CAST(least(greatest(floor((sc.lm_score - st.lo)
           / ((st.hi - st.lo) / 1024)), 0), 1023) AS INTEGER) AS bucket,
         count(*) AS cnt
  FROM sc, st GROUP BY 1),
c AS (
  SELECT bucket, cnt, sum(cnt) OVER (ORDER BY bucket) AS cum FROM h),
rk AS (
  SELECT i.i, CAST(ceil(CAST(i.i AS DOUBLE) / 3 * st.n
           - 0.000000001) AS BIGINT) AS rnk
  FROM st, (SELECT unnest([1, 2]) AS i) i),
bd AS (
  SELECT rk.i,
         st.lo + ((st.hi - st.lo) / 1024) *
           (CAST(c.bucket AS DOUBLE) +
            CAST(rk.rnk - (c.cum - c.cnt) AS DOUBLE)
              / CAST(c.cnt AS DOUBLE)) AS bound
  FROM rk JOIN c ON c.cum >= rk.rnk AND (c.cum - c.cnt) < rk.rnk
  CROSS JOIN st),
bk AS (
  SELECT sc.doc_id, sc.lm_score,
         CAST(3 - (SELECT count(*) FROM bd
                   WHERE sc.lm_score > bd.bound) AS INTEGER) AS bucket
  FROM sc),
$bucketKeepTail"""

  /** q77 oracle: the per-source report card — integer aggregates,
    * exact percentile (quantile_cont ≡ Spark percentile), and single
    * IEEE divisions. */
  val sourceReport: String = """
WITH d AS (
  SELECT source, lang, n_chars,
         len(string_split_regex(trim(text), ' +')) AS t
  FROM documents)
SELECT source,
       count(*) AS n_docs,
       count(DISTINCT lang) AS n_langs,
       CAST(sum(t) AS BIGINT) AS total_tokens,
       quantile_cont(n_chars, 0.9) AS p90_chars,
       CAST(sum(CASE WHEN t < 30 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_short,
       CAST(sum(t) AS DOUBLE) / count(*) AS avg_tokens,
       CAST(sum(CASE WHEN t < 30 THEN 1 ELSE 0 END) AS DOUBLE)
         / count(*) AS short_frac
FROM d GROUP BY source
ORDER BY source"""

  /** q78 oracle: duplicated k-token-window audit replayed over the
    * same span-salted corpus, grouping the window STRINGS (the Spark
    * side groups xxhash64 of them — identical counts absent a 64-bit
    * collision, see TextOps.dupSpans). Inclusive DuckDB list slices:
    * toks[i : i+7] is the 8-token window at position i. */
  val dupSpans: String = """
WITH corp AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 200000 AS doc_id,
         array_to_string((string_split_regex(trim(text), ' +'))[1:30], ' ')
           AS text
  FROM documents WHERE doc_id % 20 = 0),
t AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS toks FROM corp),
w AS (
  SELECT DISTINCT doc_id, array_to_string(toks[i : i + 7], ' ') AS win
  FROM (SELECT doc_id, toks,
               CAST(unnest(range(1, len(toks) - 8 + 2)) AS INTEGER) AS i
        FROM t WHERE len(toks) >= 8)),
dfreq AS (SELECT win, count(*) AS df FROM w GROUP BY win),
pd AS (
  SELECT w.doc_id, count(*) AS n_windows,
         sum(CASE WHEN dfreq.df >= 2 THEN 1 ELSE 0 END) AS n_dup_windows
  FROM w JOIN dfreq USING (win) GROUP BY w.doc_id),
r AS (
  SELECT t.doc_id,
         CAST(coalesce(pd.n_windows, 0) AS BIGINT) AS n_windows,
         CAST(coalesce(pd.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
         CASE WHEN coalesce(pd.n_windows, 0) > 0
              THEN CAST(pd.n_dup_windows AS DOUBLE) / pd.n_windows
              ELSE 0e0 END AS dup_ratio
  FROM t LEFT JOIN pd USING (doc_id))
SELECT doc_id, n_windows, n_dup_windows, dup_ratio,
       dup_ratio >= 0.5 AS flagged
FROM r ORDER BY doc_id"""

  /** q131 oracle: maximal duplicated-span extraction replayed with
    * window STRINGS over the identical q78 span salt — distinct-doc
    * window frequency, gap ≤ 8 gaps-and-islands merge (lag + running
    * sum, a NULL lag opens a region in both engines), span extent
    * max(p) − min(p) + 8, and the exact token slice re-emitted. */
  val maxDupSpans: String = """
WITH corp AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 200000 AS doc_id,
         array_to_string((string_split_regex(trim(text), ' +'))[1:30], ' ')
           AS text
  FROM documents WHERE doc_id % 20 = 0),
t AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS toks FROM corp),
w AS (
  SELECT doc_id, i - 1 AS p, array_to_string(toks[i : i + 7], ' ') AS win
  FROM (SELECT doc_id, toks,
               CAST(unnest(range(1, len(toks) - 8 + 2)) AS INTEGER) AS i
        FROM t WHERE len(toks) >= 8)),
dw AS (SELECT DISTINCT doc_id, win FROM w),
dfreq AS (SELECT win, count(*) AS df FROM dw GROUP BY win),
dup AS (
  SELECT w.doc_id, w.p FROM w JOIN dfreq USING (win) WHERE df >= 2),
fl AS (
  SELECT doc_id, p,
         CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) <= 8
              THEN 0 ELSE 1 END AS newgrp
  FROM dup),
g AS (
  SELECT doc_id, p,
         sum(newgrp) OVER (PARTITION BY doc_id ORDER BY p
                           ROWS UNBOUNDED PRECEDING) AS grp
  FROM fl),
sp AS (
  SELECT doc_id, min(p) AS s, max(p) - min(p) + 8 AS n,
         count(*) AS nw
  FROM g GROUP BY doc_id, grp)
SELECT sp.doc_id, CAST(s AS BIGINT) AS start_pos,
       CAST(n AS BIGINT) AS span_tokens,
       CAST(nw AS BIGINT) AS n_windows,
       array_to_string(t.toks[s + 1 : s + n], ' ') AS span_text
FROM sp JOIN t USING (doc_id)
ORDER BY sp.doc_id, start_pos"""

  /** q136 oracle: content-defined chunking audit replayed — the q78
    * span salt, the Horner 4-hex-digit md5 boundary predicate
    * (mod 16), window chunk numbering (boundaries strictly before),
    * md5 chunk keys, first occurrence by (doc, chunk), per-doc
    * rollup. */
  val cdcChunkAudit: String = """
WITH corp AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 200000 AS doc_id,
         array_to_string((string_split_regex(trim(text), ' +'))[1:30], ' ')
           AS text
  FROM documents WHERE doc_id % 20 = 0),
t AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS toks FROM corp),
tok AS (
  SELECT doc_id, CAST(i AS INTEGER) AS i, toks[i] AS tok
  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS i
        FROM t)),
fl AS (
  SELECT doc_id, i, tok,
         CASE WHEN
           ((strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 4096
            + (strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1) * 256
            + (strpos('0123456789abcdef', substr(md5(tok), 3, 1)) - 1) * 16
            + (strpos('0123456789abcdef', substr(md5(tok), 4, 1)) - 1))
           % 16 = 0 THEN 1 ELSE 0 END AS b
  FROM tok),
ch AS (
  SELECT doc_id, i, tok,
         coalesce(sum(b) OVER (PARTITION BY doc_id ORDER BY i
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk
  FROM fl),
cs AS (
  SELECT doc_id, chunk, count(*) AS n_tok,
         md5(array_to_string(list(tok ORDER BY i), ' ')) AS h
  FROM ch GROUP BY doc_id, chunk),
mk AS (
  SELECT *, row_number() OVER (PARTITION BY h
    ORDER BY doc_id, chunk) AS rn
  FROM cs),
ag AS (
  SELECT doc_id, sum(n_tok) AS n_tokens, count(*) AS n_chunks,
         sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS n_dup_chunks,
         sum(CASE WHEN rn > 1 THEN n_tok ELSE 0 END) AS n_dup_tokens
  FROM mk GROUP BY doc_id)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_chunks AS BIGINT) AS n_chunks,
       CAST(n_dup_chunks AS BIGINT) AS n_dup_chunks,
       CAST(n_dup_tokens AS BIGINT) AS n_dup_tokens,
       CAST(n_dup_tokens AS DOUBLE) / n_tokens AS dup_ratio
FROM ag ORDER BY doc_id"""

  /** q96 oracle: C4-style duplicated-span removal replayed — the
    * identical q78 span salt, tumbling 8-token blocks, corpus-wide
    * first occurrence by (doc_id, block_idx) via row_number, and
    * order-preserving reassembly (kept blocks + verbatim remainder).
    * Groups the block STRINGS exactly as the Spark side does (the
    * tumbling chop makes that affordable — each token is in exactly
    * one block), so the whole rewrite is hash-exact. */
  val spanScrub: String = """
WITH corp AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 200000 AS doc_id,
         array_to_string((string_split_regex(trim(text), ' +'))[1:30], ' ')
           AS text
  FROM documents WHERE doc_id % 20 = 0),
t AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS toks FROM corp),
blk AS (
  SELECT doc_id, i AS b,
         array_to_string(toks[i * 8 + 1 : i * 8 + 8], ' ') AS block
  FROM (SELECT doc_id, toks,
               CAST(unnest(range(0, len(toks) // 8)) AS INTEGER) AS i
        FROM t WHERE len(toks) >= 8)),
mk AS (
  SELECT doc_id, b, block,
         row_number() OVER (PARTITION BY block ORDER BY doc_id, b) = 1
           AS keep
  FROM blk),
kept AS (
  SELECT doc_id,
         coalesce(array_to_string(
           list(block ORDER BY b) FILTER (WHERE keep), ' '), '')
           AS kept_blocks,
         sum(CASE WHEN keep THEN 0 ELSE 1 END) AS n_dropped
  FROM mk GROUP BY doc_id),
rem AS (
  SELECT doc_id, CAST(len(toks) // 8 AS BIGINT) AS n_blocks,
         array_to_string(toks[len(toks) // 8 * 8 + 1 : len(toks)], ' ')
           AS remainder
  FROM t)
SELECT r.doc_id,
       trim(concat_ws(' ', coalesce(k.kept_blocks, ''), r.remainder))
         AS text,
       r.n_blocks,
       CAST(coalesce(k.n_dropped, 0) AS BIGINT) AS n_dropped
FROM rem r LEFT JOIN kept k USING (doc_id)
ORDER BY r.doc_id"""

  /** q122 oracle: boundary-robust sliding-window span removal
    * replayed with window STRINGS (the Spark side hashes them —
    * xxhash64 is internal only, so string equality replays exactly):
    * the q78 salt shifted by a one-token 'pad' prefix (the alignment
    * the tumbling q96 scrub is blind to), stride-1 8-token windows,
    * first occurrence by (doc_id, pos) via row_number, coverage
    * expansion of every non-first window, and order-preserving
    * reassembly of the uncovered tokens. */
  val slidingScrub: String = """
WITH corp AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 300000 AS doc_id,
         'pad ' ||
         array_to_string((string_split_regex(trim(text), ' +'))[1:30], ' ')
           AS text
  FROM documents WHERE doc_id % 20 = 0),
t AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS toks FROM corp),
w AS (
  SELECT doc_id, i - 1 AS p, array_to_string(toks[i : i + 7], ' ') AS win
  FROM (SELECT doc_id, toks,
               CAST(unnest(range(1, len(toks) - 8 + 2)) AS INTEGER) AS i
        FROM t WHERE len(toks) >= 8)),
d AS (
  SELECT doc_id, p FROM (
    SELECT doc_id, p,
           row_number() OVER (PARTITION BY win ORDER BY doc_id, p) AS rn
    FROM w) WHERE rn > 1),
cov AS (
  SELECT DISTINCT doc_id, p + j AS pos FROM d, range(0, 8) r(j)),
tok AS (
  SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, toks[i] AS tok
  FROM (SELECT doc_id, toks,
               CAST(unnest(range(1, len(toks) + 1)) AS INTEGER) AS i
        FROM t)),
ag AS (
  SELECT tok.doc_id,
         coalesce(array_to_string(
           list(tok ORDER BY tok.pos) FILTER (WHERE cov.pos IS NULL), ' '),
           '') AS text,
         count(*) AS n_tokens,
         sum(CASE WHEN cov.pos IS NOT NULL THEN 1 ELSE 0 END) AS n_removed
  FROM tok LEFT JOIN cov
    ON cov.doc_id = tok.doc_id AND cov.pos = tok.pos
  GROUP BY tok.doc_id)
SELECT c.doc_id, coalesce(ag.text, '') AS text,
       CAST(coalesce(ag.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(ag.n_removed, 0) AS BIGINT) AS n_removed
FROM corp c LEFT JOIN ag ON ag.doc_id = c.doc_id
ORDER BY c.doc_id"""

  /** q123 oracle: md5-SimHash dedup replayed from first principles —
    * per (doc, bit) the ±1 vote sum over every token's md5-derived
    * bit (bit i = hex digit ⌊i/4⌋ of md5(token), shifted i mod 4 —
    * exactly [[graft.functions.SimHashMd5]]), then the 4×16-bit
    * block index INCLUDING the maxBucket=50 star cap (all pairs in
    * buckets ≤ 50, min-id star pairs beyond — byte-for-byte the
    * Dedup.simHashCandidatesFromSig rule), Hamming ≤ 3 verify, and
    * the drop-higher-id rule. The earlier brute-force replay was
    * only valid while NO bucket exceeded the cap (pigeonhole makes
    * the index exhaustive, but the cap deliberately is not): the
    * r8-cont sf0.1 sweep found 25 flooded buckets (max 300 members)
    * where star capping keeps docs brute force would drop — a
    * 21-row divergence. Replaying the cap replays the ACTUAL
    * algorithm at every SF. */
  val simHashMd5Dedup: String = """
WITH corp AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000 AS doc_id, text
  FROM documents WHERE doc_id % 25 = 0),
tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS tok
  FROM corp),
bits AS (
  SELECT doc_id, i.i AS i,
         sum(CASE WHEN
             (CAST(strpos('0123456789abcdef',
                 substr(md5(tok), CAST(i.i // 4 AS INTEGER) + 1, 1)) - 1
               AS INTEGER) >> CAST(i.i % 4 AS INTEGER)) % 2 = 1
           THEN 1 ELSE -1 END) > 0 AS bit
  FROM tok, range(0, 64) i(i)
  GROUP BY doc_id, i.i),
blocks AS (
  SELECT doc_id, CAST(i // 16 AS INTEGER) AS block_id,
         sum(CASE WHEN bit THEN 1 << CAST(i % 16 AS INTEGER)
             ELSE 0 END) AS block
  FROM bits GROUP BY 1, 2),
bsz AS (SELECT block_id, block, count(*) AS n, min(doc_id) AS mid
        FROM blocks GROUP BY 1, 2),
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM blocks a
  JOIN blocks b ON b.block_id = a.block_id AND b.block = a.block
               AND b.doc_id > a.doc_id
  JOIN bsz s ON s.block_id = a.block_id AND s.block = a.block
  WHERE s.n <= 50
  UNION
  SELECT s.mid AS id_a, b.doc_id AS id_b
  FROM bsz s JOIN blocks b
    ON b.block_id = s.block_id AND b.block = s.block
   AND b.doc_id > s.mid
  WHERE s.n > 50),
ham AS (
  SELECT c.id_a, c.id_b,
         sum(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS hamming
  FROM cand c
  JOIN bits a ON a.doc_id = c.id_a
  JOIN bits b ON b.doc_id = c.id_b AND b.i = a.i
  GROUP BY 1, 2),
dup AS (SELECT DISTINCT id_b FROM ham WHERE hamming <= 3)
SELECT doc_id FROM (SELECT DISTINCT doc_id FROM corp)
WHERE doc_id NOT IN (SELECT id_b FROM dup)
ORDER BY doc_id"""

  /** q158 oracle: the k-anonymity / l-diversity audit — one grouped
    * count + exact count-distinct of the floor(acctbal/1000) bucket
    * (IEEE double division then floor: identical both engines),
    * risky = n < 10 OR distinct < 5. */
  val kAnonymity: String = """
SELECT c_nationkey, c_mktsegment,
       count(*) AS n,
       count(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT))
         AS n_sensitive,
       count(*) < 10 AS small,
       count(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT)) < 5
         AS uniform
FROM customer
GROUP BY c_nationkey, c_mktsegment
HAVING count(*) < 10
    OR count(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT)) < 5
ORDER BY c_nationkey, c_mktsegment"""

  /** q159 oracle: a release decision per customer row — released iff
    * the (nation, segment) class passes both gates. NULL-safe compare
    * (IS NOT DISTINCT FROM ≡ Spark's `<=>`), matching the engine's
    * null-safe class-membership join. */
  val kSuppress: String = """
WITH risky AS (
  SELECT c_nationkey, c_mktsegment
  FROM customer
  GROUP BY c_nationkey, c_mktsegment
  HAVING count(*) < 10
      OR count(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT)) < 5)
SELECT c_custkey,
       NOT EXISTS (
         SELECT 1 FROM risky r
         WHERE r.c_nationkey IS NOT DISTINCT FROM c.c_nationkey
           AND r.c_mktsegment IS NOT DISTINCT FROM c.c_mktsegment)
         AS released
FROM customer c
ORDER BY c_custkey"""

  /** q156 oracle: BM25 hard-negative mining replayed — same planted
    * +10000 exact copies, rarest-5 query terms (df asc, term asc),
    * the rational-idf term score with [[bm25Term]]'s literals, and
    * the CANONICAL sorted-term fold: `list_reduce(list(s ORDER BY
    * term))` replays Spark's `aggregate(sort_array(collect_list))`
    * addition-for-addition (0.0 + s₁ ≡ s₁ in IEEE, so the missing
    * init value cannot diverge). Exclusion = self OR md5-equal text;
    * rank ties break on doc id. */
  val bm25Negatives: String = """
WITH corp AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000 AS doc_id, text
  FROM documents WHERE doc_id % 25 = 0),
base AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS toks,
         CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS dln
  FROM corp),
post AS (
  SELECT doc_id, dln, term, count(*) AS tf
  FROM (SELECT doc_id, dln, unnest(toks) AS term FROM base)
  GROUP BY doc_id, dln, term),
st AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs, sum(dln) AS sum_dl
  FROM base),
dfs AS (SELECT term, count(*) AS df FROM post GROUP BY term),
qterms AS (
  SELECT qid, term, df FROM (
    SELECT qid, term, df,
           row_number() OVER (PARTITION BY qid ORDER BY df, term) AS rn
    FROM (SELECT doc_id AS qid, unnest(list_distinct(toks)) AS term
          FROM base WHERE doc_id < 20)
    JOIN dfs USING (term))
  WHERE rn <= 5),
scored AS (
  SELECT qid, doc_id,
         list_reduce(list(s ORDER BY term), (a, x) -> a + x) AS bm25
  FROM (SELECT q.qid, p.doc_id, p.term,
          (n_docs - CAST(q.df AS DOUBLE) + 0.5) / (CAST(q.df AS DOUBLE) + 0.5)
          * (CAST(p.tf AS DOUBLE) * 2.2)
          / (CAST(p.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(p.dln AS DOUBLE)
             / (CAST(sum_dl AS DOUBLE) / n_docs))) AS s
        FROM post p JOIN qterms q USING (term), st)
  GROUP BY qid, doc_id),
hq AS (SELECT doc_id AS qid, md5(text) AS qh FROM corp WHERE doc_id < 20),
hd AS (SELECT doc_id, md5(text) AS dh FROM corp),
ranked AS (
  SELECT qid, doc_id, bm25,
         row_number() OVER (PARTITION BY qid
                            ORDER BY bm25 DESC, doc_id) AS rank
  FROM scored JOIN hq USING (qid) JOIN hd USING (doc_id)
  WHERE doc_id <> qid AND dh <> qh)
SELECT qid, CAST(rank AS INT) AS rank, doc_id AS neg_id, bm25
FROM ranked WHERE rank <= 5
ORDER BY qid, rank"""

  /** q157 oracle: blockhash binary near-dup dedup replayed
    * bit-for-bit — the SAME value-jitter salt (+1 on every 20th
    * non-space char, capped at 125), byte j → tile j·64/n, tile
    * means as `CAST(sum AS DOUBLE)/count` (ALL 64 tiles per doc —
    * absent tiles get mean 0.0, matching the expression's n < 64
    * handling), the lower-median threshold as the 32nd-smallest
    * mean, and brute-force per-bit Hamming ≤ 3 (valid replay of the
    * block-indexed path: the 4×16-bit index is exhaustive to
    * Hamming 3 — the q123 argument). */
  val blockHashDedup: String = """
WITH jit AS (
  SELECT doc_id,
         string_agg(CASE WHEN j % 20 = 0
                          AND substr(text, CAST(j + 1 AS INTEGER), 1) <> ' '
                         THEN chr(CAST(least(125,
                           ascii(substr(text, CAST(j + 1 AS INTEGER), 1)) + 1)
                           AS INTEGER))
                         ELSE substr(text, CAST(j + 1 AS INTEGER), 1) END,
                    '' ORDER BY j) AS text
  FROM (SELECT doc_id, text, unnest(range(0, length(text))) AS j
        FROM documents WHERE doc_id % 25 = 0)
  GROUP BY doc_id),
corp AS (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id + 10000 AS doc_id, text FROM jit),
ch AS (
  SELECT doc_id, j,
         ascii(substr(text, CAST(j + 1 AS INTEGER), 1)) AS v,
         CAST(length(text) AS BIGINT) AS n
  FROM (SELECT doc_id, text, unnest(range(0, length(text))) AS j
        FROM corp)),
tl AS (
  SELECT doc_id, (j * 64) // n AS t, sum(v) AS ts, count(*) AS nb
  FROM ch GROUP BY doc_id, (j * 64) // n),
means AS (
  SELECT d.doc_id, ti.t,
         coalesce(CAST(tl.ts AS DOUBLE) / tl.nb, 0.0) AS mean
  FROM (SELECT DISTINCT doc_id FROM corp) d
  CROSS JOIN range(0, 64) ti(t)
  LEFT JOIN tl ON tl.doc_id = d.doc_id AND tl.t = ti.t),
med AS (
  SELECT doc_id, mean AS med FROM (
    SELECT doc_id, mean,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY mean, t) AS rn
    FROM means)
  WHERE rn = 32),
bits AS (
  SELECT m.doc_id, m.t, (m.mean > med.med) AS bit
  FROM means m JOIN med USING (doc_id)),
ham AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         sum(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS hamming
  FROM bits a JOIN bits b ON b.t = a.t AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
dup AS (SELECT DISTINCT id_b FROM ham WHERE hamming <= 3)
SELECT doc_id AS asset_id FROM (SELECT DISTINCT doc_id FROM corp)
WHERE doc_id NOT IN (SELECT id_b FROM dup)
ORDER BY asset_id"""

  /** q124 oracle: line-level boilerplate removal replayed with line
    * STRINGS (the Spark side hashes them — xxhash64 is internal
    * only, so string equality replays exactly): the same 8-token
    * reshape + planted nav/footer lines, df = distinct-doc count per
    * line, remove-everywhere at df ≥ 2, order-preserving reassembly. */
  val lineDedup: String = """
WITH base AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
  FROM documents),
lined AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0
              THEN 'subscribe to our newsletter today' || chr(10)
              ELSE '' END ||
         array_to_string(list_transform(range(1, len(toks) + 1, 8),
           i -> array_to_string(toks[i : i + 7], ' ')), chr(10)) ||
         CASE WHEN doc_id % 4 = 0
              THEN chr(10) || 'all rights reserved site footer'
              ELSE '' END AS text
  FROM base),
l AS (
  SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, ls[i] AS ln
  FROM (SELECT doc_id, string_split(text, chr(10)) AS ls,
               unnest(range(1, len(string_split(text, chr(10))) + 1)) AS i
        FROM lined)),
boiler AS (
  SELECT ln FROM (SELECT ln, count(DISTINCT doc_id) AS df
                  FROM l GROUP BY ln)
  WHERE df >= 2),
drops AS (SELECT doc_id, pos FROM l JOIN boiler USING (ln)),
ag AS (
  SELECT l.doc_id,
         coalesce(array_to_string(
           list(l.ln ORDER BY l.pos) FILTER (WHERE d.pos IS NULL),
           chr(10)), '') AS text,
         count(*) AS n_lines,
         sum(CASE WHEN d.pos IS NOT NULL THEN 1 ELSE 0 END) AS n_removed
  FROM l LEFT JOIN drops d ON d.doc_id = l.doc_id AND d.pos = l.pos
  GROUP BY l.doc_id)
SELECT doc_id, text, CAST(n_lines AS BIGINT) AS n_lines,
       CAST(n_removed AS BIGINT) AS n_removed
FROM ag ORDER BY doc_id"""

  /** q125 oracle: winnowing candidate pairs replayed — identical
    * 8-gram md5 hex hashes, 4-wide window lexicographic min,
    * per-doc distinct fingerprints, the 2..20 df band, and the
    * shared-count self-join. */
  val winnowPairs: String = """
WITH corp AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 400000 AS doc_id,
         'intro ' ||
         array_to_string((string_split_regex(trim(text), ' +'))[1:40], ' ')
           AS text
  FROM documents WHERE doc_id % 20 = 0),
t AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS toks FROM corp
  WHERE len(string_split_regex(trim(text), ' +')) >= 11),
kg AS (
  SELECT doc_id, list_transform(range(1, len(toks) - 8 + 2),
           i -> md5(array_to_string(toks[i : i + 7], ' '))) AS kg
  FROM t),
fp AS (
  SELECT DISTINCT doc_id, fp FROM (
    SELECT doc_id, unnest(list_transform(range(1, len(kg) - 4 + 2),
             j -> list_min(kg[j : j + 3]))) AS fp
    FROM kg)),
rare AS (
  SELECT fp FROM (SELECT fp, count(*) AS df FROM fp GROUP BY fp)
  WHERE df BETWEEN 2 AND 20),
j AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM fp a JOIN rare USING (fp) JOIN fp b USING (fp)
  WHERE a.doc_id < b.doc_id)
SELECT id_a, id_b, count(*) AS n_shared FROM j
GROUP BY id_a, id_b HAVING count(*) >= 2
ORDER BY id_a, id_b"""

  /** q126 oracle: epoch shuffle replayed — md5("epoch:3:graft:id")
    * as the shuffle key, 8 equal shards as fixed hex thresholds of
    * the SAME key (i/8 · 2³² rendered as 8 hex chars). */
  val epochOrder: String = """
WITH k AS (
  SELECT doc_id,
         md5(concat('epoch:3:graft', ':', CAST(doc_id AS VARCHAR)))
           AS shuffle_key
  FROM documents)
SELECT doc_id, shuffle_key,
       CASE WHEN substring(shuffle_key, 1, 8) < '20000000' THEN 'shard_000'
            WHEN substring(shuffle_key, 1, 8) < '40000000' THEN 'shard_001'
            WHEN substring(shuffle_key, 1, 8) < '60000000' THEN 'shard_002'
            WHEN substring(shuffle_key, 1, 8) < '80000000' THEN 'shard_003'
            WHEN substring(shuffle_key, 1, 8) < 'a0000000' THEN 'shard_004'
            WHEN substring(shuffle_key, 1, 8) < 'c0000000' THEN 'shard_005'
            WHEN substring(shuffle_key, 1, 8) < 'e0000000' THEN 'shard_006'
            ELSE 'shard_007' END AS shard
FROM k ORDER BY shard, shuffle_key, doc_id"""

  /** q127 oracle: DSIR importance weights replayed — unigram+bigram
    * features with Spark's position layout (unigrams 0..n−1, bigrams
    * n..2n−2), buckets from the first 3 md5 hex digits (Horner over
    * strpos digit values ≡ conv(hex, 16, 10)), add-1 smoothing over
    * 4096 buckets, and the position-ordered ratio fold (list_reduce
    * starts at the first element; Spark folds 0.0 + x₁ + … — equal
    * because 0.0 + x = x in IEEE). */
  private val importanceCtes: String = """t AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
  FROM documents),
f AS (
  SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, toks[i] AS gram
  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS i FROM t)
  UNION ALL
  SELECT doc_id, CAST(len(toks) + i - 1 AS INTEGER) AS pos,
         toks[i] || ' ' || toks[i + 1] AS gram
  FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
        FROM t WHERE len(toks) >= 2)),
fb AS (
  SELECT doc_id, pos,
         ((strpos('0123456789abcdef', substr(md5(gram), 1, 1)) - 1) * 256
          + (strpos('0123456789abcdef', substr(md5(gram), 2, 1)) - 1) * 16
          + (strpos('0123456789abcdef', substr(md5(gram), 3, 1)) - 1))
           % 4096 AS bucket
  FROM f),
tgt AS (SELECT fb.* FROM fb JOIN documents USING (doc_id)
        WHERE source = 'src0'),
ct AS (SELECT bucket, count(*) AS c_t FROM tgt GROUP BY bucket),
cr AS (SELECT bucket, count(*) AS c_r FROM fb GROUP BY bucket),
n AS (SELECT (SELECT count(*) FROM tgt) AS n_t,
             (SELECT count(*) FROM fb) AS n_r),
ratios AS (
  SELECT coalesce(ct.bucket, cr.bucket) AS bucket,
         ((CAST(coalesce(ct.c_t, 0) AS DOUBLE) + 1.0)
            / (CAST(n.n_t AS DOUBLE) + 4096.0))
         / ((CAST(coalesce(cr.c_r, 0) AS DOUBLE) + 1.0)
            / (CAST(n.n_r AS DOUBLE) + 4096.0)) AS ratio
  FROM ct FULL OUTER JOIN cr ON ct.bucket = cr.bucket, n),
wts AS (
  SELECT fb.doc_id, count(*) AS n_feats,
         list_reduce(list(r.ratio ORDER BY fb.pos), (a, x) -> a + x)
           / CAST(count(*) AS DOUBLE) AS weight
  FROM fb JOIN ratios r USING (bucket)
  GROUP BY fb.doc_id)"""

  val importanceWeights: String = "WITH " + importanceCtes + """
SELECT doc_id, n_feats, weight FROM wts ORDER BY doc_id"""

  /** q129 oracle: DSIR importance RESAMPLING — the q127 weights
    * quantized to fixed-point longs (floor(w·2²⁰ + 0.5)) feeding the
    * q113 systematic-PPS grid over one corpus-wide stratum, k = 64
    * equal cumulative-weight steps, id order. */
  val importanceResample: String = "WITH " + importanceCtes + """,
q AS (
  SELECT doc_id,
         CAST(floor(weight * 1048576.0 + 0.5) AS BIGINT) AS w
  FROM wts),
c AS (
  SELECT doc_id, w,
         sum(w) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum,
         sum(w) OVER () AS total
  FROM q),
p AS (
  SELECT doc_id, w,
         CAST(floor(CAST(cum AS DOUBLE) / (CAST(total AS DOUBLE) / 64))
            - floor(CAST(cum - w AS DOUBLE)
                    / (CAST(total AS DOUBLE) / 64)) AS BIGINT) AS n_picks
  FROM c WHERE total > 0)
SELECT doc_id, w AS weight, n_picks
FROM p WHERE n_picks > 0 ORDER BY doc_id"""

  /** q100 oracle: the deterministic hash split replayed — identical
    * md5 input string, identical first-8-hex extraction, identical
    * lexicographic thresholds (floor(0.8·2³²) = 0xcccccccc,
    * floor(0.9·2³²) = 0xe6666666). */
  val hashSplit: String = """
SELECT doc_id,
       CASE WHEN substring(md5(concat('graft', ':',
                 CAST(doc_id AS VARCHAR))), 1, 8) < 'cccccccc'
              THEN 'train'
            WHEN substring(md5(concat('graft', ':',
                 CAST(doc_id AS VARCHAR))), 1, 8) < 'e6666666'
              THEN 'val'
            ELSE 'test' END AS split
FROM documents ORDER BY doc_id"""

  /** q101 oracle: leakage-safe split replayed — the q66 brute-force
    * pair + recursive-closure machinery labels each doc's near-dup
    * component (singletons fall back to their own id), then the q100
    * md5 CASE decides the split on the GROUP id. */
  val leakageSplit: String = """
WITH RECURSIVE t AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
  FROM documents WHERE doc_id < 1000),
s AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(toks) - 3, 0) + 2),
           i -> array_to_string(toks[i:i+2], ' '))) AS sh
  FROM t),
e AS (
  SELECT a.doc_id AS src, b.doc_id AS dst
  FROM s a, s b
  WHERE a.doc_id < b.doc_id
    AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
        >= 0.8),
sym AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
nodes AS (SELECT DISTINCT src AS id FROM sym),
reach(id, r) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT reach.id, sym.dst FROM reach JOIN sym ON sym.src = reach.r),
cc AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
g AS (
  SELECT t.doc_id, coalesce(cc.component, t.doc_id) AS group_id
  FROM t LEFT JOIN cc ON cc.id = t.doc_id)
SELECT doc_id, group_id,
       CASE WHEN substring(md5(concat('graft', ':',
                 CAST(group_id AS VARCHAR))), 1, 8) < 'cccccccc'
              THEN 'train'
            WHEN substring(md5(concat('graft', ':',
                 CAST(group_id AS VARCHAR))), 1, 8) < 'e6666666'
              THEN 'val'
            ELSE 'test' END AS split
FROM g ORDER BY doc_id"""

  /** q98 oracle: JL random projection replayed element-wise — the
    * identical quantization (floor(x·2^20+0.5) longs), the identical
    * prime-modulus sign arithmetic, an integer list_reduce fold
    * (order-free — it's an integer sum), and the same two exact
    * divisions (2^20, √16 = 4). */
  val randomProject: String = """
WITH v AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200),
q AS (
  SELECT vec_id,
         list_transform(embedding, x ->
           CAST(floor(CAST(x AS DOUBLE) * 1048576.0 + 0.5) AS BIGINT))
           AS qv
  FROM v),
js AS (SELECT CAST(unnest(range(0, 16)) AS BIGINT) AS j),
p AS (
  SELECT vec_id, j,
         list_reduce(list_transform(range(1, len(qv) + 1), i ->
           qv[i] * (1 - 2 * (((CAST(i - 1 AS BIGINT) * 2654435761 +
             j * 40503) % 9973) % 2))),
           (a, b) -> a + b) AS s
  FROM q, js)
SELECT vec_id, j, CAST(s AS DOUBLE) / 1048576.0 / 4.0 AS value
FROM p ORDER BY vec_id, j"""

  /** q97 oracle: containment dedup replayed brute-force — all-pairs
    * 3-shingle containment |A∩B|/|A| on the same prefix-copy-salted
    * corpus (valid because the Spark side's prefix-filter candidate
    * cover is LOSSLESS by construction, not a sketch). Drop rule: A
    * dies iff some B with a strictly larger shingle set (ties → a
    * smaller id) contains it at ≥ 0.8. */
  val containmentDedup: String = """
WITH corp AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 300000 AS doc_id,
         array_to_string((string_split_regex(trim(text), ' +'))[1:40], ' ')
           AS text
  FROM documents WHERE doc_id % 25 = 0),
t AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS toks FROM corp),
s AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(toks) - 3, 0) + 2),
           i -> array_to_string(toks[i:i+2], ' '))) AS sh
  FROM t),
dead AS (
  SELECT DISTINCT a.doc_id
  FROM s a, s b
  WHERE a.doc_id <> b.doc_id
    AND (len(b.sh) > len(a.sh)
         OR (len(b.sh) = len(a.sh) AND b.doc_id < a.doc_id))
    AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / len(a.sh) >= 0.8)
SELECT doc_id FROM t
WHERE doc_id NOT IN (SELECT doc_id FROM dead)
ORDER BY doc_id"""

  /** q79 oracle: the Gopher rule battery replayed — integer counts,
    * two IEEE divisions, boolean rules, and the identical
    * first-failing CASE for the reject reason. */
  val qualityRules: String = """
WITH t AS (
  SELECT doc_id, length(text) AS nc,
         string_split_regex(trim(text), ' +') AS toks
  FROM documents),
m AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(nc - len(toks) + 1 AS DOUBLE) / len(toks) AS mean_word_len,
         CAST(len(list_filter(toks,
           x -> x IN ('the', 'a', 'of', 'and', 'is', 'to'))) AS BIGINT)
           AS n_stopwords,
         CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
           AS distinct_ratio
  FROM t),
r AS (
  SELECT *,
         (n_tokens >= 20 AND n_tokens <= 90) AS r_word_count,
         (mean_word_len >= 4.0 AND mean_word_len <= 10.0) AS r_word_len,
         (n_stopwords >= 2) AS r_stopword,
         (distinct_ratio >= 0.35) AS r_repetition
  FROM m)
SELECT doc_id, n_tokens, mean_word_len, n_stopwords, distinct_ratio,
       r_word_count, r_word_len, r_stopword, r_repetition,
       (r_word_count AND r_word_len AND r_stopword AND r_repetition)
         AS passes,
       CASE WHEN NOT r_word_count THEN 'word_count'
            WHEN NOT r_word_len THEN 'word_len'
            WHEN NOT r_stopword THEN 'stopword'
            WHEN NOT r_repetition THEN 'repetition' END AS reject_reason
FROM r ORDER BY doc_id"""

  /** q80 oracle: best-of-cluster dedup — the q66 brute-force-pairs +
    * recursive-closure replay, but the survivor per cluster is the
    * token-count argmax (ties → min id) instead of the min id. */
  val bestOfCluster: String = """
WITH RECURSIVE t AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
  FROM documents WHERE doc_id < 1000),
s AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(toks) - 3, 0) + 2),
           i -> array_to_string(toks[i:i+2], ' '))) AS sh
  FROM t),
e AS (
  SELECT a.doc_id AS src, b.doc_id AS dst
  FROM s a, s b
  WHERE a.doc_id < b.doc_id
    AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
        >= 0.8),
sym AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
nodes AS (SELECT DISTINCT src AS id FROM sym),
reach(id, r) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT reach.id, sym.dst FROM reach JOIN sym ON sym.src = reach.r),
cc AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
q AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n FROM t),
best AS (
  SELECT id FROM (
    SELECT cc.id,
           row_number() OVER (PARTITION BY cc.component
                              ORDER BY q.n DESC, cc.id) AS rn
    FROM cc JOIN q ON q.doc_id = cc.id)
  WHERE rn = 1)
SELECT doc_id FROM t
WHERE doc_id NOT IN (SELECT id FROM cc)
   OR doc_id IN (SELECT id FROM best)
ORDER BY doc_id"""

  /** q162 oracle: per-cluster graph cohesion stats replayed — the q66
    * brute-force verified pairs + recursive closure, then per
    * component: node count, edge count, the once-per-triangle
    * a<b<c wedge-close count, and density 2e/(n(n−1)). */
  val clusterStats: String = """
WITH RECURSIVE t AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
  FROM documents WHERE doc_id < 1000),
s AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(toks) - 3, 0) + 2),
           i -> array_to_string(toks[i:i+2], ' '))) AS sh
  FROM t),
e AS (
  SELECT a.doc_id AS src, b.doc_id AS dst
  FROM s a, s b
  WHERE a.doc_id < b.doc_id
    AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
        >= 0.8),
sym AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
nodes AS (SELECT DISTINCT src AS id FROM sym),
reach(id, r) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT reach.id, sym.dst FROM reach JOIN sym ON sym.src = reach.r),
cc AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
nn AS (SELECT component, count(*) AS n_nodes FROM cc GROUP BY 1),
ne AS (SELECT cc.component, count(*) AS n_edges
       FROM e JOIN cc ON cc.id = e.src GROUP BY 1),
tri AS (
  SELECT cc.component, count(*) AS n_triangles
  FROM e ab JOIN e bc ON bc.src = ab.dst
       JOIN e ac ON ac.src = ab.src AND ac.dst = bc.dst
       JOIN cc ON cc.id = ab.src
  GROUP BY 1)
SELECT nn.component, CAST(nn.n_nodes AS BIGINT) AS n_nodes,
       CAST(coalesce(ne.n_edges, 0) AS BIGINT) AS n_edges,
       CAST(coalesce(tri.n_triangles, 0) AS BIGINT) AS n_triangles,
       CAST(coalesce(ne.n_edges, 0) AS DOUBLE) * 2.0
         / CAST(nn.n_nodes * (nn.n_nodes - 1) AS DOUBLE) AS density
FROM nn LEFT JOIN ne USING (component) LEFT JOIN tri USING (component)
ORDER BY component"""

  /** q81 oracle: the curation-v2 composite replayed stage by stage —
    * the q79 rule battery gates the universe, the q80 recursive
    * closure + token-count argmax picks cluster survivors, and the
    * q73 sqrt-target min-k-md5 window draws the final sample. */
  val curationV2: String = """
WITH RECURSIVE base AS (
  SELECT doc_id, text, lang FROM documents WHERE doc_id < 1000),
t0 AS (
  SELECT doc_id, length(text) AS nc,
         string_split_regex(trim(text), ' +') AS toks
  FROM base),
m AS (
  SELECT doc_id,
         (len(toks) >= 20 AND len(toks) <= 90) AS r_word_count,
         (CAST(nc - len(toks) + 1 AS DOUBLE) / len(toks) >= 4.0
          AND CAST(nc - len(toks) + 1 AS DOUBLE) / len(toks) <= 10.0)
           AS r_word_len,
         (len(list_filter(toks,
            x -> x IN ('the', 'a', 'of', 'and', 'is', 'to'))) >= 2)
           AS r_stopword,
         (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) >= 0.35)
           AS r_repetition
  FROM t0),
p AS (
  SELECT base.doc_id, base.text, base.lang
  FROM base JOIN m USING (doc_id)
  WHERE m.r_word_count AND m.r_word_len AND m.r_stopword
    AND m.r_repetition),
t AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS toks FROM p),
s AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(toks) - 3, 0) + 2),
           i -> array_to_string(toks[i:i+2], ' '))) AS sh
  FROM t),
e AS (
  SELECT a.doc_id AS src, b.doc_id AS dst
  FROM s a, s b
  WHERE a.doc_id < b.doc_id
    AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
        >= 0.8),
sym AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
nodes AS (SELECT DISTINCT src AS id FROM sym),
reach(id, r) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT reach.id, sym.dst FROM reach JOIN sym ON sym.src = reach.r),
cc AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
q AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n FROM t),
best AS (
  SELECT id FROM (
    SELECT cc.id,
           row_number() OVER (PARTITION BY cc.component
                              ORDER BY q.n DESC, cc.id) AS rn
    FROM cc JOIN q ON q.doc_id = cc.id)
  WHERE rn = 1),
surv AS (
  SELECT p.* FROM p
  WHERE p.doc_id NOT IN (SELECT id FROM cc)
     OR p.doc_id IN (SELECT id FROM best)),
c AS (SELECT lang, count(*) AS n_docs FROM surv GROUP BY lang),
tot AS (SELECT list_reduce(
          list(sqrt(CAST(n_docs AS DOUBLE)) ORDER BY lang),
          (a, b) -> a + b) AS total FROM c),
tt AS (SELECT lang,
          CAST(floor(80.0 * sqrt(CAST(n_docs AS DOUBLE)) / total + 0.5)
               AS BIGINT) AS n_target
       FROM c, tot),
r AS (SELECT lang, doc_id,
          row_number() OVER (PARTITION BY lang
                             ORDER BY md5(text), doc_id) AS rn
      FROM surv)
SELECT r.lang, r.doc_id, CAST(rn AS BIGINT) AS sample_rank
FROM r JOIN tt ON r.lang = tt.lang
WHERE rn <= tt.n_target
ORDER BY r.lang, sample_rank"""

  /** q86 oracle: the q81 four-stage replay (Gopher rules →
    * brute-force near-dup pairs + recursive closure → longest-member
    * argmax → α=0.5 temperature sample) re-tailed to label EVERY
    * input doc with its decision and, for rule rejects, the first
    * failing rule in the q79 order. */
  val curationManifest: String = """
WITH RECURSIVE base AS (
  SELECT doc_id, text, lang FROM documents WHERE doc_id < 1000),
t0 AS (
  SELECT doc_id, length(text) AS nc,
         string_split_regex(trim(text), ' +') AS toks
  FROM base),
m AS (
  SELECT doc_id,
         (len(toks) >= 20 AND len(toks) <= 90) AS r_word_count,
         (CAST(nc - len(toks) + 1 AS DOUBLE) / len(toks) >= 4.0
          AND CAST(nc - len(toks) + 1 AS DOUBLE) / len(toks) <= 10.0)
           AS r_word_len,
         (len(list_filter(toks,
            x -> x IN ('the', 'a', 'of', 'and', 'is', 'to'))) >= 2)
           AS r_stopword,
         (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) >= 0.35)
           AS r_repetition
  FROM t0),
p AS (
  SELECT base.doc_id, base.text, base.lang
  FROM base JOIN m USING (doc_id)
  WHERE m.r_word_count AND m.r_word_len AND m.r_stopword
    AND m.r_repetition),
t AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS toks FROM p),
s AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(toks) - 3, 0) + 2),
           i -> array_to_string(toks[i:i+2], ' '))) AS sh
  FROM t),
e AS (
  SELECT a.doc_id AS src, b.doc_id AS dst
  FROM s a, s b
  WHERE a.doc_id < b.doc_id
    AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
        >= 0.8),
sym AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
nodes AS (SELECT DISTINCT src AS id FROM sym),
reach(id, r) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT reach.id, sym.dst FROM reach JOIN sym ON sym.src = reach.r),
cc AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
q AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n FROM t),
best AS (
  SELECT id FROM (
    SELECT cc.id,
           row_number() OVER (PARTITION BY cc.component
                              ORDER BY q.n DESC, cc.id) AS rn
    FROM cc JOIN q ON q.doc_id = cc.id)
  WHERE rn = 1),
surv AS (
  SELECT p.* FROM p
  WHERE p.doc_id NOT IN (SELECT id FROM cc)
     OR p.doc_id IN (SELECT id FROM best)),
c AS (SELECT lang, count(*) AS n_docs FROM surv GROUP BY lang),
tot AS (SELECT list_reduce(
          list(sqrt(CAST(n_docs AS DOUBLE)) ORDER BY lang),
          (a, b) -> a + b) AS total FROM c),
tt AS (SELECT lang,
          CAST(floor(80.0 * sqrt(CAST(n_docs AS DOUBLE)) / total + 0.5)
               AS BIGINT) AS n_target
       FROM c, tot),
r AS (SELECT lang, doc_id,
          row_number() OVER (PARTITION BY lang
                             ORDER BY md5(text), doc_id) AS rn
      FROM surv),
samp AS (
  SELECT r.doc_id, CAST(rn AS BIGINT) AS sample_rank
  FROM r JOIN tt ON r.lang = tt.lang
  WHERE rn <= tt.n_target)
SELECT base.doc_id, base.lang,
       CASE WHEN NOT (m.r_word_count AND m.r_word_len AND m.r_stopword
                      AND m.r_repetition) THEN 'rejected_rule'
            WHEN base.doc_id IN (SELECT id FROM cc)
                 AND base.doc_id NOT IN (SELECT id FROM best)
              THEN 'near_dup'
            WHEN samp.doc_id IS NULL THEN 'sampled_out'
            ELSE 'kept' END AS decision,
       CASE WHEN NOT m.r_word_count THEN 'word_count'
            WHEN NOT m.r_word_len THEN 'word_len'
            WHEN NOT m.r_stopword THEN 'stopword'
            WHEN NOT m.r_repetition THEN 'repetition' END AS reason,
       samp.sample_rank
FROM base JOIN m USING (doc_id)
LEFT JOIN samp ON samp.doc_id = base.doc_id
ORDER BY base.doc_id"""

  /** q82 oracle: sign-bit binary ANN replayed end-to-end. The word is
    * bits 0..62 via `1::BIGINT << i` OR-folded (a 1<<63 shift raises
    * in DuckDB) plus the min-long constant for the sign bit —
    * bit-identical to Quantize.signPack. Hamming prefilter (top-400 by
    * bit_count of the XOR, ties → corpus_id) then EXACT cosine
    * re-rank, all integer/IEEE-deterministic. Specialized to the
    * 64-dim corpus (one word); the Spark side is word-count generic. */
  val hammingAnn: String = """
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
w AS (
  SELECT vec_id, e,
         list_reduce(list_transform(range(0, 63), i ->
             CASE WHEN e[CAST(i AS INT) + 1] > 0
                  THEN (1::BIGINT << CAST(i AS INT)) ELSE 0::BIGINT END),
           (a, b) -> a | b)
         | CASE WHEN e[64] > 0 THEN (-9223372036854775808)::BIGINT
                ELSE 0::BIGINT END AS word
  FROM v),
q AS (SELECT * FROM w WHERE vec_id < 50),
h AS (
  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
         bit_count(xor(q.word, c.word)) AS hamming, q.e AS qe, c.e AS ce
  FROM q, w c WHERE c.vec_id <> q.vec_id),
cand AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY hamming, corpus_id) AS hrank
  FROM h),
rr AS (
  SELECT query_id, corpus_id, CAST(hamming AS INT) AS hamming,
         list_dot_product(qe, ce)
           / (sqrt(list_dot_product(qe, qe))
              * sqrt(list_dot_product(ce, ce))) AS cosine_sim
  FROM cand WHERE hrank <= 400),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine_sim DESC, corpus_id) AS "rank"
  FROM rr)
SELECT query_id, CAST("rank" AS INT) AS "rank", corpus_id, hamming,
       cosine_sim
FROM ranked WHERE "rank" <= 10 ORDER BY query_id, "rank""""

  /** q103 oracle: kNN label propagation replayed — the q82 Hamming+
    * exact-rerank machinery on the even/odd seed/query split, then
    * majority vote with the (n_votes desc, label asc) winner rule. */
  val knnLabel: String = """
WITH v AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
  FROM embeddings),
w AS (
  SELECT vec_id, e,
         list_reduce(list_transform(range(0, 63), i ->
             CASE WHEN e[CAST(i AS INT) + 1] > 0
                  THEN (1::BIGINT << CAST(i AS INT)) ELSE 0::BIGINT END),
           (a, b) -> a | b)
         | CASE WHEN e[64] > 0 THEN (-9223372036854775808)::BIGINT
                ELSE 0::BIGINT END AS word
  FROM v),
c AS (SELECT * FROM w WHERE vec_id % 2 = 0),
q AS (SELECT * FROM w WHERE vec_id % 2 = 1 AND vec_id < 400),
h AS (
  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
         bit_count(xor(q.word, c.word)) AS hamming, q.e AS qe, c.e AS ce
  FROM q, c WHERE c.vec_id <> q.vec_id),
cand AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY hamming, corpus_id) AS hrank
  FROM h),
rr AS (
  SELECT query_id, corpus_id,
         list_dot_product(qe, ce)
           / (sqrt(list_dot_product(qe, qe))
              * sqrt(list_dot_product(ce, ce))) AS cosine_sim
  FROM cand WHERE hrank <= 50),
ranked AS (
  SELECT query_id, corpus_id, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine_sim DESC, corpus_id) AS rk
  FROM rr),
votes AS (
  SELECT r.query_id, CAST(lv.label AS BIGINT) AS lbl,
         count(*) AS n_votes
  FROM ranked r JOIN v lv ON lv.vec_id = r.corpus_id
  WHERE r.rk <= 5 GROUP BY 1, 2),
wnr AS (
  SELECT query_id, lbl, n_votes, row_number() OVER (
    PARTITION BY query_id ORDER BY n_votes DESC, lbl) AS rk
  FROM votes)
SELECT query_id AS vec_id, lbl AS label_pred,
       CAST(n_votes AS BIGINT) AS n_votes
FROM wnr WHERE rk = 1 ORDER BY vec_id"""

  /** q161 oracle: label-error detection replayed — the q103 Hamming+
    * exact-rerank kNN machinery with the FULL labeled pool as corpus
    * (self excluded), majority winner (n_votes desc, label asc), plus
    * the own-label vote count and the flagged comparison. */
  val labelErrors: String = """
WITH v AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
  FROM embeddings),
w AS (
  SELECT vec_id, e,
         list_reduce(list_transform(range(0, 63), i ->
             CASE WHEN e[CAST(i AS INT) + 1] > 0
                  THEN (1::BIGINT << CAST(i AS INT)) ELSE 0::BIGINT END),
           (a, b) -> a | b)
         | CASE WHEN e[64] > 0 THEN (-9223372036854775808)::BIGINT
                ELSE 0::BIGINT END AS word
  FROM v),
q AS (SELECT * FROM w WHERE vec_id < 400),
h AS (
  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
         bit_count(xor(q.word, c.word)) AS hamming, q.e AS qe, c.e AS ce
  FROM q, w c WHERE c.vec_id <> q.vec_id),
cand AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY hamming, corpus_id) AS hrank
  FROM h),
rr AS (
  SELECT query_id, corpus_id,
         list_dot_product(qe, ce)
           / (sqrt(list_dot_product(qe, qe))
              * sqrt(list_dot_product(ce, ce))) AS cosine_sim
  FROM cand WHERE hrank <= 50),
ranked AS (
  SELECT query_id, corpus_id, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine_sim DESC, corpus_id) AS rk
  FROM rr),
votes AS (
  SELECT r.query_id, CAST(lv.label AS BIGINT) AS lbl,
         count(*) AS n_votes
  FROM ranked r JOIN v lv ON lv.vec_id = r.corpus_id
  WHERE r.rk <= 5 GROUP BY 1, 2),
wnr AS (
  SELECT query_id, lbl, n_votes, row_number() OVER (
    PARTITION BY query_id ORDER BY n_votes DESC, lbl) AS rk
  FROM votes)
SELECT q.vec_id, CAST(q2.label AS BIGINT) AS label,
       wnr.lbl AS label_pred, CAST(wnr.n_votes AS BIGINT) AS n_votes,
       CAST(coalesce(ov.n_votes, 0) AS BIGINT) AS own_votes,
       (wnr.lbl <> CAST(q2.label AS BIGINT)) AS flagged
FROM q JOIN v q2 ON q2.vec_id = q.vec_id
JOIN wnr ON wnr.query_id = q.vec_id AND wnr.rk = 1
LEFT JOIN votes ov ON ov.query_id = q.vec_id
  AND ov.lbl = CAST(q2.label AS BIGINT)
ORDER BY q.vec_id"""

  /** q83 oracle: per-language centroid outlier scores replayed — the
    * same fixed-point quantization (floor(x·2^20 + 0.5), exact
    * order-independent integer sums) and the same two fixed-order
    * double divisions, then the sequential-fold cosine both engines
    * share (list_dot_product ≡ the codegen'd DotProduct fold). */
  val centroidOutlier: String = """
WITH d AS (
  SELECT doc.lang, doc.doc_id, CAST(em.embedding AS DOUBLE[]) AS e
  FROM documents doc JOIN embeddings em ON em.vec_id = doc.doc_id),
x AS (
  SELECT lang, p.pos AS pos,
         CAST(floor(e[p.pos] * 1048576.0 + 0.5) AS BIGINT) AS qv
  FROM d, range(1, 65) p(pos)),
s AS (SELECT lang, pos, sum(qv) AS sq, count(*) AS n
      FROM x GROUP BY 1, 2),
c AS (SELECT lang,
             list(CAST(sq AS DOUBLE) / 1048576.0 / CAST(n AS DOUBLE)
                  ORDER BY pos) AS centroid
      FROM s GROUP BY 1),
sc AS (
  SELECT d.doc_id, d.lang,
         list_dot_product(d.e, c.centroid)
           / (sqrt(list_dot_product(d.e, d.e))
              * sqrt(list_dot_product(c.centroid, c.centroid)))
           AS centroid_sim
  FROM d JOIN c USING (lang))
SELECT doc_id, lang, centroid_sim,
       CAST(row_number() OVER (
         PARTITION BY lang ORDER BY centroid_sim, doc_id) AS INT)
         AS lang_rank
FROM sc ORDER BY doc_id"""

  /** q85 oracle: the ANN recall report replayed end-to-end — exact
    * cosine top-5 (the cosineTopK formulation), the q82 binary index
    * (sign words → Hamming top-200 → exact cosine re-rank top-5), and
    * the per-query overlap count; one IEEE division for the recall
    * fraction. */
  val annRecall: String = """
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
q AS (SELECT * FROM v WHERE vec_id < 50),
exact_scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
         list_dot_product(q.e, c.e)
           / (sqrt(list_dot_product(q.e, q.e))
              * sqrt(list_dot_product(c.e, c.e))) AS cosine_sim
  FROM q, v c WHERE c.vec_id <> q.vec_id),
exact_top AS (
  SELECT query_id, corpus_id FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cosine_sim DESC, corpus_id) AS r
    FROM exact_scored) WHERE r <= 5),
w AS (
  SELECT vec_id, e,
         list_reduce(list_transform(range(0, 63), i ->
             CASE WHEN e[CAST(i AS INT) + 1] > 0
                  THEN (1::BIGINT << CAST(i AS INT)) ELSE 0::BIGINT END),
           (a, b) -> a | b)
         | CASE WHEN e[64] > 0 THEN (-9223372036854775808)::BIGINT
                ELSE 0::BIGINT END AS word
  FROM v),
qw AS (SELECT * FROM w WHERE vec_id < 50),
h AS (
  SELECT qw.vec_id AS query_id, c.vec_id AS corpus_id,
         bit_count(xor(qw.word, c.word)) AS hamming, qw.e AS qe, c.e AS ce
  FROM qw, w c WHERE c.vec_id <> qw.vec_id),
cand AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY hamming, corpus_id) AS hrank
  FROM h),
rr AS (
  SELECT query_id, corpus_id,
         list_dot_product(qe, ce)
           / (sqrt(list_dot_product(qe, qe))
              * sqrt(list_dot_product(ce, ce))) AS cosine_sim
  FROM cand WHERE hrank <= 400),
approx_top AS (
  SELECT query_id, corpus_id FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cosine_sim DESC, corpus_id) AS r
    FROM rr) WHERE r <= 5),
hits AS (
  SELECT e.query_id, count(*) AS n_hit
  FROM exact_top e JOIN approx_top a
    ON a.query_id = e.query_id AND a.corpus_id = e.corpus_id
  GROUP BY 1)
SELECT q.vec_id AS query_id,
       CAST(coalesce(hits.n_hit, 0) AS BIGINT) AS n_hit,
       CAST(coalesce(hits.n_hit, 0) AS DOUBLE) / 5e0 AS recall
FROM q LEFT JOIN hits ON hits.query_id = q.vec_id
ORDER BY query_id"""

  /** q84 oracle: the dedup-audit histogram — the q66 brute-force
    * pairs + recursive-closure replay, aggregated into the
    * cluster-size histogram plus the singleton bucket. */
  val dedupAudit: String = """
WITH RECURSIVE t AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
  FROM documents WHERE doc_id < 1000),
s AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(toks) - 3, 0) + 2),
           i -> array_to_string(toks[i:i+2], ' '))) AS sh
  FROM t),
e AS (
  SELECT a.doc_id AS src, b.doc_id AS dst
  FROM s a, s b
  WHERE a.doc_id < b.doc_id
    AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
        >= 0.8),
sym AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
nodes AS (SELECT DISTINCT src AS id FROM sym),
reach(id, r) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT reach.id, sym.dst FROM reach JOIN sym ON sym.src = reach.r),
cc AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
sizes AS (SELECT component, count(*) AS cluster_size FROM cc GROUP BY 1),
hist AS (SELECT cluster_size, count(*) AS n_clusters
         FROM sizes GROUP BY 1),
singles AS (
  SELECT 1::BIGINT AS cluster_size, count(*) AS n_clusters
  FROM t WHERE doc_id NOT IN (SELECT id FROM cc)),
u AS (SELECT * FROM hist UNION ALL
      SELECT * FROM singles WHERE n_clusters > 0),
m AS (SELECT cluster_size, sum(n_clusters) AS n_clusters
      FROM u GROUP BY 1)
SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
       CAST(n_clusters AS BIGINT) AS n_clusters,
       CAST(cluster_size * n_clusters AS BIGINT) AS n_docs,
       CAST((cluster_size - 1) * n_clusters AS BIGINT) AS n_dropped
FROM m ORDER BY cluster_size"""

  /** Unrolled deterministic spherical k-means as DuckDB CTEs —
    * replays [[graft.ops.Cluster.kmeansAssign]] exactly: seeds = k
    * lowest-id vectors, argmax-cosine assignment with ties to the
    * lowest cluster id (QUALIFY row_number), fixed-point 2^20
    * centroid means (integer sums are order-independent, so the only
    * double roundings are the same divisions Spark performs), empty
    * cells keep their previous centroid. `vBody` supplies the corpus
    * CTE body so callers can inject near-dups. Ends with `fin` =
    * (vec_id, e, cluster, sim) under the final centroids. `dim` is
    * the vector length (the mean unroll ranges over it); `prefix`
    * namespaces every CTE so several fits coexist in one query (the
    * q134 per-subspace PQ codebooks). */
  private def kmeansCtes(k: Int, iters: Int, vBody: String,
                         dim: Int = 64, prefix: String = ""): String = {
    val p = prefix
    val cos = (v: String, c: String) =>
      s"""list_dot_product($v, $c)
           / (sqrt(list_dot_product($v, $v))
              * sqrt(list_dot_product($c, $c)))"""
    val sb = new StringBuilder
    sb ++= s"""${p}v AS ($vBody),
${p}c0 AS (SELECT vec_id AS cluster, e AS c FROM ${p}v ORDER BY vec_id LIMIT $k),
"""
    for (i <- 1 to iters) {
      sb ++= s"""${p}a$i AS (
  SELECT v.vec_id, v.e, c.cluster,
         ${cos("v.e", "c.c")} AS sim
  FROM ${p}v v, ${p}c${i - 1} c
  QUALIFY row_number() OVER (PARTITION BY v.vec_id
                             ORDER BY sim DESC, c.cluster) = 1),
${p}s$i AS (
  SELECT cluster, p.pos,
         sum(CAST(floor(e[p.pos] * 1048576.0 + 0.5) AS BIGINT)) AS sq,
         count(*) AS n
  FROM ${p}a$i, range(1, ${dim + 1}) p(pos) GROUP BY 1, 2),
${p}m$i AS (
  SELECT cluster,
         list(CAST(sq AS DOUBLE) / 1048576.0 / CAST(n AS DOUBLE)
              ORDER BY pos) AS c
  FROM ${p}s$i GROUP BY 1),
${p}c$i AS (
  SELECT c.cluster, coalesce(m.c, c.c) AS c
  FROM ${p}c${i - 1} c LEFT JOIN ${p}m$i m USING (cluster)),
"""
    }
    sb ++= s"""${p}fin AS (
  SELECT v.vec_id, v.e, c.cluster,
         ${cos("v.e", "c.c")} AS sim
  FROM ${p}v v, ${p}c$iters c
  QUALIFY row_number() OVER (PARTITION BY v.vec_id
                             ORDER BY sim DESC, c.cluster) = 1)"""
    sb.toString
  }

  /** q116 oracle: cluster topic terms — the kmeans CTEs label docs,
    * then the q74 tf·N/df ranking runs with cluster as the grouping
    * id. */
  val clusterTerms: String = "WITH " + kmeansCtes(8, 2, """
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings""") + """,
d AS (
  SELECT fin.cluster, doc.text
  FROM documents doc JOIN fin ON fin.vec_id = doc.doc_id),
tf AS (
  SELECT cluster, word AS term, count(*) AS tf
  FROM (SELECT cluster,
               UNNEST(string_split_regex(trim(text), ' +')) AS word
        FROM d)
  GROUP BY cluster, word),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM d),
scored AS (
  SELECT tf.cluster, tf.term, tf.tf, df.df,
         CAST(tf.tf AS DOUBLE) * n.n_docs / df.df AS score
  FROM tf JOIN df ON tf.term = df.term, n),
ranked AS (
  SELECT cluster, term, tf, df, score,
         row_number() OVER (PARTITION BY cluster
                            ORDER BY score DESC, term) AS rank
  FROM scored)
SELECT cluster, CAST(rank AS BIGINT) AS rank, term, tf, df, score
FROM ranked WHERE rank <= 10 ORDER BY cluster, rank"""

  /** q87 oracle: 3-iteration k-means on the bounded corpus. */
  /** q128 oracle: learned-quantizer IVF replayed END TO END — the
    * k-means fit (seeds, fixed-point means, argmax ties — the q87
    * CTEs at 32×2), per-query probe ranking by dot/|c| (query norm
    * is a per-query constant, so the order equals cosine order; ties
    * to the lower cluster id), the cell candidate join, and the
    * exact cosine re-rank with the q28 tail. */
  val ivfKmeans: String = "WITH " + kmeansCtes(32, 2,
    """
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings""") + """,
qs AS (SELECT vec_id, e FROM v WHERE vec_id < 50),
probes AS (
  SELECT query_id, cell FROM (
    SELECT q.vec_id AS query_id, c.cluster AS cell,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY list_dot_product(q.e, c.c)
                        / sqrt(list_dot_product(c.c, c.c)) DESC,
                      c.cluster) AS rn
    FROM qs q, c2 c)
  WHERE rn <= 16),
cand AS (
  SELECT DISTINCT p.query_id, f.vec_id AS corpus_id
  FROM probes p JOIN fin f ON f.cluster = p.cell
  WHERE f.vec_id <> p.query_id),
scored AS (
  SELECT cand.query_id, cand.corpus_id,
         list_dot_product(q.e, c.e)
           / (sqrt(list_dot_product(q.e, q.e))
              * sqrt(list_dot_product(c.e, c.e))) AS cosine_sim
  FROM cand
  JOIN v q ON q.vec_id = cand.query_id
  JOIN v c ON c.vec_id = cand.corpus_id),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine_sim DESC, corpus_id) AS "rank"
  FROM scored)
SELECT query_id, CAST("rank" AS INTEGER) AS "rank", corpus_id, cosine_sim
FROM ranked WHERE "rank" <= 5
ORDER BY query_id, "rank""""

  /** q134 oracle: product-quantization top-k replayed END TO END —
    * eight independent 16×2 k-means fits on 8-dim vector slices (the
    * prefixed CTE sets), corpus encoding = each fit's own final
    * assignment, reconstructed norms over the selected codewords,
    * the left-associative 8-term ADC sum per (query, corpus) pair,
    * the top-`rerank` ADC cut by (approx desc, corpus_id), and the
    * exact q28 tail. */
  val pqTopK: String = {
    val m = 8; val sub = 8; val codes = 16; val rerank = 400
    val subs = (0 until m).map { j =>
      kmeansCtes(codes, 2,
        s"\n  SELECT vec_id, e[${j * sub + 1}:${(j + 1) * sub}] AS e FROM vz",
        dim = sub, prefix = s"p$j")
    }
    val finJoins = (1 until m)
      .map(j => s"  JOIN p${j}fin f$j USING (vec_id)").mkString("\n")
    val bookJoins = (0 until m)
      .map(j => s"  JOIN p${j}c2 b$j ON b$j.cluster = f$j.cluster")
      .mkString("\n")
    val ws = (0 until m).map(j => s"b$j.c AS w$j").mkString(", ")
    val wList = (0 until m).map(j => s"w$j").mkString(", ")
    val normSum = (0 until m).map(j => s"list_dot_product(w$j, w$j)")
      .reduceLeft((a, b) => s"($a + $b)")
    val adcSum = (0 until m).map(j =>
        s"list_dot_product(q.e[${j * sub + 1}:${(j + 1) * sub}], r.w$j)")
      .reduceLeft((a, b) => s"($a\n            + $b)")
    s"""WITH vz AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
""" + subs.mkString(",\n") + s""",
enc AS (
  SELECT f0.vec_id, $ws
  FROM p0fin f0
$finJoins
$bookJoins),
rn AS (
  SELECT vec_id, $wList,
         sqrt($normSum) AS rnorm
  FROM enc),
qs AS (SELECT vec_id, e FROM vz WHERE vec_id < 50),
adc AS (
  SELECT q.vec_id AS query_id, r.vec_id AS corpus_id,
         ($adcSum)
           / (sqrt(list_dot_product(q.e, q.e)) * r.rnorm) AS approx
  FROM qs q, rn r
  WHERE r.vec_id <> q.vec_id),
cand AS (
  SELECT query_id, corpus_id FROM (
    SELECT query_id, corpus_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY approx DESC, corpus_id) AS rr
    FROM adc) WHERE rr <= $rerank),
scored AS (
  SELECT cand.query_id, cand.corpus_id,
         list_dot_product(q.e, c.e)
           / (sqrt(list_dot_product(q.e, q.e))
              * sqrt(list_dot_product(c.e, c.e))) AS cosine_sim
  FROM cand
  JOIN vz q ON q.vec_id = cand.query_id
  JOIN vz c ON c.vec_id = cand.corpus_id),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine_sim DESC, corpus_id) AS "rank"
  FROM scored)
SELECT query_id, CAST("rank" AS INTEGER) AS "rank", corpus_id, cosine_sim
FROM ranked WHERE "rank" <= 5
ORDER BY query_id, "rank""""
  }

  val kmeans: String = "WITH " + kmeansCtes(8, 3,
    """
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
  WHERE vec_id < 2000""") + """
SELECT vec_id, CAST(cluster AS BIGINT) AS cluster, sim AS centroid_sim
FROM fin ORDER BY vec_id"""

  /** q88 oracle: SemDeDup — the q56 near-dup-injected corpus (the
    * natural embeddings have no cos≥0.9 pair), 2-iteration k-means
    * cells, then the cosineDedup drop rule restricted to same-cell
    * pairs. */
  val semDedup: String = """WITH b AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
  WHERE vec_id < 2000),
""" + kmeansCtes(8, 2, """
  SELECT * FROM b
  UNION ALL
  SELECT vec_id + 100000, list_transform(e, x -> x * 1.25) FROM b
  WHERE vec_id % 5 = 0""") + """,
dup AS (
  SELECT DISTINCT b2.vec_id
  FROM fin a JOIN fin b2
    ON a.cluster = b2.cluster AND a.vec_id < b2.vec_id
  WHERE list_dot_product(a.e, b2.e)
          / (sqrt(list_dot_product(a.e, a.e))
             * sqrt(list_dot_product(b2.e, b2.e))) >= 0.9)
SELECT vec_id, CAST(cluster AS BIGINT) AS cluster FROM fin
WHERE vec_id NOT IN (SELECT vec_id FROM dup)
ORDER BY vec_id"""

  /** q89 oracle: the fixed-weight linear quality classifier — the
    * score expression is written token-for-token as the Spark column
    * tree (left-associative), so every IEEE rounding matches; the
    * squash is the rational sigmoid, no transcendentals. */
  val qualityClassifier: String = """
WITH t AS (
  SELECT doc_id, text,
         string_split_regex(trim(text), ' +') AS toks
  FROM documents),
f AS (
  SELECT doc_id,
         CAST(len(toks) AS DOUBLE) AS n_tok,
         CAST(len(list_filter(toks,
           x -> x IN ('the', 'a', 'of', 'and', 'is', 'to')))
           AS DOUBLE) AS n_stop,
         CAST(len(list_distinct(toks)) AS DOUBLE) AS n_dist,
         CAST(length(text) - (len(toks) - 1) AS DOUBLE) AS word_chars
  FROM t),
s AS (
  SELECT doc_id,
         -3.5 + 8.0 * (n_stop / n_tok) - 0.25 * (word_chars / n_tok)
           + 2.0 * (n_dist / n_tok) + 0.5 * (n_tok / 100.0) AS clf_score
  FROM f)
SELECT doc_id, clf_score,
       (clf_score / (1.0 + abs(clf_score)) + 1.0) * 0.5 AS clf_prob,
       CASE WHEN clf_score >= 0.0 THEN 'keep' ELSE 'drop' END AS label
FROM s ORDER BY doc_id"""

  /** q163 oracle: term-distribution drift replayed — BIGINT counts,
    * HUGEINT cross-products |c_old·N_new − c_new·N_old| (≡ Spark's
    * decimal(38,0) — the ranking is exact-integer in both engines),
    * and the two output-boundary IEEE divisions in the same
    * left-associative order. */
  val termDrift: String = """
WITH ta AS (
  SELECT unnest(string_split_regex(trim(text), ' +')) AS term
  FROM documents),
tb AS (
  SELECT unnest(string_split_regex(trim(text), ' +')) AS term
  FROM documents WHERE source <> 'src0'),
ca AS (SELECT term, count(*) AS c_old FROM ta GROUP BY 1),
cb AS (SELECT term, count(*) AS c_new FROM tb GROUP BY 1),
j AS (
  SELECT coalesce(ca.term, cb.term) AS term,
         coalesce(c_old, 0) AS c_old, coalesce(c_new, 0) AS c_new
  FROM ca FULL OUTER JOIN cb ON cb.term = ca.term),
n AS (SELECT sum(c_old) AS n_old, sum(c_new) AS n_new FROM j),
x AS (
  SELECT term, c_old, c_new,
         abs(c_old * n_new - c_new * n_old) AS l1,
         CASE WHEN c_new * n_old > c_old * n_new THEN 'up'
              WHEN c_new * n_old < c_old * n_new THEN 'down'
              ELSE 'flat' END AS direction
  FROM j, n),
tot AS (SELECT sum(l1) AS t FROM x),
r AS (SELECT *, row_number() OVER (ORDER BY l1 DESC, term)
        AS drift_rank FROM x)
SELECT term, CAST(c_old AS BIGINT) AS c_old,
       CAST(c_new AS BIGINT) AS c_new, direction,
       CAST(drift_rank AS BIGINT) AS drift_rank,
       CAST(l1 AS DOUBLE)
         / (2.0 * CAST(n.n_old AS DOUBLE) * CAST(n.n_new AS DOUBLE))
         AS tv_contrib,
       CAST(tot.t AS DOUBLE)
         / (2.0 * CAST(n.n_old AS DOUBLE) * CAST(n.n_new AS DOUBLE))
         AS tv_total
FROM r, n, tot WHERE drift_rank <= 50 ORDER BY drift_rank"""

  /** q164 oracle: per-source quantile normalization replayed — the
    * q89 score tree verbatim, percent_rank over the same unique
    * (score, id) order, and the ≥ 0.2 keep gate. */
  val scoreNormalize: String = """
WITH t AS (
  SELECT doc_id, source, text,
         string_split_regex(trim(text), ' +') AS toks
  FROM documents),
f AS (
  SELECT doc_id, source,
         CAST(len(toks) AS DOUBLE) AS n_tok,
         CAST(len(list_filter(toks,
           x -> x IN ('the', 'a', 'of', 'and', 'is', 'to')))
           AS DOUBLE) AS n_stop,
         CAST(len(list_distinct(toks)) AS DOUBLE) AS n_dist,
         CAST(length(text) - (len(toks) - 1) AS DOUBLE) AS word_chars
  FROM t),
s AS (
  SELECT doc_id, source,
         -3.5 + 8.0 * (n_stop / n_tok) - 0.25 * (word_chars / n_tok)
           + 2.0 * (n_dist / n_tok) + 0.5 * (n_tok / 100.0) AS clf_score
  FROM f),
p AS (
  SELECT doc_id, source,
         (clf_score / (1.0 + abs(clf_score)) + 1.0) * 0.5 AS clf_prob
  FROM s)
SELECT doc_id, source, clf_prob,
       percent_rank() OVER (PARTITION BY source
         ORDER BY clf_prob, doc_id) AS pct_rank,
       (count(*) OVER (PARTITION BY source) = 1
        OR percent_rank() OVER (PARTITION BY source
             ORDER BY clf_prob, doc_id) >= 0.2) AS keep
FROM p ORDER BY doc_id"""

  /** q165 oracle: exact stratified split replayed — per-stratum
    * counts, identical independent floor(n·f + 0.5) targets summed
    * into cumulative BIGINT bounds, the same salted md5 rank order,
    * first-matching-bound split decision. */
  val stratifiedSplit: String = """
WITH n AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
r AS (
  SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
    ORDER BY md5(concat('strat', ':', CAST(doc_id AS VARCHAR))), doc_id)
    AS rn
  FROM documents),
t AS (
  SELECT lang, n,
         CAST(floor(0.1 * CAST(n AS DOUBLE) + 0.5) AS BIGINT) AS t_test,
         CAST(floor(0.1 * CAST(n AS DOUBLE) + 0.5) AS BIGINT) AS t_val
  FROM n)
SELECT r.doc_id, r.lang,
       CASE WHEN rn <= least(t_test, n) THEN 'test'
            WHEN rn <= least(t_test + t_val, n) THEN 'val'
            ELSE 'train' END AS split,
       CAST(rn AS BIGINT) AS strat_rank
FROM r JOIN t ON r.lang IS NOT DISTINCT FROM t.lang
ORDER BY r.doc_id"""

  /** q166 oracle: curation v3 replayed stage by stage — the q89
    * score tree + q164's per-source percent_rank gate, the q165
    * stratified carving RE-RANKED over the survivors, then the q160
    * epoch arithmetic over the train partition with budget =
    * |train| (maxEpochs 2). Decision + epoch multiplicity per doc. */
  val curationV3: String = """
WITH t AS (
  SELECT doc_id, source, lang, text,
         string_split_regex(trim(text), ' +') AS toks
  FROM documents),
f AS (
  SELECT doc_id, source, lang,
         CAST(len(toks) AS DOUBLE) AS n_tok,
         CAST(len(list_filter(toks,
           x -> x IN ('the', 'a', 'of', 'and', 'is', 'to')))
           AS DOUBLE) AS n_stop,
         CAST(len(list_distinct(toks)) AS DOUBLE) AS n_dist,
         CAST(length(text) - (len(toks) - 1) AS DOUBLE) AS word_chars
  FROM t),
s AS (
  SELECT doc_id, source, lang,
         -3.5 + 8.0 * (n_stop / n_tok) - 0.25 * (word_chars / n_tok)
           + 2.0 * (n_dist / n_tok) + 0.5 * (n_tok / 100.0) AS clf_score
  FROM f),
k AS (
  SELECT doc_id, source, lang,
         (count(*) OVER (PARTITION BY source) = 1
          OR percent_rank() OVER (PARTITION BY source
               ORDER BY (clf_score / (1.0 + abs(clf_score)) + 1.0) * 0.5,
                 doc_id) >= 0.2) AS keep
  FROM s),
ke AS (SELECT doc_id, source, lang FROM k WHERE keep),
sn AS (SELECT lang, count(*) AS n FROM ke GROUP BY 1),
sr AS (
  SELECT doc_id, source, lang, row_number() OVER (PARTITION BY lang
    ORDER BY md5(concat('strat', ':', CAST(doc_id AS VARCHAR))), doc_id)
    AS rn
  FROM ke),
stt AS (
  SELECT lang, n,
         CAST(floor(0.1 * CAST(n AS DOUBLE) + 0.5) AS BIGINT) AS t_test,
         CAST(floor(0.1 * CAST(n AS DOUBLE) + 0.5) AS BIGINT) AS t_val
  FROM sn),
sp AS (
  SELECT sr.doc_id, sr.source, sr.lang,
         CASE WHEN rn <= least(t_test, n) THEN 'test'
              WHEN rn <= least(t_test + t_val, n) THEN 'val'
              ELSE 'train' END AS split
  FROM sr JOIN stt ON sr.lang IS NOT DISTINCT FROM stt.lang),
tr AS (SELECT doc_id, source FROM sp WHERE split = 'train'),
b AS (SELECT CAST(count(*) AS DOUBLE) AS budget FROM tr),
inv AS (SELECT source, count(*) AS n FROM tr
        GROUP BY 1 HAVING source IN ('src0', 'src1', 'src2')),
tt AS (
  SELECT source, n,
         least(CAST(floor(budget * CASE source WHEN 'src0' THEN 0.22
                 WHEN 'src1' THEN 0.06 WHEN 'src2' THEN 0.02
                 END + 0.5) AS BIGINT), 2 * n) AS tgt
  FROM inv, b),
ff AS (SELECT source, tgt // n AS ful, tgt % n AS rem FROM tt),
er AS (
  SELECT doc_id, source, row_number() OVER (PARTITION BY source
    ORDER BY md5(concat('epoch', ':', CAST(doc_id AS VARCHAR))), doc_id)
    AS rn
  FROM tr WHERE source IN ('src0', 'src1', 'src2')),
ne AS (
  SELECT er.doc_id,
         ful + CASE WHEN rn <= rem THEN 1 ELSE 0 END AS n_ep
  FROM er JOIN ff USING (source))
SELECT k.doc_id, k.source, k.lang,
       CASE WHEN NOT k.keep THEN 'dropped_quality'
            ELSE sp.split END AS decision,
       CAST(coalesce(ne.n_ep, 0) AS BIGINT) AS n_epochs
FROM k LEFT JOIN sp ON sp.doc_id = k.doc_id
LEFT JOIN ne ON ne.doc_id = k.doc_id
ORDER BY k.doc_id"""

  /** q132 oracle: token-budget selection replayed — the q89 score
    * tree verbatim, the same 1024-range score bucketing, cross-bucket
    * offsets from per-bucket totals, within-bucket (score desc, id)
    * cumsum, and the identical ≤-budget gate. HUGEINT window sums
    * cast back to BIGINT at the output boundary. */
  val budgetSelect: String = """
WITH t AS (
  SELECT doc_id, text,
         string_split_regex(trim(text), ' +') AS toks
  FROM documents),
f AS (
  SELECT doc_id,
         CAST(len(toks) AS DOUBLE) AS n_tok,
         CAST(len(list_filter(toks,
           x -> x IN ('the', 'a', 'of', 'and', 'is', 'to')))
           AS DOUBLE) AS n_stop,
         CAST(len(list_distinct(toks)) AS DOUBLE) AS n_dist,
         CAST(length(text) - (len(toks) - 1) AS DOUBLE) AS word_chars,
         CAST(len(toks) AS BIGINT) AS n_tokens
  FROM t),
s AS (
  SELECT doc_id, n_tokens,
         -3.5 + 8.0 * (n_stop / n_tok) - 0.25 * (word_chars / n_tok)
           + 2.0 * (n_dist / n_tok) + 0.5 * (n_tok / 100.0) AS clf_score
  FROM f),
sc AS (
  SELECT doc_id, n_tokens,
         (clf_score / (1.0 + abs(clf_score)) + 1.0) * 0.5 AS score
  FROM s),
b AS (
  SELECT doc_id, score, n_tokens,
         least(CAST(floor(score * 1024.0) AS BIGINT), 1023) AS bkt
  FROM sc),
bt AS (SELECT bkt, sum(n_tokens) AS btoks FROM b GROUP BY bkt),
o AS (
  SELECT bkt,
         coalesce(sum(btoks) OVER (ORDER BY bkt DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM bt),
c AS (
  SELECT b.doc_id, b.score, b.n_tokens,
         o.off + sum(b.n_tokens) OVER (PARTITION BY b.bkt
           ORDER BY b.score DESC, b.doc_id
           ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM b JOIN o USING (bkt))
SELECT doc_id, score, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM c WHERE cum_tokens <= 20000 ORDER BY cum_tokens"""

  /** q133 oracle: source vocabulary overlap replayed — distinct
    * (source, word), size cross for the complete matrix, shared-word
    * counts from the word join, one IEEE Jaccard division. */
  val sourceVocabOverlap: String = """
WITH v AS (
  SELECT DISTINCT source AS src,
         unnest(string_split_regex(trim(text), ' +')) AS word
  FROM documents),
sz AS (SELECT src, count(*) AS n FROM v GROUP BY src),
iv AS (
  SELECT a.src AS src_a, b.src AS src_b, count(*) AS n_common
  FROM v a JOIN v b ON a.word = b.word AND a.src < b.src
  GROUP BY 1, 2),
p AS (
  SELECT sa.src AS src_a, sb.src AS src_b, sa.n AS n_a, sb.n AS n_b
  FROM sz sa JOIN sz sb ON sa.src < sb.src)
SELECT p.src_a, p.src_b,
       CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST(coalesce(n_common, 0) AS BIGINT) AS n_common,
       CAST(coalesce(n_common, 0) AS DOUBLE)
         / (n_a + n_b - coalesce(n_common, 0)) AS jaccard
FROM p LEFT JOIN iv USING (src_a, src_b)
ORDER BY src_a, src_b"""

  /** q139 oracle: vocabulary coverage curve replayed — type counts,
    * the (cnt desc, word asc) global rank, 17 power-of-two vocab
    * sizes, covered token mass and one division per point. */
  val vocabCoverageCurve: String = """
WITH c AS (
  SELECT word AS w, count(*) AS cnt
  FROM (SELECT unnest(string_split_regex(trim(text), ' +')) AS word
        FROM documents)
  GROUP BY 1),
r AS (
  SELECT w, cnt,
         row_number() OVER (ORDER BY cnt DESC, w) AS rank
  FROM c),
tot AS (SELECT sum(cnt) AS total FROM c),
sizes AS (
  SELECT CAST(power(2, j) AS BIGINT) AS vocab_size
  FROM range(0, 17) s(j))
SELECT s.vocab_size,
       CAST(count(*) AS BIGINT) AS n_types,
       CAST(sum(r.cnt) AS BIGINT) AS tokens_covered,
       CAST(sum(r.cnt) AS DOUBLE) / CAST(tot.total AS DOUBLE)
         AS coverage
FROM sizes s JOIN r ON r.rank <= s.vocab_size, tot
GROUP BY s.vocab_size, tot.total
ORDER BY s.vocab_size"""

  /** q142 oracle: token-concentration (Herfindahl) replayed — the
    * identical in-row per-type counts, EXACT integer Σcᵢ² (BIGINT
    * fold seeded with 0, ≡ Spark's aggregate init since 0+x=x), and
    * one final IEEE division per ratio. τ=0.25 is binary-exact so
    * the DECIMAL→DOUBLE literal comparison cannot drift. */
  val tokenConcentration: String = """
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
  FROM documents),
c AS (
  SELECT doc_id, toks,
         list_transform(list_distinct(toks),
           tt -> len(list_filter(toks, x -> x = tt))) AS counts
  FROM t),
m AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
         CAST(list_reduce(
           list_prepend(CAST(0 AS BIGINT),
             list_transform(counts, x -> x * x)),
           (a, b) -> a + b) AS BIGINT) AS sum_sq,
         CAST(list_aggregate(counts, 'max') AS BIGINT) AS max_count
  FROM c)
SELECT doc_id, n_tokens, n_distinct, sum_sq, max_count,
       CAST(sum_sq AS DOUBLE) / CAST(n_tokens * n_tokens AS DOUBLE)
         AS concentration,
       CAST(max_count AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS top_frac,
       (CAST(sum_sq AS DOUBLE) / CAST(n_tokens * n_tokens AS DOUBLE))
         >= 0.25 AS repetitive
FROM m ORDER BY doc_id"""

  /** q143 oracle: per-source n-gram diversity replayed — the same
    * shingle windows (clamped trailing slice for docs shorter than
    * n), exact distinct/total counts, one division. */
  val ngramDiversity: String = {
    val perN = Seq(1, 2, 3).map { n =>
      s"""  SELECT source, $n AS n,
         unnest(list_transform(
           range(1, greatest(len(toks) - $n, 0) + 2),
           i -> array_to_string(toks[i:i+${n - 1}], ' '))) AS gram
  FROM t"""
    }.mkString("\n  UNION ALL\n")
    s"""
WITH t AS (
  SELECT source, string_split_regex(trim(text), ' +') AS toks
  FROM documents),
g AS (
$perN)
SELECT source, n,
       CAST(count(*) AS BIGINT) AS total_ngrams,
       CAST(count(DISTINCT gram) AS BIGINT) AS distinct_ngrams,
       CAST(count(DISTINCT gram) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         AS ttr
FROM g GROUP BY source, n ORDER BY source, n"""
  }

  /** q144 oracle: curriculum ordering replayed — the q89 probability
    * tree, a single global (score desc, id) row_number (the hash
    * match PROVES the engine's bucketed two-level rank ≡ this
    * window), integer `//` tier arithmetic, and the md5 within-stage
    * order key. */
  val curriculumOrder: String = """
WITH t AS (
  SELECT doc_id, text, string_split_regex(trim(text), ' +') AS toks
  FROM documents),
f AS (
  SELECT doc_id,
         CAST(len(toks) AS DOUBLE) AS n_tok,
         CAST(len(list_filter(toks,
           x -> x IN ('the', 'a', 'of', 'and', 'is', 'to')))
           AS DOUBLE) AS n_stop,
         CAST(len(list_distinct(toks)) AS DOUBLE) AS n_dist,
         CAST(length(text) - (len(toks) - 1) AS DOUBLE) AS word_chars
  FROM t),
s AS (
  SELECT doc_id,
         -3.5 + 8.0 * (n_stop / n_tok) - 0.25 * (word_chars / n_tok)
           + 2.0 * (n_dist / n_tok) + 0.5 * (n_tok / 100.0) AS clf_score
  FROM f),
sc AS (
  SELECT doc_id,
         (clf_score / (1.0 + abs(clf_score)) + 1.0) * 0.5 AS score
  FROM s),
r AS (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id) AS "rank"
  FROM sc),
nn AS (SELECT count(*) AS n FROM r),
st AS (
  SELECT r.doc_id, r.score, r."rank",
         ((r."rank" - 1) * 4) // nn.n AS stage
  FROM r, nn)
SELECT doc_id, score, CAST("rank" AS BIGINT) AS "rank",
       CAST(stage AS BIGINT) AS stage,
       md5(concat_ws(':', 'curriculum:0:graft',
         CAST(stage AS VARCHAR), CAST(doc_id AS VARCHAR))) AS order_key
FROM st ORDER BY stage, order_key, doc_id"""

  /** q140 oracle: label-relevance retrieval metrics replayed — the
    * q28 exact cosine top-10, same-label relevance, and the
    * MRR/precision/DCG/nDCG tail. The DCG discounts are the SAME
    * driver-computed double literals the Spark plan embeds
    * ([[graft.ops.Eval.discounts]]) — neither engine evaluates
    * log2 at query time — and both engines fold contributions in
    * rank order seeded with 0.0 (list_prepend ≡ aggregate's init),
    * so the doubles are bit-identical. */
  val retrievalEval: String = {
    val k = 10
    // '…'::DOUBLE (string cast → correctly-rounded strtod), NOT a
    // bare numeric literal: DuckDB parses those as DECIMAL and the
    // DECIMAL→DOUBLE conversion is off by an ulp (the mmrTopK trap)
    val ds = graft.ops.Eval.discounts(k)
      .map(d => s"'${graft.ops.Eval.fmtDouble(d)}'::DOUBLE")
      .mkString("[", ", ", "]")
    s"""
WITH v AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
q AS (SELECT * FROM v WHERE vec_id < 50),
lc AS (SELECT label, count(*) AS n_label FROM v GROUP BY label),
disc AS (SELECT $ds AS ds),
scored AS (
  SELECT q.vec_id AS query_id, q.label AS q_label,
         c.vec_id AS corpus_id, c.label AS c_label,
         list_dot_product(q.e, c.e)
           / (sqrt(list_dot_product(q.e, q.e))
              * sqrt(list_dot_product(c.e, c.e))) AS cosine_sim
  FROM q, v c WHERE c.vec_id <> q.vec_id),
top AS (
  SELECT *, CASE WHEN c_label = q_label THEN 1::BIGINT
                 ELSE 0::BIGINT END AS rel
  FROM (SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY cosine_sim DESC, corpus_id)
          AS "rank"
        FROM scored)
  WHERE "rank" <= $k),
per_q AS (
  SELECT query_id, q_label,
         CAST(sum(rel) AS BIGINT) AS hits,
         min(CASE WHEN rel = 1 THEN "rank" END) AS first_rel,
         list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
             list(CAST(rel AS DOUBLE) * ds["rank"] ORDER BY "rank")),
           (a, b) -> a + b) AS dcg
  FROM top, disc
  GROUP BY query_id, q_label, ds),
m AS (
  SELECT p.query_id, p.q_label, lc.n_label - 1 AS n_rel, p.hits,
         CASE WHEN p.first_rel IS NULL THEN CAST(0.0 AS DOUBLE)
              ELSE CAST(1.0 AS DOUBLE) / CAST(p.first_rel AS DOUBLE)
         END AS mrr,
         CAST(p.hits AS DOUBLE) / CAST($k AS DOUBLE) AS precision_at_k,
         p.dcg,
         list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
             disc.ds[1:least(lc.n_label - 1, $k)]),
           (a, b) -> a + b) AS idcg
  FROM per_q p JOIN lc ON lc.label = p.q_label, disc)
SELECT query_id, CAST(q_label AS INT) AS q_label,
       CAST(n_rel AS BIGINT) AS n_rel, hits, mrr, precision_at_k, dcg,
       CASE WHEN idcg > 0 THEN dcg / idcg
            ELSE CAST(0.0 AS DOUBLE) END AS ndcg
FROM m ORDER BY query_id"""
  }

  /** q141 oracle: Matryoshka dimension ablation replayed — per
    * ablated prefix width, the exact top-k on the truncated vectors
    * joined against the full-dim ground truth; integer hits and ONE
    * final division (hash-exact average). */
  val dimAblation: String = {
    val k = 5
    val dims = Seq(8, 16, 32, 64)
    val perDim = dims.map { d =>
      s"""a$d AS (
  SELECT query_id, corpus_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
           row_number() OVER (PARTITION BY q.vec_id ORDER BY
             list_dot_product(q.e[1:$d], c.e[1:$d])
               / (sqrt(list_dot_product(q.e[1:$d], q.e[1:$d]))
                  * sqrt(list_dot_product(c.e[1:$d], c.e[1:$d]))) DESC,
             c.vec_id) AS r
    FROM q, v c WHERE c.vec_id <> q.vec_id) WHERE r <= $k),
h$d AS (
  SELECT CAST($d AS INT) AS dim, count(*) AS hits
  FROM a$d JOIN gt USING (query_id, corpus_id))"""
    }.mkString(",\n")
    s"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
q AS (SELECT * FROM v WHERE vec_id < 50),
gt AS (
  SELECT query_id, corpus_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
           row_number() OVER (PARTITION BY q.vec_id ORDER BY
             list_dot_product(q.e, c.e)
               / (sqrt(list_dot_product(q.e, q.e))
                  * sqrt(list_dot_product(c.e, c.e))) DESC,
             c.vec_id) AS r
    FROM q, v c WHERE c.vec_id <> q.vec_id) WHERE r <= $k),
poss AS (SELECT count(*) AS possible FROM gt),
$perDim
SELECT u.dim, u.hits, poss.possible,
       CAST(u.hits AS DOUBLE) / CAST(poss.possible AS DOUBLE) AS recall
FROM (${dims.map(d => s"SELECT * FROM h$d").mkString(" UNION ALL ")}) u,
     poss
ORDER BY u.dim"""
  }

  /** q114 oracle: dedup lineage replayed — the q66 brute-force pair
    * + recursive closure labels each clustered doc's minimum
    * reachable id; singletons canonicalize to themselves. */
  val dedupLineage: String = """
WITH RECURSIVE t AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
  FROM documents WHERE doc_id < 1000),
s AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(toks) - 3, 0) + 2),
           i -> array_to_string(toks[i:i+2], ' '))) AS sh
  FROM t),
e AS (
  SELECT a.doc_id AS src, b.doc_id AS dst
  FROM s a, s b
  WHERE a.doc_id < b.doc_id
    AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
        >= 0.8),
sym AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
nodes AS (SELECT DISTINCT src AS id FROM sym),
reach(id, r) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT reach.id, sym.dst FROM reach JOIN sym ON sym.src = reach.r),
cc AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
SELECT t.doc_id,
       coalesce(cc.component, t.doc_id) AS canonical_id,
       t.doc_id <> coalesce(cc.component, t.doc_id) AS was_dropped
FROM t LEFT JOIN cc ON cc.id = t.doc_id
ORDER BY t.doc_id"""

  /** q149 oracle: the padding-waste report replayed — the identical
    * CASE-chain bucket assignment, least/greatest token masses, and
    * the 1.0 − real/padded waste tree. */
  val lengthBuckets: String = """
WITH t AS (
  SELECT len(string_split_regex(trim(text), ' +')) AS len
  FROM documents),
b AS (
  SELECT CASE WHEN len <= 16 THEN 16 WHEN len <= 32 THEN 32
              WHEN len <= 64 THEN 64 ELSE 128 END AS bucket, len
  FROM t)
SELECT CAST(bucket AS INT) AS bucket,
       count(*) AS n_docs,
       CAST(sum(least(len, bucket)) AS BIGINT) AS real_tokens,
       CAST(count(*) * bucket AS BIGINT) AS padded_tokens,
       CAST(sum(greatest(len - 128, 0)) AS BIGINT) AS tokens_truncated,
       1.0 - CAST(sum(least(len, bucket)) AS DOUBLE)
             / CAST(count(*) * bucket AS DOUBLE) AS waste
FROM b GROUP BY bucket ORDER BY bucket"""

  /** q150 oracle: the CMS audit replayed end to end — the sketch
    * itself is deterministic (row-j bucket = Horner 2-hex-digit
    * md5("j:token") mod 256), so DuckDB rebuilds the identical d×w
    * cell table, probes the same cells, and takes the same min. */
  val cmsHitters: String = {
    def bucket(j: Int, tok: String): String =
      s"""((strpos('0123456789abcdef', substr(md5('$j:' || $tok), 1, 1)) - 1) * 16
          + (strpos('0123456789abcdef', substr(md5('$j:' || $tok), 2, 1)) - 1)) % 256"""
    val rows = (0 until 4)
    val cellArms = rows.map(j =>
      s"SELECT $j AS row, ${bucket(j, "tok")} AS bucket FROM toks")
      .mkString("\n  UNION ALL\n  ")
    val probeArms = rows.map(j =>
      s"SELECT tok, exact, $j AS row, ${bucket(j, "tok")} AS bucket FROM top")
      .mkString("\n  UNION ALL\n  ")
    s"""
WITH toks AS (
  SELECT t AS tok
  FROM (SELECT unnest(string_split_regex(trim(text), ' +')) AS t
        FROM documents)
  WHERE t <> ''),
cms AS (
  SELECT row, bucket, count(*) AS cnt
  FROM ($cellArms)
  GROUP BY row, bucket),
top AS (
  SELECT tok, count(*) AS exact FROM toks
  GROUP BY tok ORDER BY exact DESC, tok LIMIT 20),
probes AS (
  $probeArms),
est AS (
  SELECT probes.tok, probes.exact, min(cms.cnt) AS cms_estimate
  FROM probes JOIN cms ON cms.row = probes.row
                      AND cms.bucket = probes.bucket
  GROUP BY probes.tok, probes.exact)
SELECT CAST(row_number() OVER (ORDER BY exact DESC, tok) AS INT) AS rank,
       tok, CAST(exact AS BIGINT) AS exact,
       CAST(cms_estimate AS BIGINT) AS cms_estimate,
       CAST(cms_estimate AS DOUBLE) / CAST(exact AS DOUBLE) AS inflation
FROM est ORDER BY rank"""
  }

  /** Hex→integer without a conv() builtin: Horner over strpos of
    * each digit in the hex alphabet (the q150 discipline, widened to
    * n digits). */
  private def hexInt(e: String, start: Int, n: Int): String =
    (start until start + n).map(i =>
        s"(strpos('0123456789abcdef', substr($e, $i, 1)) - 1)")
      .reduce((acc, d) => s"($acc * 16 + $d)")

  /** Shared rho expression: leading-zero bits of the 8 hex digits
    * from position 3, + 1 — identical string/CASE arithmetic to
    * `Sketch.hllRho`. */
  private val hllRhoSql: String = """CASE WHEN st = '' THEN 33
           ELSE (8 - length(st)) * 4 +
                CASE WHEN substr(st, 1, 1) = '1' THEN 3
                     WHEN substr(st, 1, 1) IN ('2', '3') THEN 2
                     WHEN substr(st, 1, 1) IN ('4', '5', '6', '7') THEN 1
                     ELSE 0 END + 1 END"""

  /** q151 oracle: the HLL audit replayed cell-exactly — same md5
    * register/rho derivation, same shift-based 2^-M binary fractions
    * (exact in double, so the sum is order-independent), the
    * identical α·m² literal, and the identical driver-computed
    * linear-counting table (shortest-roundtrip reprs parse back to
    * the same IEEE doubles in both engines). */
  val hllDistinct: String = {
    val alphaM2 = graft.ops.Sketch.HllAlphaM2.toString
    // '…'::DOUBLE per element (the retrievalEval/mmrTopK trap): a
    // bare 257-element numeric list coerces to DECIMAL(20,16), whose
    // 18-digit mantissas exceed 2^53 and round an ulp on the
    // DECIMAL→DOUBLE conversion — caught by the sf0.001 robustness
    // sweep (raw ≤ 640 only at tiny SF, so sf0.01 never took the
    // linear-counting branch)
    val lcList = graft.ops.Sketch.LinearCountTable
      .map(d => s"'${graft.ops.Eval.fmtDouble(d)}'::DOUBLE")
      .mkString("[", ", ", "]")
    s"""
WITH v AS (
  SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS h FROM events),
r AS (
  SELECT event_type,
         CAST(${hexInt("h", 1, 2)} AS INT) AS register,
         ltrim(substr(h, 3, 8), '0') AS st
  FROM v),
regs AS (
  SELECT event_type, register,
         max($hllRhoSql) AS rho_max
  FROM r GROUP BY 1, 2),
e AS (
  SELECT event_type,
         sum(CAST(1.0 AS DOUBLE)
             / CAST(1::BIGINT << rho_max AS DOUBLE)) AS s_present,
         count(*) AS n_present
  FROM regs GROUP BY 1),
est AS (
  SELECT event_type,
         256 - n_present AS vz,
         $alphaM2 / (s_present + CAST(256 - n_present AS DOUBLE)) AS raw
  FROM e),
fin AS (
  SELECT event_type, vz,
         CASE WHEN raw <= 640.0 AND vz > 0
              THEN ($lcList)[vz + 1]
              ELSE raw END AS hll_estimate
  FROM est),
x AS (
  SELECT event_type, count(DISTINCT user_id) AS exact_distinct
  FROM events GROUP BY 1)
SELECT x.event_type,
       CAST(x.exact_distinct AS BIGINT) AS exact_distinct,
       fin.hll_estimate,
       CAST(fin.vz AS BIGINT) AS n_zero_registers,
       abs(fin.hll_estimate - CAST(x.exact_distinct AS DOUBLE))
         / CAST(x.exact_distinct AS DOUBLE) AS rel_error
FROM x JOIN fin USING (event_type)
ORDER BY x.event_type"""
  }

  /** q152 oracle: KMV replayed — distinct 32-bit md5-prefix hashes,
    * the 64th order statistic via one row_number window, and the
    * same (k−1)·2³² scale literal. */
  val kmvDistinct: String = {
    val kmvScale = (63.0 * 4294967296.0).toString
    s"""
WITH h AS (
  SELECT DISTINCT event_type,
         CAST(${hexInt("md5(CAST(user_id AS VARCHAR))", 1, 8)} AS BIGINT)
           AS hv
  FROM events),
rk AS (
  SELECT event_type, hv,
         row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
  FROM h),
agg AS (
  SELECT event_type, count(*) AS n_distinct_hashes,
         max(CASE WHEN rn = 64 THEN hv END) AS r64
  FROM rk GROUP BY 1),
x AS (
  SELECT event_type, count(DISTINCT user_id) AS exact_distinct
  FROM events GROUP BY 1),
est AS (
  SELECT event_type, n_distinct_hashes,
         CASE WHEN n_distinct_hashes < 64
              THEN CAST(n_distinct_hashes AS DOUBLE)
              ELSE $kmvScale / CAST(r64 AS DOUBLE) END AS kmv_estimate
  FROM agg)
SELECT x.event_type,
       CAST(x.exact_distinct AS BIGINT) AS exact_distinct,
       CAST(est.n_distinct_hashes AS BIGINT) AS n_distinct_hashes,
       est.kmv_estimate,
       abs(est.kmv_estimate - CAST(x.exact_distinct AS DOUBLE))
         / CAST(x.exact_distinct AS DOUBLE) AS rel_error
FROM x JOIN est USING (event_type)
ORDER BY x.event_type"""
  }

  /** q153 oracle: histogram quantiles replayed — identical bucket
    * floor arithmetic (the w literal is the same shortest-roundtrip
    * double), cumulative counts, interpolation tree, and the exact
    * rank-statistic pick. */
  val histQuantiles: String = {
    val lo = 0.0; val hi = 1024.0; val buckets = 128
    val w = (hi - lo) / buckets
    s"""
WITH s AS (SELECT CAST(n_chars AS DOUBLE) AS v FROM documents),
st AS (SELECT count(*) AS n FROM s),
h AS (
  SELECT CAST(least(greatest(floor((v - $lo) / $w), 0),
                    ${buckets - 1}) AS INT) AS bucket,
         count(*) AS cnt
  FROM s GROUP BY 1),
hp AS (
  SELECT bucket, cnt,
         sum(cnt) OVER (ORDER BY bucket) AS cum,
         sum(cnt) OVER (ORDER BY bucket) - cnt AS cum_prev
  FROM h),
qr AS (
  SELECT q, CAST(ceil(q * CAST(n AS DOUBLE) - 1e-9) AS BIGINT) AS rank
  FROM (SELECT unnest([0.25, 0.5, 0.9, 0.99]::DOUBLE[]) AS q), st),
e AS (
  SELECT qr.q, qr.rank, hp.bucket, hp.cnt, hp.cum_prev
  FROM qr JOIN hp ON hp.cum >= qr.rank AND hp.cum_prev < qr.rank),
r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM s)
SELECT e.q,
       $lo + $w * (CAST(e.bucket AS DOUBLE)
         + CAST(e.rank - e.cum_prev AS DOUBLE) / CAST(e.cnt AS DOUBLE))
         AS hist_estimate,
       r.v AS exact_value,
       abs($lo + $w * (CAST(e.bucket AS DOUBLE)
         + CAST(e.rank - e.cum_prev AS DOUBLE) / CAST(e.cnt AS DOUBLE))
         - r.v) AS abs_error,
       CAST($w AS DOUBLE) AS bound
FROM e JOIN r ON r.rn = e.rank
ORDER BY e.q"""
  }

  /** q154 oracle: per-doc novelty replayed — the q71-style 3-gram
    * windows (list_distinct'd per doc), gram df over docs, and one
    * IEEE division. */
  val docNovelty: String = """
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
  FROM documents),
g AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           range(1, greatest(len(toks) - 3, 0) + 2),
           i -> array_to_string(toks[i:i+2], ' ')))) AS gram
  FROM t),
d AS (SELECT gram, count(*) AS gdf FROM g GROUP BY 1),
p AS (
  SELECT doc_id, count(*) AS n_grams,
         sum(CASE WHEN gdf = 1 THEN 1 ELSE 0 END) AS n_novel
  FROM g JOIN d USING (gram) GROUP BY 1)
SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
       CAST(n_novel AS BIGINT) AS n_novel,
       CAST(n_novel AS DOUBLE) / CAST(n_grams AS DOUBLE) AS novelty
FROM p ORDER BY doc_id"""

  /** q155 oracle: the md5 winnowing fingerprint replayed — the q71
    * 3-gram windows, md5 per window, lexicographic sort, first-k
    * comma-join, one md5 collapse. */
  val fingerprintMd5: String = """
WITH t AS (
  SELECT doc_id, text, string_split_regex(trim(text), ' +') AS toks
  FROM documents),
s AS (
  SELECT doc_id, text,
         list_sort(list_transform(
           range(1, greatest(len(toks) - 3, 0) + 2),
           i -> md5(array_to_string(toks[i:i+2], ' ')))) AS h
  FROM t)
SELECT doc_id,
       md5(array_to_string(h[1:8], ',')) AS fingerprint,
       md5(text) AS exact_hash
FROM s ORDER BY doc_id"""

  /** q147 oracle: calibration report replayed — the q89 score tree
    * and q79 rule battery verbatim, the same floor-quantized
    * fixed-point prediction sums (integer aggregates only), and the
    * identical frac/mean/gap/ece expression trees. */
  val calibration: String = """
WITH t AS (
  SELECT doc_id, text,
         string_split_regex(trim(text), ' +') AS toks
  FROM documents),
f AS (
  SELECT doc_id,
         CAST(len(toks) AS DOUBLE) AS n_tok,
         CAST(len(list_filter(toks,
           x -> x IN ('the', 'a', 'of', 'and', 'is', 'to')))
           AS DOUBLE) AS n_stop,
         CAST(len(list_distinct(toks)) AS DOUBLE) AS n_dist,
         CAST(length(text) - (len(toks) - 1) AS DOUBLE) AS word_chars
  FROM t),
s AS (
  SELECT doc_id,
         -3.5 + 8.0 * (n_stop / n_tok) - 0.25 * (word_chars / n_tok)
           + 2.0 * (n_dist / n_tok) + 0.5 * (n_tok / 100.0) AS clf_score
  FROM f),
p AS (
  SELECT doc_id,
         (clf_score / (1.0 + abs(clf_score)) + 1.0) * 0.5 AS p
  FROM s),
m AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(length(text) - len(toks) + 1 AS DOUBLE) / len(toks)
           AS mean_word_len,
         CAST(len(list_filter(toks,
           x -> x IN ('the', 'a', 'of', 'and', 'is', 'to'))) AS BIGINT)
           AS n_stopwords,
         CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
           AS distinct_ratio
  FROM t),
y AS (
  SELECT doc_id,
         ((n_tokens >= 20 AND n_tokens <= 90)
          AND (mean_word_len >= 4.0 AND mean_word_len <= 10.0)
          AND (n_stopwords >= 2) AND (distinct_ratio >= 0.35)) AS y
  FROM m),
j AS (
  SELECT least(CAST(floor(p.p * 10.0) AS BIGINT), 9) AS bin, y.y,
         CAST(floor(p.p * 1000000000.0) AS BIGINT) AS pq
  FROM p JOIN y ON y.doc_id = p.doc_id),
a AS (
  SELECT CAST(bin AS INT) AS bin, count(*) AS n,
         CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
         CAST(sum(pq) AS BIGINT) AS pq_sum
  FROM j GROUP BY 1),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM a)
SELECT a.bin, CAST(a.n AS BIGINT) AS n, a.n_pos,
       CAST(a.n_pos AS DOUBLE) / CAST(a.n AS DOUBLE) AS frac_pos,
       (CAST(a.pq_sum AS DOUBLE) / CAST(a.n AS DOUBLE)) / 1.0e9
         AS mean_pred,
       abs((CAST(a.pq_sum AS DOUBLE) / CAST(a.n AS DOUBLE)) / 1.0e9
           - CAST(a.n_pos AS DOUBLE) / CAST(a.n AS DOUBLE)) AS gap,
       abs((CAST(a.pq_sum AS DOUBLE) / CAST(a.n AS DOUBLE)) / 1.0e9
           - CAST(a.n_pos AS DOUBLE) / CAST(a.n AS DOUBLE))
         * (CAST(a.n AS DOUBLE) / CAST(tot.n_total AS DOUBLE)) AS ece_term
FROM a, tot ORDER BY a.bin"""

  /** q148 oracle: the per-column profile replayed — one UNION ALL arm
    * per column with identical render expressions (money floor for
    * doubles, explicit micros strftime for the timestamp, plain
    * VARCHAR casts elsewhere). */
  val profileTable: String = {
    def arm(colName: String, render: String => String): String =
      s"""SELECT '$colName' AS "column", count(*) AS n_rows,
       count(*) - count($colName) AS n_nulls,
       count(DISTINCT $colName) AS n_distinct,
       ${render(s"min($colName)")} AS min_value,
       ${render(s"max($colName)")} AS max_value
FROM events"""
    val str = (e: String) => s"CAST($e AS VARCHAR)"
    val money = (e: String) =>
      s"CAST(CAST(floor($e * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2)) AS VARCHAR)"
    val ts = (e: String) => s"strftime($e, '%Y-%m-%d %H:%M:%S.%f')"
    Seq(
      arm("event_id", str), arm("ts", ts), arm("user_id", str),
      arm("event_type", str), arm("value", money), arm("props", str))
      .mkString("\n", "\nUNION ALL\n", "\nORDER BY \"column\"")
  }

  /** q146 oracle: fuzzy entity resolution replayed — the same
    * deterministic dirty registry (catalog + one-char-deleted feed
    * twin, deletion position key-derived), distinct-token blocking
    * join, levenshtein ≤ 1 verify, recursive-closure components,
    * min-rid golden record. Components are name-group-sized
    * (bounded), so the closure stays linear in nodes. */
  val entityResolve: String = """
WITH RECURSIVE reg AS (
  SELECT CAST(p_partkey AS BIGINT) AS rid, p_name AS name,
         'catalog' AS src FROM part
  UNION ALL
  SELECT CAST(p_partkey + 1000000 AS BIGINT),
         substr(p_name, 1, pos - 1) || substr(p_name, pos + 1),
         'feed'
  FROM (SELECT p_partkey, p_name,
               CASE WHEN substr(p_name, p0, 1) = ' '
                    THEN p0 + 1 ELSE p0 END AS pos
        FROM (SELECT p_partkey, p_name,
                     CAST(p_partkey % (length(p_name) - 1) + 2 AS INT) AS p0
              FROM part))),
names AS (
  -- duplication collapse: the graph is over DISTINCT names, node id
  -- = min rid bearing the name (so a component min IS the entity's
  -- global min rid) — mirrors the Spark side exactly
  SELECT name, min(rid) AS nid, count(*) AS cnt FROM reg GROUP BY name),
tok AS (
  -- deletion-key blocking (maxEdit=1 path): key_i = name minus
  -- token i — the same drop-one-token keys the Spark side emits
  SELECT DISTINCT nid, name,
         array_to_string(
           list_concat(ts[1:i - 1], ts[i + 1:len(ts)]), ' ') AS tok
  FROM (SELECT nid, name, string_split(name, ' ') AS ts,
               CAST(unnest(range(1, len(string_split(name, ' ')) + 1))
                    AS INT) AS i
        FROM names)),
cand AS (
  SELECT DISTINCT a.nid AS src, a.name AS na, b.nid AS dst, b.name AS nb
  FROM tok a JOIN tok b ON a.tok = b.tok AND a.nid < b.nid),
v AS (SELECT src, dst FROM cand WHERE levenshtein(na, nb) <= 1),
sym AS (SELECT src, dst FROM v UNION SELECT dst, src FROM v),
nodes AS (SELECT DISTINCT src AS id FROM sym),
reach(id, r) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT reach.id, sym.dst FROM reach JOIN sym ON sym.src = reach.r),
cc AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
ncomp AS (
  SELECT names.name, names.nid, names.cnt,
         coalesce(cc.component, names.nid) AS entity_id
  FROM names LEFT JOIN cc ON cc.id = names.nid),
canon AS (
  SELECT entity_id, name AS canonical_name FROM ncomp WHERE nid = entity_id),
sizes AS (
  SELECT entity_id, sum(cnt) AS n_members FROM ncomp GROUP BY entity_id)
SELECT reg.rid, reg.name, reg.src, ncomp.entity_id,
       canon.canonical_name, CAST(sizes.n_members AS BIGINT) AS n_members
FROM reg
JOIN ncomp ON ncomp.name = reg.name
JOIN canon ON canon.entity_id = ncomp.entity_id
JOIN sizes ON sizes.entity_id = ncomp.entity_id
ORDER BY reg.rid"""

  /** q145 oracle: centrality dedup replayed — the q114 brute-force
    * near-dup edges, THREE integer-PageRank rounds unrolled as CTEs
    * (pr//deg shares, (Σ·85)//100 + 0.15·10⁹ update — every divide
    * an integer `//`, so the fixed-point scores are engine-exact),
    * the recursive-closure components, and the (pr desc, id)
    * survivor window. */
  val centralityDedup: String = {
    val rounds = (1 to 3).map { i =>
      s"""r$i AS (
  SELECT sym.dst AS id,
         (CAST(sum(r${i - 1}.pr // deg.deg) AS BIGINT) * 85) // 100
           + 150000000 AS pr
  FROM sym JOIN r${i - 1} ON r${i - 1}.id = sym.src
       JOIN deg ON deg.src = sym.src
  GROUP BY sym.dst)"""
    }.mkString(",\n")
    s"""
WITH RECURSIVE t AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
  FROM documents WHERE doc_id < 1000),
s AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(toks) - 3, 0) + 2),
           i -> array_to_string(toks[i:i+2], ' '))) AS sh
  FROM t),
e AS (
  SELECT a.doc_id AS src, b.doc_id AS dst
  FROM s a, s b
  WHERE a.doc_id < b.doc_id
    AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
        >= 0.8),
sym AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
deg AS (SELECT src, count(*) AS deg FROM sym GROUP BY src),
r0 AS (
  SELECT DISTINCT src AS id, CAST(1000000000 AS BIGINT) AS pr FROM sym),
$rounds,
nodes AS (SELECT DISTINCT src AS id FROM sym),
reach(id, r) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT reach.id, sym.dst FROM reach JOIN sym ON sym.src = reach.r),
cc AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
SELECT r3.id, cc.component, CAST(r3.pr AS BIGINT) AS pr_scaled,
       (row_number() OVER (PARTITION BY cc.component
                           ORDER BY r3.pr DESC, r3.id)) = 1 AS survivor
FROM r3 JOIN cc ON cc.id = r3.id
ORDER BY r3.id"""
  }

  /** q115 oracle: the corpus version diff replayed — identical
    * normalized-key arithmetic (q108 chain + md5), the same
    * edit/add/remove salt, FULL OUTER JOIN CDC classification. */
  val corpusDiff: String = """
WITH k AS (
  SELECT doc_id,
         md5(trim(regexp_replace(regexp_replace(lower(text),
           '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS nk,
         md5(trim(regexp_replace(regexp_replace(lower(text || ' edited'),
           '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS nk_edit
  FROM documents),
old AS (SELECT doc_id, nk AS norm_key FROM k WHERE doc_id % 13 <> 0),
new AS (
  SELECT doc_id,
         CASE WHEN doc_id % 9 = 0 THEN nk_edit ELSE nk END AS norm_key
  FROM k WHERE doc_id % 17 <> 0)
SELECT doc_id, change_type FROM (
  SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
         CASE WHEN o.doc_id IS NULL THEN 'added'
              WHEN n.doc_id IS NULL THEN 'removed'
              WHEN o.norm_key IS DISTINCT FROM n.norm_key
                THEN 'changed'
              ELSE 'unchanged' END AS change_type
  FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id)
WHERE change_type <> 'unchanged'
ORDER BY doc_id"""

  /** q120 oracle: BPE merge learning replayed — `numMerges` unrolled
    * rounds, each: adjacent-pair counts over the 0x1F-joined symbol
    * states (weighted by word count), the (cnt desc, a, b) argmax,
    * and the same leftmost-non-overlap merge fold (list_reduce with
    * a string accumulator — append `b` separator-less when the last
    * symbol is exactly `a`). */
  /** q130 oracle: tokenizer coverage report — the q120/q121 BPE
    * rounds replayed on the 10% train slice, the induced word→pieces
    * table LEFT-joined to every word occurrence corpus-wide,
    * char-fallback for OOV, per-source OOV rate + fertility. */
  val tokenizerReport: String = bpeCtes(10, " WHERE doc_id % 10 = 0") + """,
tab AS (
  SELECT word, CAST(len(string_split(sym, chr(31))) AS BIGINT)
           AS n_pieces
  FROM w10),
wd AS (
  SELECT d.source, unnest(string_split_regex(trim(d.text), ' +')) AS word
  FROM documents d),
ag AS (
  SELECT source, count(*) AS n_words,
         sum(CASE WHEN t.n_pieces IS NULL THEN 1 ELSE 0 END) AS n_oov,
         sum(coalesce(t.n_pieces, length(wd.word))) AS n_pieces_total
  FROM wd LEFT JOIN tab t USING (word)
  GROUP BY source)
SELECT source, CAST(n_words AS BIGINT) AS n_words,
       CAST(n_oov AS BIGINT) AS n_oov,
       CAST(n_oov AS DOUBLE) / n_words AS oov_rate,
       CAST(n_pieces_total AS DOUBLE) / n_words AS fertility
FROM ag ORDER BY source"""

  val bpeLearn: String = bpeCtes(10) +
    "\nSELECT * FROM (\n" + (1 to 10).map { r =>
      s"""  SELECT CAST($r AS BIGINT) AS merge_rank, a AS "left",
         b AS "right", a || b AS merged,
         CAST(cnt AS BIGINT) AS pair_count FROM m$r"""
    }.mkString("\n  UNION ALL\n") + "\n) ORDER BY merge_rank"

  /** q121 oracle: the segmentation the learned merges induce — the
    * q120 rounds' END STATE (w10) rendered as the word→pieces
    * table. */
  val bpeSegment: String = bpeCtes(10) + """
SELECT word, n,
       CAST(len(string_split(sym, chr(31))) AS BIGINT) AS n_pieces,
       replace(sym, chr(31), ' ') AS pieces
FROM w10 ORDER BY word"""

  private def bpeCtes(rounds: Int, corpusWhere: String = ""): String = {
    val sb = new StringBuilder
    sb ++= s"""WITH w0 AS (
  SELECT word, count(*) AS n,
         array_to_string(list_transform(range(1, length(word) + 1),
           i -> word[CAST(i AS INT):CAST(i AS INT)]), chr(31)) AS sym
  FROM (SELECT unnest(string_split_regex(trim(text), ' +')) AS word
        FROM documents$corpusWhere)
  GROUP BY word)"""
    for (r <- 1 to rounds) {
      sb ++= s""",
p$r AS (
  SELECT syms[i] AS a, syms[i + 1] AS b, sum(n) AS cnt
  FROM (SELECT n, syms,
               CAST(unnest(range(1, len(syms))) AS INTEGER) AS i
        FROM (SELECT n, string_split(sym, chr(31)) AS syms
              FROM w${r - 1}))
  GROUP BY 1, 2),
m$r AS (SELECT a, b, cnt FROM p$r ORDER BY cnt DESC, a, b LIMIT 1),
w$r AS (
  -- LEFT JOIN ON TRUE + COALESCE'd CASE: when pair-able symbols
  -- exhaust before round $r, m$r is empty and a plain cross join
  -- would empty the whole word table; instead carry w${r - 1} forward
  -- unchanged, matching the Spark side's early-stop behavior
  SELECT word, n,
         CASE WHEN m$r.a IS NULL THEN sym
         ELSE list_reduce(string_split(sym, chr(31)), (acc, x) -> CASE
           WHEN (acc = m$r.a OR ends_with(acc, chr(31) || m$r.a))
                AND x = m$r.b
             THEN acc || x
           ELSE acc || chr(31) || x END) END AS sym
  FROM w${r - 1} LEFT JOIN m$r ON TRUE)"""
    }
    sb.toString
  }

  /** q119 oracle: collocation mining replayed — identical bigram/
    * unigram counts, the same single lift expression
    * c_ab·N/(c_a·c_b), min-count gate, (lift desc, bigram) top-k. */
  val collocations: String = """
WITH t AS (
  SELECT string_split_regex(trim(text), ' +') AS toks FROM documents),
b AS (
  SELECT toks[i] || ' ' || toks[i + 1] AS bigram
  FROM (SELECT toks, unnest(range(1, len(toks))) AS i
        FROM t WHERE len(toks) >= 2)),
cab AS (
  SELECT bigram, count(*) AS c_ab FROM b GROUP BY bigram
  HAVING count(*) >= 5),
cw AS (
  SELECT w, count(*) AS c
  FROM (SELECT unnest(toks) AS w FROM t) GROUP BY w),
n AS (SELECT CAST(sum(len(toks)) AS BIGINT) AS n_tokens FROM t),
scored AS (
  SELECT cab.bigram, cab.c_ab, a.c AS c_a, bb.c AS c_b,
         CAST(cab.c_ab AS DOUBLE) * CAST(n.n_tokens AS DOUBLE)
           / (CAST(a.c AS DOUBLE) * CAST(bb.c AS DOUBLE)) AS lift
  FROM cab
  JOIN cw a ON a.w = string_split(cab.bigram, ' ')[1]
  JOIN cw bb ON bb.w = string_split(cab.bigram, ' ')[2],
  n),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY lift DESC, bigram) AS rank
  FROM scored)
SELECT CAST(rank AS BIGINT) AS rank, bigram, c_ab, c_a, c_b, lift
FROM ranked WHERE rank <= 50 ORDER BY rank"""

  /** q118 oracle: split-leakage audit replayed — brute-force
    * verified pairs (q66 discipline), the q100 md5 split CASE on
    * both members, canonical (least, greatest) cell, one count. */
  val splitLeakage: String = """
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
  FROM documents WHERE doc_id < 1000),
s AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(toks) - 3, 0) + 2),
           i -> array_to_string(toks[i:i+2], ' '))) AS sh
  FROM t),
sp AS (
  SELECT doc_id,
         CASE WHEN substring(md5(concat('graft', ':',
                   CAST(doc_id AS VARCHAR))), 1, 8) < 'cccccccc'
                THEN 'train'
              WHEN substring(md5(concat('graft', ':',
                   CAST(doc_id AS VARCHAR))), 1, 8) < 'e6666666'
                THEN 'val'
              ELSE 'test' END AS split
  FROM t),
e AS (
  SELECT least(pa.split, pb.split) AS split_a,
         greatest(pa.split, pb.split) AS split_b
  FROM s a, s b, sp pa, sp pb
  WHERE a.doc_id < b.doc_id
    AND pa.doc_id = a.doc_id AND pb.doc_id = b.doc_id
    AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
        >= 0.8)
SELECT split_a, split_b, count(*) AS n_pairs
FROM e GROUP BY split_a, split_b
ORDER BY split_a, split_b"""

  /** q113 oracle: quality-weighted PPS — the q89 classifier score
    * CTEs produce the keep probability, floor(p·10⁶) makes the
    * integer weight, and the q64 grid arithmetic replays the
    * systematic picks. */
  val qualityPps: String = """
WITH t AS (
  SELECT doc_id, text,
         string_split_regex(trim(text), ' +') AS toks
  FROM documents),
f AS (
  SELECT doc_id,
         CAST(len(toks) AS DOUBLE) AS n_tok,
         CAST(len(list_filter(toks,
           x -> x IN ('the', 'a', 'of', 'and', 'is', 'to')))
           AS DOUBLE) AS n_stop,
         CAST(len(list_distinct(toks)) AS DOUBLE) AS n_dist,
         CAST(length(text) - (len(toks) - 1) AS DOUBLE) AS word_chars
  FROM t),
s AS (
  SELECT doc_id,
         -3.5 + 8.0 * (n_stop / n_tok) - 0.25 * (word_chars / n_tok)
           + 2.0 * (n_dist / n_tok) + 0.5 * (n_tok / 100.0) AS clf_score
  FROM f),
q AS (
  SELECT d.lang, s.doc_id,
         CAST(floor(((s.clf_score / (1.0 + abs(s.clf_score)) + 1.0)
           * 0.5) * 1000000.0) AS BIGINT) AS w
  FROM s JOIN documents d ON d.doc_id = s.doc_id),
c AS (
  SELECT lang, doc_id, w,
         sum(w) OVER (PARTITION BY lang ORDER BY doc_id
           ROWS UNBOUNDED PRECEDING) AS cum,
         sum(w) OVER (PARTITION BY lang) AS total
  FROM q),
p AS (
  SELECT lang, doc_id, w,
         CAST(floor(CAST(cum AS DOUBLE) / (CAST(total AS DOUBLE) / 8))
            - floor(CAST(cum - w AS DOUBLE)
                    / (CAST(total AS DOUBLE) / 8)) AS BIGINT) AS n_picks
  FROM c WHERE total > 0)
SELECT lang, doc_id, w AS weight, n_picks
FROM p WHERE n_picks > 0 ORDER BY lang, doc_id"""

  /** q92 oracle: cluster-balanced sampling — the kmeans CTEs (2
    * iterations over ALL embeddings) feed the q73 temperature replay
    * with cluster as the stratum. */
  val balancedSample: String = "WITH " + kmeansCtes(8, 2,
    """
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings""") + """,
d AS (
  SELECT doc.doc_id, doc.text, fin.cluster
  FROM documents doc JOIN fin ON fin.vec_id = doc.doc_id),
cc AS (SELECT cluster, count(*) AS n_docs FROM d GROUP BY cluster),
ss AS (SELECT list_reduce(
         list(sqrt(CAST(n_docs AS DOUBLE)) ORDER BY cluster),
         (a, b) -> a + b) AS total FROM cc),
tt AS (SELECT cluster,
         CAST(floor(100.0 * sqrt(CAST(n_docs AS DOUBLE)) / total + 0.5)
              AS BIGINT) AS n_target
       FROM cc, ss),
r AS (SELECT cluster, doc_id,
         row_number() OVER (PARTITION BY cluster
                            ORDER BY md5(text), doc_id) AS rn
      FROM d)
SELECT CAST(r.cluster AS BIGINT) AS cluster, r.doc_id,
       CAST(rn AS BIGINT) AS sample_rank
FROM r JOIN tt ON r.cluster = tt.cluster
WHERE rn <= tt.n_target
ORDER BY r.cluster, sample_rank"""

  /** q93 oracle: per-dimension z-score standardization — fixed-point
    * Σx and Σx² (order-independent integer sums), variance clamped
    * at 0, output exploded to (vec_id, pos, z) scalar rows over the
    * bounded id set while the statistics cover the whole corpus. */
  val standardize: String = """
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
st AS (
  SELECT p.pos,
         sum(CAST(floor(e[p.pos] * 1048576.0 + 0.5) AS BIGINT)) AS s1,
         sum(CAST(floor(e[p.pos] * e[p.pos] * 1048576.0 + 0.5)
                  AS BIGINT)) AS s2,
         count(*) AS n
  FROM v, range(1, 65) p(pos) GROUP BY 1),
sd AS (
  SELECT pos,
         CAST(s1 AS DOUBLE) / 1048576.0 / CAST(n AS DOUBLE) AS mean,
         sqrt(greatest(
           CAST(s2 AS DOUBLE) / 1048576.0 / CAST(n AS DOUBLE)
             - (CAST(s1 AS DOUBLE) / 1048576.0 / CAST(n AS DOUBLE))
               * (CAST(s1 AS DOUBLE) / 1048576.0 / CAST(n AS DOUBLE)),
           0.0)) AS std
  FROM st)
SELECT v.vec_id, CAST(p.pos - 1 AS BIGINT) AS pos,
       CASE WHEN sd.std = 0.0 THEN 0.0
            ELSE (e[p.pos] - sd.mean) / sd.std END AS z
FROM v, range(1, 65) p(pos), sd
WHERE sd.pos = p.pos AND v.vec_id < 100
ORDER BY v.vec_id, pos"""

  /** q111 oracle: the drift report replayed — q93's fixed-point
    * moment arithmetic per snapshot half (even/odd ids), identical
    * mean/variance expression order, |shift| and the guarded
    * variance ratio. */
  val embeddingDrift: String = """
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
ma AS (
  SELECT p.pos,
         CAST(sum(CAST(floor(e[p.pos] * 1048576.0 + 0.5) AS BIGINT))
              AS DOUBLE) / 1048576.0 / count(*) AS mean_a,
         greatest(
           CAST(sum(CAST(floor(e[p.pos] * e[p.pos] * 1048576.0 + 0.5)
                         AS BIGINT)) AS DOUBLE) / 1048576.0 / count(*)
             - (CAST(sum(CAST(floor(e[p.pos] * 1048576.0 + 0.5)
                             AS BIGINT)) AS DOUBLE) / 1048576.0
                / count(*))
               * (CAST(sum(CAST(floor(e[p.pos] * 1048576.0 + 0.5)
                               AS BIGINT)) AS DOUBLE) / 1048576.0
                  / count(*)),
           0.0) AS var_a
  FROM v, range(1, 65) p(pos) WHERE vec_id % 2 = 0 GROUP BY 1),
mb AS (
  SELECT p.pos,
         CAST(sum(CAST(floor(e[p.pos] * 1048576.0 + 0.5) AS BIGINT))
              AS DOUBLE) / 1048576.0 / count(*) AS mean_b,
         greatest(
           CAST(sum(CAST(floor(e[p.pos] * e[p.pos] * 1048576.0 + 0.5)
                         AS BIGINT)) AS DOUBLE) / 1048576.0 / count(*)
             - (CAST(sum(CAST(floor(e[p.pos] * 1048576.0 + 0.5)
                             AS BIGINT)) AS DOUBLE) / 1048576.0
                / count(*))
               * (CAST(sum(CAST(floor(e[p.pos] * 1048576.0 + 0.5)
                               AS BIGINT)) AS DOUBLE) / 1048576.0
                  / count(*)),
           0.0) AS var_b
  FROM v, range(1, 65) p(pos) WHERE vec_id % 2 = 1 GROUP BY 1)
SELECT CAST(coalesce(ma.pos, mb.pos) - 1 AS BIGINT) AS pos,
       mean_a, mean_b, abs(mean_b - mean_a) AS mean_shift,
       var_a, var_b,
       CASE WHEN var_a = 0.0 THEN 0.0 ELSE var_b / var_a END
         AS var_ratio
FROM ma FULL JOIN mb ON mb.pos = ma.pos
ORDER BY pos"""

  /** One BM25 term's score expression — written token-for-token as
    * the Spark column tree (left-associative, identical literals) so
    * every IEEE rounding matches; rational idf, no log. */
  private def bm25Term(t: String, i: Int): String = {
    val tf = s"CAST(len(list_filter(toks, x -> x = '$t')) AS DOUBLE)"
    s"""(n_docs - CAST(df_$i AS DOUBLE) + 0.5) / (CAST(df_$i AS DOUBLE) + 0.5)
     * ($tf * 2.2)
     / ($tf + 1.2 * (0.25 + 0.75 * CAST(dln AS DOUBLE)
        / (CAST(sum_dl AS DOUBLE) / n_docs)))"""
  }

  /** q90 oracle: rational-idf BM25 top-20 for the fixed 3-term query
    * — corpus stats CTE (N, Σdl, per-term df), then the scoring
    * expression from [[bm25Term]] summed left-to-right. */
  /** The BM25 scoring CTE chain ending in `top` (ranked matches) —
    * shared by the q90 retrieval oracle and the q94 hybrid fusion. */
  private def bm25Ctes: String = {
    val terms = Seq("vector", "merge", "slow")
    val dfs = terms.zipWithIndex.map { case (t, i) =>
      s"""sum(CASE WHEN len(list_filter(toks, x -> x = '$t')) > 0
              THEN 1 ELSE 0 END) AS df_$i"""
    }.mkString(",\n         ")
    val score = terms.zipWithIndex.map { case (t, i) =>
      s"(${bm25Term(t, i)})"
    }.mkString("\n      + ")
    s"""t AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
  FROM documents),
base AS (
  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS dln FROM t),
st AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         sum(dln) AS sum_dl,
         $dfs
  FROM base),
scored AS (
  SELECT doc_id,
      $score AS bm25
  FROM base, st),
top AS (
  SELECT doc_id, bm25,
         row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank
  FROM scored WHERE bm25 > 0.0)"""
  }

  /** q117 oracle: passage-level BM25 with doc max-pooling — the q70
    * chunk windows feed the [[bm25Term]] scoring at passage
    * granularity (passage stats: N passages, passage dln, per-term
    * passage df), then one window keeps each doc's best passage and
    * another ranks docs. */
  val passageSearch: String = {
    val terms = Seq("vector", "merge", "slow")
    val dfs = terms.zipWithIndex.map { case (t, i) =>
      s"""sum(CASE WHEN len(list_filter(toks, x -> x = '$t')) > 0
              THEN 1 ELSE 0 END) AS df_$i"""
    }.mkString(",\n         ")
    val score = terms.zipWithIndex.map { case (t, i) =>
      s"(${bm25Term(t, i)})"
    }.mkString("\n      + ")
    s"""
WITH t0 AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS toks0
  FROM documents),
x AS (
  SELECT doc_id, toks0, len(toks0) AS n,
         CAST(floor((greatest(len(toks0) - 64, 0) + 47) / 48.0)
           AS INTEGER) AS extra
  FROM t0),
ch AS (
  SELECT doc_id, CAST(unnest(range(0, extra + 1)) AS INTEGER) AS i,
         toks0, n
  FROM x),
base AS (
  SELECT doc_id, i AS chunk_idx,
         toks0[i * 48 + 1 : i * 48 + 64] AS toks,
         CAST(len(toks0[i * 48 + 1 : i * 48 + 64]) AS BIGINT) AS dln
  FROM ch),
st AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         sum(dln) AS sum_dl,
         $dfs
  FROM base),
scored AS (
  SELECT doc_id, chunk_idx,
      $score AS bm25
  FROM base, st),
pooled AS (
  SELECT doc_id, chunk_idx, bm25,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY bm25 DESC, chunk_idx) AS prn
  FROM scored WHERE bm25 > 0.0),
top AS (
  SELECT doc_id, chunk_idx, bm25,
         row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank
  FROM pooled WHERE prn = 1)
SELECT doc_id, CAST(rank AS INT) AS rank, chunk_idx, bm25
FROM top WHERE rank <= 10 ORDER BY rank"""
  }

  val bm25Search: String = "WITH " + bm25Ctes + """
SELECT doc_id, CAST(rank AS INT) AS rank, bm25 FROM top
WHERE rank <= 20 ORDER BY rank"""

  /** q94 oracle: hybrid retrieval — BM25 top-50 and exact-cosine
    * top-50 (query = vec 0's embedding, self excluded) fused by
    * reciprocal-rank fusion 1/(60+rank), both IEEE-rational. */
  val hybridSearch: String = "WITH " + bm25Ctes + """,
btop AS (SELECT doc_id, rank FROM top WHERE rank <= 50),
v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
qv AS (SELECT * FROM v WHERE vec_id = 0),
cs AS (
  SELECT c.vec_id AS doc_id,
         list_dot_product(qv.e, c.e)
           / (sqrt(list_dot_product(qv.e, qv.e))
              * sqrt(list_dot_product(c.e, c.e))) AS sim
  FROM v c, qv WHERE c.vec_id <> qv.vec_id),
ctop AS (
  SELECT doc_id, rank FROM (
    SELECT doc_id,
           row_number() OVER (ORDER BY sim DESC, doc_id) AS rank
    FROM cs) WHERE rank <= 50),
f AS (
  SELECT coalesce(b.doc_id, c2.doc_id) AS doc_id,
         coalesce(1.0 / (60.0 + b.rank), 0.0)
           + coalesce(1.0 / (60.0 + c2.rank), 0.0) AS rrf
  FROM btop b FULL OUTER JOIN ctop c2 ON b.doc_id = c2.doc_id)
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS INT)
         AS rank,
       rrf
FROM f QUALIFY rank <= 10 ORDER BY rank"""

  /** q91 oracle: PCA power iteration unrolled — fixed-point
    * per-dimension mean, centered corpus, then `iters` rounds of
    * w ← normalize(Σ (x̂·w) x̂) with the per-row accumulations
    * quantized to 2^20 longs (order-independent integer sums — the
    * same discipline as [[kmeansCtes]]), finishing with each
    * vector's projection onto the converged direction. */
  val pcaPower: String = {
    val iters = 3
    val sb = new StringBuilder
    sb ++= """
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
  WHERE vec_id < 2000),
ms AS (
  SELECT p.pos,
         sum(CAST(floor(e[p.pos] * 1048576.0 + 0.5) AS BIGINT)) AS sq,
         count(*) AS n
  FROM v, range(1, 65) p(pos) GROUP BY 1),
mm AS (SELECT list(CAST(sq AS DOUBLE) / 1048576.0 / CAST(n AS DOUBLE)
                   ORDER BY pos) AS m
       FROM ms),
c AS (
  SELECT vec_id, list(e[p.pos] - mm.m[p.pos] ORDER BY p.pos) AS e
  FROM v, mm, range(1, 65) p(pos) GROUP BY vec_id),
w0 AS (SELECT list_transform(range(1, 65), i -> 0.125) AS w),
"""
    for (i <- 1 to iters) {
      sb ++= s"""p$i AS (
  SELECT c.vec_id, c.e, list_dot_product(c.e, w${i - 1}.w) AS p
  FROM c, w${i - 1}),
s$i AS (
  SELECT q.pos,
         sum(CAST(floor(p * e[q.pos] * 1048576.0 + 0.5) AS BIGINT)) AS sq
  FROM p$i, range(1, 65) q(pos) GROUP BY 1),
u$i AS (SELECT list(CAST(sq AS DOUBLE) / 1048576.0 ORDER BY pos) AS s
        FROM s$i),
w$i AS (SELECT list_transform(s,
          x -> x / sqrt(list_dot_product(s, s))) AS w
        FROM u$i),
"""
    }
    sb ++= s"""fin AS (
  SELECT c.vec_id, list_dot_product(c.e, w$iters.w) AS pc1_proj
  FROM c, w$iters)
SELECT vec_id, pc1_proj FROM fin ORDER BY vec_id"""
    sb.toString
  }

  /** Twin of Timeseries.gapFillLocf: last event per (user, day) by
    * (ts, event_id), per-user daily spine, LOCF via IGNORE NULLS
    * last_value. Values ride through untouched — no re-aggregation
    * arithmetic — so the fill is bit-exact across engines. */
  val gapFillLocf: String = """
WITH obs0 AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day, value,
         row_number() OVER (
           PARTITION BY user_id, CAST(date_trunc('day', ts) AS DATE)
           ORDER BY ts DESC, event_id DESC) AS rn
  FROM events WHERE user_id < 40),
obs AS (SELECT user_id, day, value FROM obs0 WHERE rn = 1),
spine AS (
  SELECT user_id,
         CAST(UNNEST(generate_series(CAST(min(day) AS TIMESTAMP),
                                     CAST(max(day) AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS day
  FROM obs GROUP BY user_id)
SELECT s.user_id, s.day,
       last_value(o.value IGNORE NULLS) OVER (
         PARTITION BY s.user_id ORDER BY s.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS value_filled,
       (o.value IS NULL) AS is_gap
FROM spine s LEFT JOIN obs o
  ON s.user_id = o.user_id AND s.day = o.day
ORDER BY s.user_id, s.day"""

  /** Twin of Analytics.eventTransitions: per-user LAG pairs, exact
    * counts, row-normalized per source type. The sum(n) window is
    * HUGEINT in DuckDB / LongType in Spark — both exact, and the
    * only IEEE op is the final division of the same two integers. */
  val eventTransitions: String = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events),
c AS (SELECT prev_type AS from_type, event_type AS to_type,
             count(*) AS n
      FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2)
SELECT from_type, to_type, n,
       CAST(n AS DOUBLE) /
         CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
FROM c ORDER BY from_type, to_type"""

  /** Twin of Timeseries.trailingFeatures: per-(user, day) daily
    * aggregate, then RANGE-framed trailing windows. Every aggregate
    * is order-independent (BIGINT sums, max, date diffs) — the
    * reason a trailing float MEAN is deliberately absent. */
  val trailingFeatures: String = """
WITH d AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
         count(*) AS n_events, max(value) AS day_max
  FROM events GROUP BY 1, 2)
SELECT user_id, day,
       CAST(sum(n_events) OVER w AS BIGINT) AS n_events_7d,
       max(day_max) OVER w AS max_value_7d,
       datediff('day', lag(day) OVER (PARTITION BY user_id
                                      ORDER BY day), day)
         AS days_since_prev
FROM d
WINDOW w AS (PARTITION BY user_id ORDER BY day
             RANGE BETWEEN INTERVAL 6 DAYS PRECEDING
                       AND CURRENT ROW)
ORDER BY user_id, day"""

  /** Twin of Validate.referentialAudit, BUILT from the same
    * [[Validate.starFkEdges]] list so the audited contract cannot
    * drift between engines. NOT EXISTS ≡ the Spark side's
    * null-key-never-matches left join. */
  val referentialAudit: String = Validate.starFkEdges.map { e =>
    s"""SELECT '${e.child}' AS child_table, '${e.fkCol}' AS fk_col,
       '${e.parent}' AS parent_table,
  (SELECT count(*) FROM ${e.child}) AS n_rows,
  (SELECT count(*) FROM ${e.child}
     WHERE ${e.fkCol} IS NULL) AS n_null_fk,
  (SELECT count(*) FROM (SELECT DISTINCT ${e.fkCol} AS k
                         FROM ${e.child}
                         WHERE ${e.fkCol} IS NOT NULL) f
     WHERE NOT EXISTS (SELECT 1 FROM ${e.parent} p
                       WHERE p.${e.pkCol} = f.k)) AS n_orphan_keys,
  (SELECT count(*) FROM ${e.child} c
     WHERE c.${e.fkCol} IS NOT NULL
       AND NOT EXISTS (SELECT 1 FROM ${e.parent} p
                       WHERE p.${e.pkCol} = c.${e.fkCol}))
    AS n_orphan_rows"""
  }.mkString("", "\nUNION ALL\n", "\nORDER BY child_table, fk_col")

  /** q186 oracle: funnel paths replayed as brute-force interval
    * joins + (ts, id) argmin per hop — valid because "first within
    * the cap" ≡ "first overall, nulled beyond the cap", and the
    * argmin tie order (ts, event_id) ASC is exactly the Spark side's
    * smallest-payload forward-as-of rule. A null stage-1 anchor
    * yields null join conditions → no match → stage 2 nulls — the
    * same dead-stage propagation. */
  val funnelPaths: String = """
WITH s0 AS (
  SELECT user_id, event_id AS s0_id, ts AS s0_ts
  FROM events WHERE event_type = 'view'),
j1 AS (
  SELECT s0.user_id, s0.s0_id, s0.s0_ts,
         b.event_id AS s1_id, b.ts AS s1_ts,
         row_number() OVER (PARTITION BY s0.s0_id
           ORDER BY b.ts, b.event_id) AS rn
  FROM s0 LEFT JOIN events b
    ON b.user_id = s0.user_id AND b.event_type = 'click'
   AND b.ts > s0.s0_ts AND b.ts <= s0.s0_ts + INTERVAL 3 DAY),
s1 AS (SELECT user_id, s0_id, s0_ts, s1_id, s1_ts FROM j1 WHERE rn = 1),
j2 AS (
  SELECT s1.*, c.event_id AS s2_id, c.ts AS s2_ts,
         row_number() OVER (PARTITION BY s1.s0_id
           ORDER BY c.ts, c.event_id) AS rn
  FROM s1 LEFT JOIN events c
    ON c.user_id = s1.user_id AND c.event_type = 'purchase'
   AND c.ts > s1.s1_ts AND c.ts <= s1.s1_ts + INTERVAL 3 DAY),
s2 AS (SELECT user_id, s0_id, s0_ts, s1_id, s1_ts, s2_id, s2_ts
       FROM j2 WHERE rn = 1)
SELECT user_id, s0_id, s0_ts, s1_id, s1_ts, s2_id, s2_ts,
       CAST(1 + (CASE WHEN s1_id IS NOT NULL THEN 1 ELSE 0 END)
              + (CASE WHEN s2_id IS NOT NULL THEN 1 ELSE 0 END)
         AS BIGINT) AS completed_stages
FROM s2 ORDER BY s0_id"""

  /** q185 oracle: robust volume anomalies replayed — the identical
    * two-middle-rank median arithmetic (2·median as an integer sum,
    * dev2 = |2n − med2|, mad4 = 2·median(dev2)), the integer flag
    * rule 2·dev2 > 5·mad4, identical (value, day) tie order, and
    * the single IEEE division at the output boundary. The salt (5×
    * click burst on 2024-01-15) replays verbatim. */
  val volumeAnomalies: String = """
WITH ev AS (
  SELECT event_id, ts, event_type FROM events
  UNION ALL
  SELECT event_id + i.i * 10000000, ts, event_type
  FROM events, range(1, 5) i(i)
  WHERE event_type = 'click'
    AND CAST(date_trunc('day', ts) AS DATE) = DATE '2024-01-15'),
d AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         count(*) AS n_events
  FROM ev GROUP BY 1, 2),
r1 AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
              ORDER BY n_events, day) AS rn,
         count(*) OVER (PARTITION BY event_type) AS cnt
  FROM d),
m1 AS (
  SELECT event_type,
         sum(CASE WHEN rn = CAST(ceil(cnt / 2.0) AS INTEGER)
             THEN n_events ELSE 0 END)
       + sum(CASE WHEN rn = CAST(floor(cnt / 2.0) AS INTEGER) + 1
             THEN n_events ELSE 0 END) AS med2
  FROM r1 GROUP BY 1),
dv AS (
  SELECT d.event_type, d.day, d.n_events, m1.med2,
         abs(2 * d.n_events - m1.med2) AS dev2
  FROM d JOIN m1 USING (event_type)),
r2 AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
              ORDER BY dev2, day) AS rn,
         count(*) OVER (PARTITION BY event_type) AS cnt
  FROM dv),
m2 AS (
  SELECT event_type,
         sum(CASE WHEN rn = CAST(ceil(cnt / 2.0) AS INTEGER)
             THEN dev2 ELSE 0 END)
       + sum(CASE WHEN rn = CAST(floor(cnt / 2.0) AS INTEGER) + 1
             THEN dev2 ELSE 0 END) AS mad4
  FROM r2 GROUP BY 1)
SELECT dv.event_type, dv.day, CAST(dv.n_events AS BIGINT) AS n_events,
       CAST(dv.med2 AS DOUBLE) / 2.0 AS median_n,
       CAST(m2.mad4 AS DOUBLE) / 4.0 AS mad_n,
       CASE WHEN m2.mad4 <> 0 THEN
         (2.0 * CAST(dv.dev2 AS DOUBLE)) / CAST(m2.mad4 AS DOUBLE) END
         AS robust_score,
       (2 * dv.dev2 > 5 * m2.mad4) AS is_anomaly
FROM dv JOIN m2 USING (event_type)
ORDER BY event_type, day"""

  /** q184 oracle: the sign-LSH multi-probe ANN pipeline replayed
    * from first principles — the q123 md5-twin playbook on the LAST
    * rows-only family. Plane components from md5('t|p|i') (5 hex
    * digits → n/2¹⁹ − 1, exact binary rationals), projections via
    * list_dot_product (order-identical to Spark's sequential-fold
    * dot, proven by every ANN oracle since q28), per-table sign
    * buckets, multi-probe = the 7 lowest-score 1-/2-plane flips
    * where score = Σ ⌊proj²·2²⁰⌋ as BIGINT (exact integer sums —
    * order-free, where a float Σ margin² would hash-diverge), ties
    * on mask; candidates = bucket joins, rerank = exact cosine. */
  val lshMd5TopK: String = """
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
q AS (SELECT * FROM v WHERE vec_id < 50),
hx AS (
  SELECT t.t, p.p, i.i,
         md5(t.t || '|' || p.p || '|' || i.i) AS h
  FROM range(0, 4) t(t), range(0, 6) p(p), range(0, 64) i(i)),
pl AS (
  SELECT t, p, list(
      CAST((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 65536
         + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 4096
         + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 256
         + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substr(h, 5, 1)) - 1)
        AS DOUBLE) / 524288.0 - 1.0 ORDER BY i) AS plane
  FROM hx GROUP BY t, p),
pr AS (
  SELECT v.vec_id, pl.t, pl.p,
         list_dot_product(v.e, pl.plane) AS proj
  FROM v, pl),
bk AS (
  SELECT vec_id, t,
         sum(CASE WHEN proj > 0
             THEN CAST(1 << CAST(p AS INTEGER) AS BIGINT)
             ELSE 0 END) AS bucket
  FROM pr GROUP BY 1, 2),
mg AS (
  SELECT pr.vec_id, pr.t, pr.p,
         CAST(floor(pr.proj * pr.proj * 1048576.0) AS BIGINT) AS ml
  FROM pr JOIN q ON q.vec_id = pr.vec_id),
mk AS (
  SELECT CAST(1 << CAST(a.a AS INTEGER) AS BIGINT) AS mask
  FROM range(0, 6) a(a)
  UNION ALL
  SELECT CAST((1 << CAST(a.a AS INTEGER))
            | (1 << CAST(b.b AS INTEGER)) AS BIGINT)
  FROM range(0, 6) a(a), range(0, 6) b(b) WHERE b.b > a.a),
sc AS (
  SELECT mg.vec_id, mg.t, mk.mask, sum(mg.ml) AS score
  FROM mg JOIN mk ON ((mk.mask >> CAST(mg.p AS INTEGER)) & 1) = 1
  GROUP BY 1, 2, 3),
fl AS (
  SELECT vec_id, t, mask,
         row_number() OVER (PARTITION BY vec_id, t
                            ORDER BY score, mask) AS rn
  FROM sc),
qb AS (
  SELECT b.vec_id, b.t, b.bucket
  FROM bk b JOIN q ON q.vec_id = b.vec_id
  UNION
  SELECT f.vec_id, f.t, xor(b.bucket, f.mask) AS bucket
  FROM fl f JOIN bk b ON b.vec_id = f.vec_id AND b.t = f.t
  WHERE f.rn <= 7),
cand AS (
  SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id AS corpus_id
  FROM qb JOIN bk cb ON cb.t = qb.t AND cb.bucket = qb.bucket
  WHERE cb.vec_id <> qb.vec_id),
scored AS (
  SELECT cand.query_id, cand.corpus_id,
         list_dot_product(qe.e, ce.e)
           / (sqrt(list_dot_product(qe.e, qe.e))
              * sqrt(list_dot_product(ce.e, ce.e))) AS cosine_sim
  FROM cand JOIN v qe ON qe.vec_id = cand.query_id
            JOIN v ce ON ce.vec_id = cand.corpus_id),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine_sim DESC, corpus_id) AS "rank"
  FROM scored)
SELECT query_id, CAST("rank" AS INT) AS "rank", corpus_id, cosine_sim
FROM ranked WHERE "rank" <= 5 ORDER BY query_id, "rank""""

  /** Twin of Attribution.lastTouch (7-day horizon): brute-force
    * interval left join + argmax replay of the probe-union-window
    * scale path. Tie order (view_ts DESC, view_event_id DESC) ≡ the
    * Spark side's lexicographically-greatest-payload rule; the
    * half-open window (ts − 7d, ts] is the operator's contract.
    * Gap in MICROseconds — date_diff('microsecond') ≡ unix_micros
    * subtraction, both exact integer arithmetic (a seconds-grain
    * diff would round differently across engines). */
  val attributionLastTouch: String = """
WITH p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
v AS (
  SELECT user_id, ts AS view_ts, event_id AS view_event_id
  FROM events WHERE event_type = 'view'),
j AS (
  SELECT p.event_id, p.user_id, p.ts, v.view_ts, v.view_event_id
  FROM p LEFT JOIN v
    ON p.user_id = v.user_id
   AND v.view_ts > p.ts - INTERVAL 7 DAY
   AND v.view_ts <= p.ts),
r AS (
  SELECT *,
    row_number() OVER (PARTITION BY event_id
      ORDER BY view_ts DESC, view_event_id DESC) AS rn,
    CAST(count(view_ts) OVER (PARTITION BY event_id) AS BIGINT)
      AS n_touches
  FROM j)
SELECT event_id, user_id, ts, view_ts, view_event_id, n_touches,
       date_diff('microsecond', view_ts, ts) AS touch_gap_us
FROM r WHERE rn = 1 ORDER BY event_id"""

  /** Twin of Attribution.touchPairs — the pair-level contract the
    * streaming stream-stream interval join is also proven against
    * (AttributionStreamSpec). Plain interval join; every qualifying
    * (purchase, view) pair in the half-open 7-day window. */
  val attributionPairs: String = """
WITH p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
v AS (
  SELECT user_id, ts AS view_ts, event_id AS view_event_id
  FROM events WHERE event_type = 'view')
SELECT p.user_id, p.event_id, p.ts, v.view_ts, v.view_event_id
FROM p JOIN v
  ON p.user_id = v.user_id
 AND v.view_ts > p.ts - INTERVAL 7 DAY
 AND v.view_ts <= p.ts
ORDER BY event_id, view_event_id"""

  /** q198 oracle: the ONE-SHOT moment aggregate (the q188 pattern for
    * second moments) — cents as BIGINT, Σx/Σx² in HUGEINT
    * (≡ decimal(38,0): a BIGINT Σx² wraps), the identical
    * variance/mean closed form at the double boundary. */
  val incrementalVariance: String = """
WITH c AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
         CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
  FROM orders),
a AS (
  SELECT order_month, CAST(count(*) AS BIGINT) AS n_rows,
         sum(CAST(cents AS HUGEINT)) AS sx,
         sum(CAST(cents AS HUGEINT) * CAST(cents AS HUGEINT)) AS sxx
  FROM c GROUP BY 1)
SELECT order_month, n_rows,
       CAST(sx AS DOUBLE) / CAST(n_rows AS DOUBLE) / 100.0 AS mean_price,
       CAST(CAST(n_rows AS HUGEINT) * sxx - sx * sx AS DOUBLE)
         / CAST(CAST(n_rows AS HUGEINT) * CAST(n_rows AS HUGEINT)
             AS DOUBLE)
         / 10000.0 AS var_price
FROM a ORDER BY order_month"""

  /** q196 oracle: the hierarchy walk in DuckDB's own recursive CTE —
    * identical seed (k < 8, depth 0) and step (parent = child // 8);
    * `//` is DuckDB's integer division where Spark writes DIV. */
  val recursiveTree: String = """
WITH RECURSIVE anc(k, parent, depth) AS (
  SELECT o_orderkey AS k, CAST(NULL AS BIGINT) AS parent,
         CAST(0 AS BIGINT) AS depth
  FROM orders WHERE o_orderkey < 8
  UNION ALL
  SELECT o.o_orderkey AS k, a.k AS parent, a.depth + 1 AS depth
  FROM orders o JOIN anc a ON o.o_orderkey // 8 = a.k
  WHERE o.o_orderkey >= 8)
SELECT k, parent, depth FROM anc ORDER BY k"""

  /** q194 oracle: grouped average precision replayed — the q89 score
    * tree verbatim, the explicit (score DESC, doc_id ASC) total
    * order, each precision@k term as the integer
    * (cum_pos·2²⁰) // rank, one boundary division, NULL when a group
    * has no positives. */
  val avgPrecision: String = """
WITH t AS (
  SELECT doc_id, source, lang = 'en' AS y,
         string_split_regex(trim(text), ' +') AS toks, text
  FROM documents),
f AS (
  SELECT doc_id, source, y,
         CAST(len(toks) AS DOUBLE) AS n_tok,
         CAST(len(list_filter(toks,
           x -> x IN ('the', 'a', 'of', 'and', 'is', 'to')))
           AS DOUBLE) AS n_stop,
         CAST(len(list_distinct(toks)) AS DOUBLE) AS n_dist,
         CAST(length(text) - (len(toks) - 1) AS DOUBLE) AS word_chars
  FROM t),
s AS (
  SELECT doc_id, source, y,
         -3.5 + 8.0 * (n_stop / n_tok) - 0.25 * (word_chars / n_tok)
           + 2.0 * (n_dist / n_tok) + 0.5 * (n_tok / 100.0) AS score
  FROM f),
r AS (
  SELECT source, y,
         row_number() OVER w AS rank,
         sum(CASE WHEN y THEN 1 ELSE 0 END) OVER (
           PARTITION BY source ORDER BY score DESC, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pos
  FROM s WINDOW w AS (PARTITION BY source ORDER BY score DESC, doc_id)),
a AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
         sum(CASE WHEN y THEN (cum_pos * 1048576) // rank
             ELSE 0 END) AS ap_fixed
  FROM r GROUP BY 1)
SELECT source, n, n_pos,
       CASE WHEN n_pos > 0 THEN
         CAST(ap_fixed AS DOUBLE)
           / CAST(n_pos * 1048576 AS DOUBLE)
       END AS avg_precision
FROM a ORDER BY source"""

  /** q195 oracle: the threshold decision judged against the q79 rule
    * battery — q147's score and rule CTEs verbatim, integer
    * confusion counts, three boundary divisions with NULL on empty
    * denominators. */
  val classifierPr: String = """
WITH t AS (
  SELECT doc_id, source, text,
         string_split_regex(trim(text), ' +') AS toks
  FROM documents),
f AS (
  SELECT doc_id, source,
         CAST(len(toks) AS DOUBLE) AS n_tok,
         CAST(len(list_filter(toks,
           x -> x IN ('the', 'a', 'of', 'and', 'is', 'to')))
           AS DOUBLE) AS n_stop,
         CAST(len(list_distinct(toks)) AS DOUBLE) AS n_dist,
         CAST(length(text) - (len(toks) - 1) AS DOUBLE) AS word_chars
  FROM t),
s AS (
  SELECT doc_id, source,
         (-3.5 + 8.0 * (n_stop / n_tok) - 0.25 * (word_chars / n_tok)
           + 2.0 * (n_dist / n_tok) + 0.5 * (n_tok / 100.0)) >= 0.0
           AS pred
  FROM f),
m AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(length(text) - len(toks) + 1 AS DOUBLE) / len(toks)
           AS mean_word_len,
         CAST(len(list_filter(toks,
           x -> x IN ('the', 'a', 'of', 'and', 'is', 'to'))) AS BIGINT)
           AS n_stopwords,
         CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
           AS distinct_ratio
  FROM t),
y AS (
  SELECT doc_id,
         ((n_tokens >= 20 AND n_tokens <= 90)
          AND (mean_word_len >= 4.0 AND mean_word_len <= 10.0)
          AND (n_stopwords >= 2) AND (distinct_ratio >= 0.35)) AS y
  FROM m),
a AS (
  SELECT s.source,
         CAST(sum(CASE WHEN s.pred AND y.y THEN 1 ELSE 0 END)
           AS BIGINT) AS tp,
         CAST(sum(CASE WHEN s.pred AND NOT y.y THEN 1 ELSE 0 END)
           AS BIGINT) AS fp,
         CAST(sum(CASE WHEN NOT s.pred AND y.y THEN 1 ELSE 0 END)
           AS BIGINT) AS fn,
         CAST(sum(CASE WHEN NOT s.pred AND NOT y.y THEN 1 ELSE 0 END)
           AS BIGINT) AS tn
  FROM s JOIN y ON y.doc_id = s.doc_id GROUP BY 1)
SELECT source, tp, fp, fn, tn,
       CASE WHEN tp + fp > 0 THEN
         CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END AS precision,
       CASE WHEN tp + fn > 0 THEN
         CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END AS recall,
       CASE WHEN 2 * tp + fp + fn > 0 THEN
         CAST(2 * tp AS DOUBLE) / CAST(2 * tp + fp + fn AS DOUBLE)
       END AS f1
FROM a ORDER BY source"""

  /** q193 oracle: the Pearson matrix replayed — identical zero-filled
    * day×type grid, HUGEINT sums (≡ decimal(38,0)), the identical
    * closed-form expression tree (casts of exact integers, two
    * correctly-rounded sqrts, one multiply, one divide), NULL on
    * zero variance. */
  val typeCorrelation: String = """
WITH d AS (
  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day FROM events),
t AS (SELECT DISTINCT event_type FROM events),
c AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
         count(*) AS n
  FROM events GROUP BY 1, 2),
g AS (
  SELECT d.day, t.event_type, coalesce(c.n, 0) AS n
  FROM d CROSS JOIN t
  LEFT JOIN c ON c.day = d.day AND c.event_type = t.event_type),
p AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         count(*) AS n_days,
         sum(CAST(a.n AS HUGEINT)) AS sx,
         sum(CAST(b.n AS HUGEINT)) AS sy,
         sum(CAST(a.n AS HUGEINT) * CAST(b.n AS HUGEINT)) AS sxy,
         sum(CAST(a.n AS HUGEINT) * CAST(a.n AS HUGEINT)) AS sxx,
         sum(CAST(b.n AS HUGEINT) * CAST(b.n AS HUGEINT)) AS syy
  FROM g a JOIN g b ON a.day = b.day AND a.event_type < b.event_type
  GROUP BY 1, 2)
SELECT type_a, type_b, n_days,
       CASE WHEN (CAST(n_days AS HUGEINT) * sxx - sx * sx) > 0
             AND (CAST(n_days AS HUGEINT) * syy - sy * sy) > 0 THEN
         CAST(CAST(n_days AS HUGEINT) * sxy - sx * sy AS DOUBLE)
         / (sqrt(CAST(CAST(n_days AS HUGEINT) * sxx - sx * sx AS DOUBLE))
            * sqrt(CAST(CAST(n_days AS HUGEINT) * syy - sy * sy AS DOUBLE)))
       END AS r
FROM p ORDER BY type_a, type_b"""

  /** q192 oracle: golden record replayed — the identical per-field
    * struct-max (named-struct max ≡ Spark's max(struct(ts, tie, v)):
    * lexicographic, the unique tie means v never decides) under a
    * non-null FILTER, same deterministic null masking. */
  val goldenRecord: String = """
WITH r AS (
  SELECT o_custkey, o_orderdate AS ts, o_orderkey AS rid,
         CASE WHEN o_orderkey % 3 = 0 THEN NULL
              ELSE o_orderpriority END AS priority,
         CASE WHEN o_orderkey % 4 = 0 THEN NULL
              ELSE o_orderstatus END AS status,
         CASE WHEN o_orderkey % 5 = 0 THEN NULL
              ELSE o_totalprice END AS amount
  FROM orders)
SELECT o_custkey,
       (max({'ts': ts, 'tie': rid, 'v': priority})
          FILTER (priority IS NOT NULL)).v AS priority,
       (max({'ts': ts, 'tie': rid, 'v': status})
          FILTER (status IS NOT NULL)).v AS status,
       (max({'ts': ts, 'tie': rid, 'v': amount})
          FILTER (amount IS NOT NULL)).v AS amount,
       count(*) AS n_records,
       max(ts) AS last_updated
FROM r GROUP BY 1 ORDER BY 1"""

  /** q191 oracle: the overlap join replayed as sessionize (q31's CTE
    * verbatim) × distinct daily windows under the brute overlap
    * predicate — valid against the binned path because the
    * first-shared-bin rule emits each overlapping pair exactly once
    * and the residual predicate IS this predicate. Empty
    * (single-event) sessions are excluded on both sides: a
    * zero-length half-open interval is the empty set and overlaps
    * nothing. */
  val overlapJoin: String = """
WITH l AS (
  SELECT user_id, event_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_ts
  FROM events),
f AS (
  SELECT user_id, event_id, ts,
         CASE WHEN prev_ts IS NULL
                   OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM l),
s AS (
  SELECT user_id, ts,
         sum(new_session) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM f),
sess AS (
  SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
         count(*) AS n_events,
         min(ts) AS session_start, max(ts) AS session_end
  FROM s GROUP BY 1, 2),
wins AS (
  -- CAST: DuckDB date_trunc('day') yields DATE; Spark yields TIMESTAMP
  SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS win_start,
         CAST(date_trunc('day', ts) AS TIMESTAMP) + INTERVAL 6 HOUR
           AS win_end
  FROM events)
SELECT user_id, session_id, n_events, session_start, session_end,
       win_start, win_end,
       epoch_us(least(session_end, win_end))
         - epoch_us(greatest(session_start, win_start)) AS overlap_micros
FROM sess JOIN wins
  ON session_end > session_start
 AND session_start < win_end AND win_start < session_end
ORDER BY user_id, session_id, win_start"""

  /** q189 oracle: grouped ROC-AUC replayed — the q89 classifier
    * score expression VERBATIM (same IEEE tree), then the identical
    * rank-sum arithmetic: per-(source, score) tie blocks, doubled
    * average rank 2·cum_before + n + 1 as integers, 2R⁺ summed in
    * HUGEINT (≡ Spark's decimal(38,0)), one boundary division,
    * NULL on degenerate groups. */
  val rocAuc: String = """
WITH t AS (
  SELECT source, lang = 'en' AS y,
         string_split_regex(trim(text), ' +') AS toks, text
  FROM documents),
f AS (
  SELECT source, y,
         CAST(len(toks) AS DOUBLE) AS n_tok,
         CAST(len(list_filter(toks,
           x -> x IN ('the', 'a', 'of', 'and', 'is', 'to')))
           AS DOUBLE) AS n_stop,
         CAST(len(list_distinct(toks)) AS DOUBLE) AS n_dist,
         CAST(length(text) - (len(toks) - 1) AS DOUBLE) AS word_chars
  FROM t),
s AS (
  SELECT source, y,
         -3.5 + 8.0 * (n_stop / n_tok) - 0.25 * (word_chars / n_tok)
           + 2.0 * (n_dist / n_tok) + 0.5 * (n_tok / 100.0) AS score
  FROM f),
b AS (
  SELECT source, score, count(*) AS n,
         sum(CASE WHEN y THEN 1 ELSE 0 END) AS n_pos
  FROM s GROUP BY 1, 2),
c AS (
  SELECT *, coalesce(sum(n) OVER (PARTITION BY source ORDER BY score
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_before
  FROM b),
a AS (
  SELECT source, CAST(sum(n) AS BIGINT) AS n_total,
         CAST(sum(n_pos) AS BIGINT) AS np,
         sum(CAST(n_pos AS HUGEINT)
             * CAST(2 * cum_before + n + 1 AS HUGEINT)) AS sum2r
  FROM c GROUP BY 1)
SELECT source, n_total AS n, np AS n_pos,
       n_total - np AS n_neg,
       CASE WHEN np > 0 AND n_total - np > 0 THEN
         CAST(sum2r - CAST(np AS HUGEINT) * CAST(np + 1 AS HUGEINT)
           AS DOUBLE)
         / CAST(CAST(2 AS HUGEINT) * CAST(np AS HUGEINT)
             * CAST(n_total - np AS HUGEINT) AS DOUBLE)
       END AS auc
FROM a ORDER BY source"""

  /** q188 oracle: the ONE-SHOT monthly aggregate — deliberately NOT
    * the split-and-merge path the Spark side takes. Hash equality
    * proves incremental Gold maintenance (stored partial ⊕ delta
    * partial) reproduces the full-history aggregate exactly: decimal
    * sums, counts and min/max merge order-independently, and the avg
    * divides the identical double operands at the output boundary. */
  val incrementalGold: String = """
SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS revenue,
       CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS min_price,
       CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS max_price,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         / count(*) AS avg_price
FROM orders
GROUP BY 1 ORDER BY 1"""

  /** q187 oracle: SCD-2 history replayed as the identical two-window
    * closed form — lag marks run openers (rn=1 folds in via IS
    * DISTINCT FROM against a NULL prev when event_type is non-null,
    * but stays explicit for robustness), lead over the openers chains
    * effective_to; (ts, event_id) is the total order both engines
    * share. */
  val scd2History: String = """
WITH o AS (
  SELECT user_id, ts, event_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
           ORDER BY ts, event_id) AS prev,
         row_number() OVER (PARTITION BY user_id
           ORDER BY ts, event_id) AS rn
  FROM events),
runs AS (
  SELECT user_id, ts, event_id, event_type FROM o
  WHERE rn = 1 OR prev IS DISTINCT FROM event_type)
SELECT user_id, event_type,
       ts AS effective_from,
       lead(ts) OVER w AS effective_to,
       lead(ts) OVER w IS NULL AS is_current,
       row_number() OVER w AS version_seq
FROM runs
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, version_seq"""
}
