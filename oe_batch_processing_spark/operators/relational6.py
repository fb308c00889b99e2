"""Relational surface, part 6: interval coalescing (overlap islands),
URL parsing battery, bitwise/mode aggregates, and projection-position
EXISTS subqueries.

Interval coalescing is the range twin of sessionization: sessions merge
POINTS by gap threshold, this merges RANGES by actual overlap — the
dominant shape for availability windows, maintenance periods, and
validity-range compaction. The URL battery pins ``parse_url``'s
component semantics (the log-analytics workhorse) against a regexp
re-derivation. Bitwise aggregates are the flag-mask rollup; Spark's
``mode(x, deterministic=true)`` breaks count ties by LOWEST value, which
the oracle reproduces explicitly since DuckDB's own ``mode`` tie-break
is unspecified. Projection EXISTS turns the filter-position subquery
family (subqueries in relational2.py) into boolean COLUMNS — Catalyst
plans each as a left-semi-style existence join, not a per-row probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from oe_batch_processing_spark.registry import query
from oe_batch_processing_spark.tables import load_table, register_views


@query(
    "intervals_coalesce_shipping",
    oracle="""
    WITH iv AS (
      SELECT l_suppkey, l_shipdate AS s,
             l_shipdate + INTERVAL (l_orderkey % 20) DAY AS e
      FROM lineitem
    ),
    marked AS (
      SELECT l_suppkey, s, e,
             CASE WHEN s > MAX(e) OVER (PARTITION BY l_suppkey ORDER BY s, e
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS new_island
      FROM iv
    ),
    islands AS (
      SELECT l_suppkey, s, e,
             SUM(new_island) OVER (PARTITION BY l_suppkey ORDER BY s, e
                                   ROWS UNBOUNDED PRECEDING) AS island_id
      FROM marked
    ),
    per_island AS (
      SELECT l_suppkey, island_id,
             MIN(s) AS island_start, MAX(e) AS island_end,
             COUNT(*) AS n_intervals
      FROM islands GROUP BY l_suppkey, island_id
    )
    SELECT l_suppkey,
           COUNT(*) AS n_islands,
           CAST(SUM(n_intervals) AS BIGINT) AS n_intervals,
           strftime(MIN(island_start), '%Y-%m-%d') AS first_start,
           strftime(MAX(island_end), '%Y-%m-%d') AS last_end,
           CAST(SUM(date_diff('day', island_start, island_end) + 1)
                AS BIGINT) AS covered_days
    FROM per_island GROUP BY l_suppkey
    """,
)
def intervals_coalesce_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval coalescing (overlap islands): per supplier, merge the
    [shipdate, receiptdate] ranges of its lineitems into maximal
    non-overlapping islands, reporting island count and exact covered
    days. The range twin of sessionization — an interval starts a new
    island only when it begins strictly after EVERYTHING seen so far has
    ended (running max of end, not lag(end): an earlier long interval
    can swallow several later short ones, the case naive gap logic gets
    wrong).

    Scale: one hash shuffle on the partition key; both window passes and
    the two-level aggregation share that single partitioning (one
    Exchange in the plan). Dates are day-integers, so coverage math is
    engine-exact.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.col("l_shipdate").cast("date").alias("s"),
        # testdata lineitem carries no receiptdate; synthesize a
        # deterministic transit time so islands genuinely overlap
        F.date_add(
            F.col("l_shipdate").cast("date"),
            (F.col("l_orderkey") % 20).cast("int"),
        ).alias("e"),
    )
    w = Window.partitionBy("l_suppkey").orderBy("s", "e")
    prev_max_e = F.max("e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = li.withColumn(
        "new_island",
        F.when(F.col("s") > prev_max_e, F.lit(1)).otherwise(F.lit(0)),
    )
    islands = marked.withColumn(
        "island_id",
        F.sum("new_island").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    per_island = islands.groupBy("l_suppkey", "island_id").agg(
        F.min("s").alias("island_start"),
        F.max("e").alias("island_end"),
        F.count(F.lit(1)).alias("n_intervals"),
    )
    return per_island.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum("n_intervals").alias("n_intervals"),
        F.date_format(F.min("island_start"), "yyyy-MM-dd").alias("first_start"),
        F.date_format(F.max("island_end"), "yyyy-MM-dd").alias("last_end"),
        F.sum(
            F.datediff(F.col("island_end"), F.col("island_start")) + 1
        ).alias("covered_days"),
    )


@query(
    "scalar_url_parse_battery",
    oracle="""
    WITH u AS (
      SELECT o_orderkey,
             'https://shop' || CAST(o_custkey % 5 AS VARCHAR)
               || '.example.com:844' || CAST(o_orderkey % 10 AS VARCHAR)
               || '/cat/' || lower(replace(o_orderpriority, ' ', '-'))
               || '/item?order=' || CAST(o_orderkey AS VARCHAR)
               || '&status=' || o_orderstatus
               || '#frag' || CAST(o_orderkey % 3 AS VARCHAR) AS url
      FROM orders
    )
    SELECT o_orderkey,
           regexp_extract(url, '^([a-z]+)://', 1) AS proto,
           regexp_extract(url, '^[a-z]+://([^/:?#]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS path,
           regexp_extract(url, '\\?([^#]*)', 1) AS query,
           regexp_extract(url, 'order=([^&#]*)', 1) AS order_param,
           regexp_extract(url, '#(.*)$', 1) AS frag
    FROM u
    """,
)
def scalar_url_parse_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``parse_url`` component battery: synthesize a URL per order (host
    with port, multi-segment path, two query params, fragment), then
    extract PROTOCOL / HOST / PATH / QUERY / QUERY-param / REF natively.
    The oracle re-derives every component with regexes, pinning the exact
    component boundaries (HOST excludes the port; PATH starts at the
    first slash; QUERY excludes '?' and the fragment; REF excludes '#')
    — the semantics log-pipeline code silently assumes.

    Scale: pure codegen projection, no shuffle; ``parse_url`` is the JVM
    fast path vs the regexp UDF a naive port would reach for.
    """
    o = load_table(spark, sf_dir, "orders")
    url = F.concat(
        F.lit("https://shop"),
        (F.col("o_custkey") % 5).cast("string"),
        F.lit(".example.com:844"),
        (F.col("o_orderkey") % 10).cast("string"),
        F.lit("/cat/"),
        F.lower(F.regexp_replace("o_orderpriority", " ", "-")),
        F.lit("/item?order="),
        F.col("o_orderkey").cast("string"),
        F.lit("&status="),
        F.col("o_orderstatus"),
        F.lit("#frag"),
        (F.col("o_orderkey") % 3).cast("string"),
    )
    u = o.select("o_orderkey", url.alias("url"))
    return u.select(
        "o_orderkey",
        F.parse_url("url", F.lit("PROTOCOL")).alias("proto"),
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("order")).alias("order_param"),
        F.parse_url("url", F.lit("REF")).alias("frag"),
    )


@query(
    "agg_bitwise_mode",
    oracle="""
    WITH base AS (
      SELECT event_type, user_id,
             CAST(round(value * 100) AS BIGINT) % 10 AS digit
      FROM events
    ),
    md AS (
      SELECT event_type, digit, COUNT(*) AS n
      FROM base GROUP BY event_type, digit
    ),
    mode_pick AS (
      SELECT event_type, digit AS mode_digit
      FROM (SELECT event_type, digit,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY n DESC, digit) AS rk
            FROM md)
      WHERE rk = 1
    )
    SELECT b.event_type,
           bit_and(b.user_id) AS mask_and,
           bit_or(b.user_id) AS mask_or,
           bit_xor(b.user_id) AS mask_xor,
           ANY_VALUE(m.mode_digit) AS mode_digit
    FROM base b JOIN mode_pick m ON b.event_type = m.event_type
    GROUP BY b.event_type
    """,
)
def agg_bitwise_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregates (AND/OR/XOR masks over user ids — the flag-mask
    rollup for permission bits, feature flags, bloom-ish membership
    unions) plus ``mode(digit, deterministic=true)`` of the cents digit.
    Spark's deterministic mode breaks frequency ties by LOWEST value;
    DuckDB's tie-break is unspecified, so the oracle materializes the
    frequency table and picks (count DESC, value ASC) explicitly —
    pinning the exact tie rule rather than trusting either engine's
    default.

    Scale: all four aggregates fold in one hash agg pass (bitwise ops
    and mode's count-map are map-side combinable).
    """
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        "user_id",
        (F.round(F.col("value") * 100).cast("long") % 10).alias("digit"),
    )
    return e.groupBy("event_type").agg(
        F.bit_and("user_id").alias("mask_and"),
        F.bit_or("user_id").alias("mask_or"),
        F.bit_xor("user_id").alias("mask_xor"),
        F.expr("mode(digit, true)").alias("mode_digit"),
    )


@query(
    "subquery_exists_projection",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment,
           EXISTS(SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT') AS has_urgent,
           EXISTS(SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 300000) AS has_big_order
    FROM customer c
    """,
)
def subquery_exists_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS in PROJECTION position: per customer, boolean columns for
    "has an urgent order" and "has a >300k order" — the flag-building
    form of the existence subquery (the WHERE-position family lives in
    relational2.py). Catalyst rewrites each predicate into an existence
    join (a left join producing the boolean, deduplicated build side),
    NOT a per-row probe — two hash joins on o_custkey at any scale, and
    both share the orders scan.
    """
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_mktsegment,
               EXISTS(SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT') AS has_urgent,
               EXISTS(SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 300000) AS has_big_order
        FROM customer c
        """
    )


@query(
    "agg_ordered_set_percentiles",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           quantile_cont(value, 0.25) AS pc25,
           quantile_cont(value, 0.50) AS pc50,
           quantile_cont(value, 0.90) AS pc90,
           quantile_disc(value, 0.25) AS pd25,
           quantile_disc(value, 0.50) AS pd50,
           quantile_disc(value, 0.90) AS pd90
    FROM events GROUP BY event_type
    """,
)
def agg_ordered_set_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-set aggregates (SQL:2003 inverse distribution):
    ``percentile_cont`` (interpolating) and ``percentile_disc`` (actual
    element — the smallest value whose cumulative distribution reaches
    p) side by side at three probabilities. Pins that both engines place
    the disc/cont boundary identically on real double data — the
    semantics gap that silently shifts SLA percentiles when a pipeline
    migrates engines (cont invents values that never occurred; disc
    reports an occurred value but jumps discretely).

    Scale: exact percentiles sort within each group; the
    ``approx_percentile`` twin (``stats_percentile_approx``) is the
    sketch path when groups stop fitting a sort.
    """
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT event_type,
               COUNT(*) AS n,
               percentile_cont(0.25) WITHIN GROUP (ORDER BY value) AS pc25,
               percentile_cont(0.50) WITHIN GROUP (ORDER BY value) AS pc50,
               percentile_cont(0.90) WITHIN GROUP (ORDER BY value) AS pc90,
               percentile_disc(0.25) WITHIN GROUP (ORDER BY value) AS pd25,
               percentile_disc(0.50) WITHIN GROUP (ORDER BY value) AS pd50,
               percentile_disc(0.90) WITHIN GROUP (ORDER BY value) AS pd90
        FROM events GROUP BY event_type
        """
    )


@query(
    "alloc_largest_remainder",
    oracle="""
    WITH g AS (
      SELECT lang, source, COUNT(*) AS n_docs FROM documents
      GROUP BY lang, source
    ),
    t AS (
      SELECT lang, source, n_docs,
             (10000 * n_docs) // SUM(n_docs) OVER () AS base,
             (10000 * n_docs) % SUM(n_docs) OVER () AS rem
      FROM g
    ),
    r AS (
      SELECT lang, source, n_docs, base, rem,
             ROW_NUMBER() OVER (ORDER BY rem DESC, lang, source) AS rk,
             10000 - SUM(base) OVER () AS deficit
      FROM t
    )
    SELECT lang, source, n_docs,
           CAST(base + CASE WHEN rk <= deficit THEN 1 ELSE 0 END
                AS BIGINT) AS quota
    FROM r
    """,
)
def alloc_largest_remainder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder apportionment: split a fixed budget of 10,000
    sample slots across (lang, source) slices proportional to their doc
    counts, with the rounding deficit going to the largest fractional
    remainders (deterministic ties) — quotas sum to EXACTLY the budget,
    which plain rounding does not guarantee. The integer-exact quota
    assignment a downsampling or eval-set builder runs before sampling
    (``sample_stratified_documents`` is the sampling step that would
    consume these quotas).

    Scale: group counts are one map-side-combined shuffle; the
    apportionment itself runs on the |slices|-sized grid (window over a
    dimension-cardinality frame — negligible at any corpus size).
    """
    docs = load_table(spark, sf_dir, "documents")
    g = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n_docs"))
    w_all = Window.partitionBy()
    t = g.select(
        "lang",
        "source",
        "n_docs",
        F.expr("10000 * n_docs").alias("scaled"),
        F.sum("n_docs").over(w_all).alias("total"),
    ).select(
        "lang",
        "source",
        "n_docs",
        F.expr("scaled div total").alias("base"),
        (F.col("scaled") % F.col("total")).alias("rem"),
    )
    r = t.select(
        "lang",
        "source",
        "n_docs",
        "base",
        F.row_number()
        .over(Window.orderBy(F.col("rem").desc(), "lang", "source"))
        .alias("rk"),
        (F.lit(10000) - F.sum("base").over(w_all)).alias("deficit"),
    )
    return r.select(
        "lang",
        "source",
        "n_docs",
        (
            F.col("base")
            + F.when(F.col("rk") <= F.col("deficit"), 1).otherwise(0)
        ).alias("quota"),
    )


@query(
    "scalar_try_arith_battery",
    oracle="""
    WITH t AS (
      SELECT event_id, user_id,
             CAST(round(value * 100) AS BIGINT) AS cents,
             event_id % 7 AS den,
             CASE event_id % 3 WHEN 0 THEN CAST(event_id AS VARCHAR)
                               WHEN 1 THEN CAST(event_id AS VARCHAR) || 'x'
                               ELSE '' END AS numstr
      FROM events
    )
    SELECT event_id,
           cents // NULLIF(den, 0) AS safe_div,
           cents % NULLIF(den, 0) AS safe_mod,
           TRY_CAST(numstr AS BIGINT) AS parsed,
           CASE WHEN 9223372036854775807 - cents < cents THEN NULL
                ELSE cents + cents END AS safe_add_big
    FROM t
    """,
)
def scalar_try_arith_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``try_*`` permissive arithmetic battery: division/modulo by zero,
    malformed numeric strings, and (construction-level) overflow all
    yield NULL instead of raising — the engine-native form of the
    reference's permissive coercion contract (lib/parsers.js
    ``Number('')``-family, O6 in SURVEY §2.1), which routes bad VALUES
    to null exactly as the outcome router routes bad ROWS to FAILED.
    DuckDB has no try_ arithmetic, so the oracle spells each case with
    NULLIF / TRY_CAST / an explicit overflow guard — pinning that the
    shortcuts agree with the explicit SQL.

    Scale: codegen projection; try_ variants cost the same as their
    throwing forms (a branch, no exception machinery on the hot path).
    """
    e = load_table(spark, sf_dir, "events")
    t = e.select(
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        (F.col("event_id") % 7).alias("den"),
        F.when(
            F.col("event_id") % 3 == 0, F.col("event_id").cast("string")
        )
        .when(
            F.col("event_id") % 3 == 1,
            F.concat(F.col("event_id").cast("string"), F.lit("x")),
        )
        .otherwise(F.lit(""))
        .alias("numstr"),
    )
    return t.select(
        "event_id",
        F.try_divide(F.col("cents"), F.nullif("den", F.lit(0)))
        .cast("long")
        .alias("safe_div"),
        F.try_mod(F.col("cents"), F.nullif("den", F.lit(0))).alias("safe_mod"),
        F.expr("try_cast(numstr AS BIGINT)").alias("parsed"),
        F.try_add(F.col("cents"), F.col("cents")).alias("safe_add_big"),
    )


@query(
    "events_pattern_sequence",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
               AS s
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           length(s) AS seq_len,
           len(regexp_extract_all(s, 'cp')) AS n_quick_conversions,
           CASE WHEN s LIKE '%cp%'
                THEN CAST(strpos(s, 'cp') AS BIGINT) ELSE 0 END
             AS first_quick_pos,
           regexp_matches(s, 'c.*v.*p') AS has_cvp_funnel,
           len(regexp_extract_all(s, 'e+')) AS n_error_bursts
    FROM seq
    """,
)
def events_pattern_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP-lite sequence pattern matching: collapse each user's ordered
    event history into a character sequence (one letter per type) and
    run PATTERNS over it — immediate click→purchase conversions
    (count + first position), a click…view…purchase funnel test, and
    error-burst runs. The regex-over-sequence trick turns "events
    A then B then C in order" questions into string matching — the poor
    man's MATCH_RECOGNIZE, and often all a funnel analysis needs.
    Ordering ties break on event_id, so the sequence string — and every
    match — is engine-deterministic.

    Scale: one shuffle to order each user's history (the same exchange
    every per-user window op pays); per-user sequences are session-sized.
    For multi-GB single users, segment the sequence by day first (the
    pattern window rarely spans months).
    """
    e = load_table(spark, sf_dir, "events")
    register_views(spark, sf_dir)
    seq = (
        e.groupBy("user_id")
        .agg(
            F.expr(
                "listagg(substring(event_type, 1, 1), '') "
                "WITHIN GROUP (ORDER BY ts, event_id)"
            ).alias("s")
        )
    )
    return seq.select(
        "user_id",
        F.length("s").alias("seq_len"),
        F.regexp_count("s", F.lit("cp")).alias("n_quick_conversions"),
        F.when(
            F.col("s").contains("cp"),
            F.instr(F.col("s"), "cp").cast("long"),
        )
        .otherwise(F.lit(0))
        .alias("first_quick_pos"),
        F.col("s").rlike("c.*v.*p").alias("has_cvp_funnel"),
        F.regexp_count("s", F.lit("e+")).alias("n_error_bursts"),
    )


@query(
    "join_range_pure_bucketized",
    oracle="""
    SELECT o.o_orderkey,
           COUNT(l.l_orderkey) AS n_shipped_in_window
    FROM orders o
    LEFT JOIN lineitem l
      ON l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate < o.o_orderdate + INTERVAL 7 DAY
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY o.o_orderkey
    """,
)
def join_range_pure_bucketized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PURE range join (no equi key) via the bucketization rewrite: count
    ALL lineitems shipped inside each urgent order's 7-day window.
    Without an equi key Catalyst's only plan is BroadcastNestedLoopJoin —
    |orders| × |lineitems| predicate evaluations, the quadratic cliff
    every pipeline with a point-in-interval join eventually falls off.
    The rewrite: bucket time into interval-sized cells (7 days), explode
    each interval onto the <=2 cells it can span, equi-join points to
    intervals ON THE CELL, then re-verify the exact predicate. Join fan-in
    per cell is days-worth-of-data, the shuffle carries each row at most
    twice, and the plan becomes an ordinary hash join — the
    BroadcastNestedLoop never appears (the oracle runs the naive form,
    which DuckDB executes as an IEJoin; same relation, different planner
    escape hatch).

    Scale: cell width should match the interval length (one-interval ≈
    one-to-two cells); heavily skewed cells split under AQE like any hash
    join. This is the standard pattern for point-in-interval at 100 TB —
    also the IP-range lookup and sensor-windowing shape.
    """
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey", F.col("o_orderdate").cast("date").alias("od"))
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("item_key"),
        F.col("l_shipdate").cast("date").alias("sd"),
    )
    # weekly cells anchored at the epoch; a 7-day window spans <= 2 cells
    cell = lambda c: F.floor(F.unix_date(c) / 7)  # noqa: E731
    points = li.withColumn("cell", cell(F.col("sd")))
    intervals = o.withColumn(
        "cell", F.explode(F.sequence(cell(F.col("od")), cell(F.date_add("od", 6))))
    )
    matched = (
        intervals.join(points, "cell")
        .filter(
            (F.col("sd") >= F.col("od"))
            & (F.col("sd") < F.date_add(F.col("od"), 7))
        )
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n_shipped_in_window"))
    )
    # LEFT semantics: urgent orders with zero matches still appear
    return (
        o.select("o_orderkey")
        .join(matched, "o_orderkey", "left")
        .select(
            "o_orderkey",
            F.coalesce("n_shipped_in_window", F.lit(0)).alias(
                "n_shipped_in_window"
            ),
        )
    )


@query(
    "stats_chi2_type_dow",
    oracle="""
    WITH obs AS (
      SELECT event_type, CAST(dayofweek(ts) AS INT) AS dow,
             COUNT(*) AS o
      FROM events GROUP BY 1, 2
    ),
    tot AS (
      SELECT event_type, dow, o,
             SUM(o) OVER (PARTITION BY event_type) AS row_tot,
             SUM(o) OVER (PARTITION BY dow) AS col_tot,
             SUM(o) OVER () AS n
      FROM obs
    )
    SELECT event_type,
           COUNT(*) AS n_cells,
           CAST(SUM(CAST(
             (o - CAST(row_tot * col_tot AS DOUBLE) / n)
             * (o - CAST(row_tot * col_tot AS DOUBLE) / n)
             / (CAST(row_tot * col_tot AS DOUBLE) / n)
             AS DECIMAL(18,6))) AS DOUBLE) AS chi2_contrib
    FROM tot GROUP BY event_type
    """,
)
def stats_chi2_type_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared independence statistic for event_type × day-of-week:
    per-cell (observed − expected)²/expected contributions, aggregated
    per type — is activity mix independent of weekday? (The STATISTIC,
    engine-exact; mapping to a p-value is a table lookup downstream —
    the incomplete-gamma evaluation is the one piece that doesn't belong
    in a distributed scan.) Each cell term is an identical double
    expression both engines quantize to decimal before the
    order-independent sum — the ``stats_exact_moments`` convention
    applied to a contingency grid.

    Scale: one shuffle builds the contingency table; everything after
    runs on the |types| × 7 grid. The grid is mergeable (counts add), so
    per-partition tables union before the statistic — a one-pass
    monitor for "did this slice's weekly mix shift".
    """
    e = load_table(spark, sf_dir, "events")
    obs = e.groupBy(
        "event_type", F.dayofweek("ts").cast("int").alias("dow")
    ).agg(F.count(F.lit(1)).alias("o"))
    w_row = Window.partitionBy("event_type")
    w_col = Window.partitionBy("dow")
    w_all = Window.partitionBy()
    tot = obs.select(
        "event_type",
        "o",
        F.sum("o").over(w_row).alias("row_tot"),
        F.sum("o").over(w_col).alias("col_tot"),
        F.sum("o").over(w_all).alias("n"),
    )
    exp = (F.col("row_tot") * F.col("col_tot")).cast("double") / F.col("n")
    term = (F.col("o") - exp) * (F.col("o") - exp) / exp
    return tot.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum(term.cast("decimal(18,6)")).cast("double").alias("chi2_contrib"),
    )


@query(
    "ab_test_conversion_lift",
    oracle="""
    WITH arms AS (
      SELECT user_id,
             CASE WHEN CAST('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 2)
                       AS INT) % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM events GROUP BY user_id
    )
    SELECT
      CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS a_users,
      CAST(SUM(CASE WHEN arm = 'A' THEN converted ELSE 0 END) AS BIGINT)
        AS a_converted,
      CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS b_users,
      CAST(SUM(CASE WHEN arm = 'B' THEN converted ELSE 0 END) AS BIGINT)
        AS b_converted,
      CAST((1000000 * SUM(CASE WHEN arm = 'A' THEN converted ELSE 0 END))
        // SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS rate_a_ppm,
      CAST((1000000 * SUM(CASE WHEN arm = 'B' THEN converted ELSE 0 END))
        // SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS rate_b_ppm
    FROM arms
    """,
)
def ab_test_conversion_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users assigned to arms by a HASH-STABLE
    md5 coin (same salt convention as ``docs_train_val_test_split`` —
    re-running the pipeline never reassigns anyone), conversion = any
    purchase event, per-arm rates as ppm floor-division integers. The
    allocation-through-readout path every experimentation platform runs;
    hash assignment is what makes it reproducible across engines, runs,
    and retries — proven by the cross-engine hash match.

    Scale: one per-user aggregate (map-side combinable max), then a
    single global fold to the 1-row readout.
    """
    e = load_table(spark, sf_dir, "events")
    arm = F.when(
        F.conv(
            F.substring(F.md5(F.concat(F.lit("ab:"), F.col("user_id").cast("string"))), 1, 2),
            16,
            10,
        ).cast("int")
        % 2
        == 0,
        F.lit("A"),
    ).otherwise(F.lit("B"))
    arms = e.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    ).withColumn("arm", arm)
    a_conv = F.sum(F.when(F.col("arm") == "A", F.col("converted")).otherwise(0))
    a_n = F.sum(F.when(F.col("arm") == "A", 1).otherwise(0))
    b_conv = F.sum(F.when(F.col("arm") == "B", F.col("converted")).otherwise(0))
    b_n = F.sum(F.when(F.col("arm") == "B", 1).otherwise(0))
    return arms.agg(
        a_n.cast("long").alias("a_users"),
        a_conv.cast("long").alias("a_converted"),
        b_n.cast("long").alias("b_users"),
        b_conv.cast("long").alias("b_converted"),
        F.expr(
            "(1000000 * sum(CASE WHEN arm = 'A' THEN converted ELSE 0 END))"
            " div sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END)"
        ).alias("rate_a_ppm"),
        F.expr(
            "(1000000 * sum(CASE WHEN arm = 'B' THEN converted ELSE 0 END))"
            " div sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END)"
        ).alias("rate_b_ppm"),
    )


@query(
    "orders_open_backlog_daily",
    oracle="""
    WITH spans AS (
      SELECT o.o_orderkey, o.o_orderdate AS od, MAX(l.l_shipdate) AS sd
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    ),
    deltas AS (
      SELECT od AS day, 1 AS d FROM spans
      UNION ALL
      SELECT sd + INTERVAL 1 DAY AS day, -1 AS d FROM spans
    ),
    daily AS (
      SELECT day, CAST(SUM(d) AS BIGINT) AS net_change
      FROM deltas GROUP BY day
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           net_change,
           CAST(SUM(net_change) OVER (ORDER BY day
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS open_orders
    FROM daily
    """,
)
def orders_open_backlog_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sourced backlog curve: each order is open from its order
    date until its last item ships; the daily open-order count is the
    running sum of +1/−1 boundary deltas — the interval-counting /
    concurrency-curve pattern (open tickets, concurrent sessions,
    inventory on hand) that naive per-day recounting makes O(days ×
    orders). Delta encoding makes it one aggregate plus one running sum
    over |distinct days| rows.

    Scale: the span build is a keyed aggregate; deltas collapse to at
    most 2 rows per order then group to |days| rows, and the running sum
    runs over the day axis (thousands of rows at ANY fact volume). The
    curve is mergeable: partial delta tables add before the final scan.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("od")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_shipdate").cast("date").alias("sd")
    )
    spans = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey", "od")
        .agg(F.max("sd").alias("sd"))
    )
    deltas = spans.select(
        F.col("od").alias("day"), F.lit(1).alias("d")
    ).unionAll(
        spans.select(F.date_add("sd", 1).alias("day"), F.lit(-1).alias("d"))
    )
    daily = deltas.groupBy("day").agg(F.sum("d").cast("long").alias("net_change"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "net_change",
        F.sum("net_change").over(w).cast("long").alias("open_orders"),
    )


@query(
    "subquery_not_in_null_trap",
    oracle="""
    WITH keys AS (
      SELECT CASE WHEN event_type = 'error' THEN NULL ELSE user_id % 50 END
               AS k
      FROM events
    )
    SELECT
      (SELECT COUNT(*) FROM customer
       WHERE c_custkey NOT IN (SELECT k FROM keys)) AS n_not_in_with_null,
      (SELECT COUNT(*) FROM customer
       WHERE c_custkey NOT IN (SELECT k FROM keys WHERE k IS NOT NULL))
        AS n_not_in_filtered,
      (SELECT COUNT(*) FROM customer c
       WHERE NOT EXISTS (SELECT 1 FROM keys WHERE keys.k = c.c_custkey))
        AS n_not_exists
    """,
)
def subquery_not_in_null_trap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NOT IN null trap, pinned cross-engine: when the subquery list
    contains a NULL, ``x NOT IN (...)`` is never TRUE (three-valued
    logic: x <> NULL is UNKNOWN), so the first count is 0 — silently —
    which is the single most common "my anti-join returns nothing" bug
    in migrated SQL. The second count filters the NULLs and behaves as
    intended; the third is the NOT EXISTS rewrite, which ignores NULLs
    by construction and is what Catalyst turns into a clean anti join
    (NOT IN needs a null-aware anti join — a strictly more expensive
    plan). All three side by side, value-hash-matched on both engines.

    Scale: prefer NOT EXISTS (plain left-anti shuffle) over NOT IN on
    nullable columns — both for the semantics and for the plan.
    """
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT
          (SELECT COUNT(*) FROM customer
           WHERE c_custkey NOT IN (
             SELECT CASE WHEN event_type = 'error' THEN NULL
                         ELSE user_id % 50 END
             FROM events)) AS n_not_in_with_null,
          (SELECT COUNT(*) FROM customer
           WHERE c_custkey NOT IN (
             SELECT user_id % 50 FROM events WHERE event_type <> 'error'))
            AS n_not_in_filtered,
          (SELECT COUNT(*) FROM customer c
           WHERE NOT EXISTS (
             SELECT 1 FROM events e
             WHERE (CASE WHEN e.event_type = 'error' THEN NULL
                         ELSE e.user_id % 50 END) = c.c_custkey))
            AS n_not_exists
        """
    )


@query(
    "customer_rfm_scores",
    oracle="""
    WITH maxd AS (SELECT MAX(o_orderdate) AS d0 FROM orders),
    base AS (
      SELECT o_custkey,
             date_diff('day', MAX(o_orderdate), (SELECT d0 FROM maxd))
               AS recency_days,
             COUNT(*) AS frequency,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
               AS monetary
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey AS custkey, recency_days, frequency, monetary,
           NTILE(4) OVER (ORDER BY recency_days, o_custkey) AS r_quartile,
           NTILE(4) OVER (ORDER BY frequency DESC, o_custkey) AS f_quartile,
           NTILE(4) OVER (ORDER BY monetary DESC, o_custkey) AS m_quartile
    FROM base
    """,
)
def customer_rfm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic CRM scoring: per customer, days
    since last order (anchored at the data's max date so the query is
    re-runnable), order count, exact decimal spend, and three NTILE(4)
    quartile scores with deterministic tie-breaks (1 = best: most
    recent / most frequent / highest spend). Downstream picks segments
    like 111 = champions, 4xx = churned.

    Scale: one keyed aggregate over orders; the three quartile windows
    are global sorts over the |customers| dimension — swap NTILE for
    approx_percentile edges at extreme cardinality
    (``stats_equidepth_bins`` documents the trade).
    """
    o = load_table(spark, sf_dir, "orders")
    d0 = o.agg(F.max("o_orderdate").alias("d0"))
    base = (
        o.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("monetary"),
        )
        .crossJoin(F.broadcast(d0))
        .select(
            F.col("o_custkey").alias("custkey"),
            F.datediff(F.col("d0"), F.col("last_order")).alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    return base.select(
        "custkey",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(4)
        .over(Window.orderBy("recency_days", "custkey"))
        .alias("r_quartile"),
        F.ntile(4)
        .over(Window.orderBy(F.col("frequency").desc(), "custkey"))
        .alias("f_quartile"),
        F.ntile(4)
        .over(Window.orderBy(F.col("monetary").desc(), "custkey"))
        .alias("m_quartile"),
    )


@query(
    "lineitem_abc_classification",
    oracle="""
    WITH rev AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                  AS DECIMAL(18,6))) * 10000 AS BIGINT) AS rev_e4
      FROM lineitem GROUP BY l_partkey
    ),
    ranked AS (
      SELECT l_partkey, rev_e4,
             CAST(SUM(rev_e4) OVER (ORDER BY rev_e4 DESC, l_partkey
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
             CAST(SUM(rev_e4) OVER () AS BIGINT) AS total
      FROM rev
    ),
    shared AS (
      SELECT l_partkey, rev_e4,
             CAST(floor(1000000 * (CAST(cum AS DOUBLE) / CAST(total AS DOUBLE)))
                  AS BIGINT) AS cum_share_ppm
      FROM ranked
    )
    SELECT l_partkey, rev_e4, cum_share_ppm,
           CASE WHEN cum_share_ppm <= 800000 THEN 'A'
                WHEN cum_share_ppm <= 950000 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM shared
    """,
)
def lineitem_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) classification: parts ranked by revenue, classified
    by CUMULATIVE revenue share — A up to 80%, B to 95%, C the tail —
    the inventory-prioritization workhorse. Revenue is quantized to
    EXACT 1e-4-dollar integers (price x (1-discount) has 4 decimal
    places, so the proven DECIMAL(18,6)-sum convention times 1e4 casts
    to BIGINT with zero fraction — a direct 0-dp decimal cast would hit
    half-way rounding where Spark rounds HALF_UP and DuckDB HALF_EVEN);
    the cumulative share is floor(1e6 x cum/total) computed in DOUBLE —
    identical operands give identical doubles in both engines, and the
    BIGINT x 1e6 product that a pure-integer ppm would need overflows
    2^63 at real totals (DuckDB silently promotes to HUGEINT, Spark
    wraps negative — measured, not hypothetical). Cents, not micros: 1e6 x cum must stay under 2^63 — at micro
    quantization DuckDB silently promotes the product to HUGEINT while
    Spark wraps negative, so the quantization scale is a correctness
    knob, not a style choice.

    Scale: one keyed aggregate compresses the fact table to |parts|;
    the cumulative window is a single ordered pass over that dimension.
    """
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        (
            F.sum(
                (
                    F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
                ).cast("decimal(18,6)")
            )
            * F.lit(10000)
        )
        .cast("long")
        .alias("rev_e4")
    )
    w_cum = Window.orderBy(F.col("rev_e4").desc(), "l_partkey").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.partitionBy()
    ranked = rev.select(
        "l_partkey",
        "rev_e4",
        F.sum("rev_e4").over(w_cum).cast("long").alias("cum"),
        F.sum("rev_e4").over(w_all).cast("long").alias("total"),
    )
    share = F.floor(
        F.lit(1000000) * (F.col("cum").cast("double") / F.col("total").cast("double"))
    ).cast("long")
    shared = ranked.select(
        "l_partkey", "rev_e4", share.alias("cum_share_ppm")
    )
    return shared.select(
        "l_partkey",
        "rev_e4",
        "cum_share_ppm",
        F.when(F.col("cum_share_ppm") <= 800000, "A")
        .when(F.col("cum_share_ppm") <= 950000, "B")
        .otherwise("C")
        .alias("abc_class"),
    )


@query(
    "quality_control_pchart",
    oracle="""
    WITH wk AS (
      SELECT CAST(floor(epoch(l_shipdate) / 604800) AS BIGINT) AS week,
             COUNT(*) AS n,
             CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_ret
      FROM lineitem GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(n_ret) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS pbar
      FROM wk
    )
    SELECT week, n, n_ret,
           CAST(n_ret AS DOUBLE) / CAST(n AS DOUBLE) AS p,
           pbar + 3 * sqrt(pbar * (1 - pbar) / CAST(n AS DOUBLE)) AS ucl,
           pbar - 3 * sqrt(pbar * (1 - pbar) / CAST(n AS DOUBLE)) AS lcl,
           (CAST(n_ret AS DOUBLE) / CAST(n AS DOUBLE)
              > pbar + 3 * sqrt(pbar * (1 - pbar) / CAST(n AS DOUBLE)))
           OR
           (CAST(n_ret AS DOUBLE) / CAST(n AS DOUBLE)
              < pbar - 3 * sqrt(pbar * (1 - pbar) / CAST(n AS DOUBLE)))
             AS out_of_control
    FROM wk, tot
    """,
)
def quality_control_pchart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical process control (p-chart): weekly return-rate with
    3-sigma binomial control limits and out-of-control flags — the SPC
    monitor a data-quality or manufacturing pipeline runs per batch
    window. Cross-engine exactness leans on a guarantee most floats
    don't have: IEEE-754 ``sqrt`` is CORRECTLY ROUNDED (unlike log/exp,
    whose libm implementations drift in final ULPs — why the LM
    operators use quantized-probability space instead). Every term here
    is the identical double expression on both sides, so even the
    boundary flags hash-match.

    Scale: one map-side-combined weekly aggregate; the grand rate rides
    a broadcast 1-row frame. Control limits per window, not per row —
    the chart is |weeks|-sized at any fact volume.
    """
    li = load_table(spark, sf_dir, "lineitem")
    wk = li.groupBy(
        F.expr(
            "CAST(floor(unix_date(CAST(l_shipdate AS DATE)) * 86400"
            " / 604800) AS BIGINT)"
        ).alias("week")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("long")
        .alias("n_ret"),
    )
    tot = wk.agg(
        (
            F.sum("n_ret").cast("double") / F.sum("n").cast("double")
        ).alias("pbar")
    )
    j = wk.crossJoin(F.broadcast(tot))
    p = F.col("n_ret").cast("double") / F.col("n").cast("double")
    margin = F.lit(3) * F.sqrt(
        F.col("pbar") * (F.lit(1) - F.col("pbar")) / F.col("n").cast("double")
    )
    ucl = F.col("pbar") + margin
    lcl = F.col("pbar") - margin
    return j.select(
        "week",
        "n",
        "n_ret",
        p.alias("p"),
        ucl.alias("ucl"),
        lcl.alias("lcl"),
        ((p > ucl) | (p < lcl)).alias("out_of_control"),
    )


@query(
    "sql_udf_parameterized",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_quantity > 45
    GROUP BY l_returnflag
    """,
)
def sql_udf_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-language scalar UDF + parameterized SQL (both Spark-4 API
    surfaces a migrating SQL shop expects): ``CREATE TEMPORARY FUNCTION
    … RETURNS … RETURN expr`` defines the discounted-price logic ONCE in
    pure SQL — no Python, no JVM jar, and Catalyst INLINES the body
    (whole-stage codegen sees ``p * (1 - d)``, not a black-box call —
    this is the difference between a SQL UDF and a Python UDF at 100 TB)
    — and the query binds its threshold through a named parameter marker
    (``:minqty``), the injection-safe form of string-built SQL. The
    oracle is the hand-inlined equivalent: a hash match proves the UDF
    indirection changed nothing.
    """
    register_views(spark, sf_dir)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION oebp_disc_price(p DOUBLE,"
        " d DOUBLE) RETURNS DOUBLE RETURN p * (1 - d)"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               COUNT(*) AS n,
               CAST(SUM(CAST(oebp_disc_price(l_extendedprice, l_discount)
                    AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_quantity > :minqty
        GROUP BY l_returnflag
        """,
        args={"minqty": 45},
    )


@query(
    "scalar_collation_lcase",
    oracle="""
    SELECT lower(o_orderstatus) AS status_ci,
           COUNT(*) AS n,
           MIN(o_orderkey) AS min_key
    FROM (
      SELECT CASE WHEN o_orderkey % 2 = 0 THEN lower(o_orderstatus)
                  ELSE upper(o_orderstatus) END AS o_orderstatus,
             o_orderkey
      FROM orders
    )
    GROUP BY 1
    """,
)
def scalar_collation_lcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware grouping (Spark 4 collations): a deliberately
    mixed-case status column grouped under ``COLLATE UTF8_LCASE`` —
    equality, hashing, and GROUP BY all become case-insensitive at the
    TYPE level, replacing the scattered ``lower()`` calls ported SQL is
    full of (and which break index/pushdown use on real warehouses).
    The oracle is the lower()-normalized spelling; the group key is
    emitted lower()ed so both engines agree on the representative.

    Scale: collation is evaluated inside codegen comparators — same
    hash-agg plan, no extra projection pass.
    """
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT lower(status_ci COLLATE UTF8_BINARY) AS status_ci,
               COUNT(*) AS n,
               MIN(o_orderkey) AS min_key
        FROM (
          SELECT CAST(CASE WHEN o_orderkey % 2 = 0
                           THEN lower(o_orderstatus)
                           ELSE upper(o_orderstatus) END
                      AS STRING COLLATE UTF8_LCASE) AS status_ci,
                 o_orderkey
          FROM orders
        )
        GROUP BY status_ci
        """
    )
