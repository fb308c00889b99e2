"""Round-3 relational surface: map/struct/regexp scalar batteries, cube +
grouping_id, per-user gap statistics, retention cohorts, 2-D histograms,
grouped approximate quantiles, and a bucketed co-located join.

Exactness follows the house rules (registry.py): doubles are ratios or
closed-form expressions of identical integers / exact decimal sums, md5 for
hash decisions, rank-based exact medians.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from oe_batch_processing_spark.registry import dsum, query
from oe_batch_processing_spark.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- map functions -----------------------------------------------------------

@query(
    "scalar_map_ops",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k_val,
           CAST(len(json_keys(props)) AS INTEGER) AS n_keys,
           list_contains(json_keys(props), 'k') AS has_k,
           CAST(json_extract(props, '$.k') AS INTEGER) * 2 AS k_doubled,
           CAST(event_id % 7 AS INTEGER) AS extra_val
    FROM events
    """,
)
def scalar_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: JSON -> map parse, element access, key introspection,
    ``transform_values``, ``map_concat`` — flat scalar outputs only (the
    engine's map columns stay internal; comparators see scalars).

    Scale: all map ops are codegen expressions over the parsed column — one
    scan, zero shuffles. ``from_json`` to a typed map beats repeated JSON
    path extraction when several keys are read (parse once, access many).
    """
    e = _t(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    withm = e.select("event_id", m.alias("m"))
    return withm.select(
        "event_id",
        F.element_at("m", "k").alias("k_val"),
        F.size("m").alias("n_keys"),
        F.array_contains(F.map_keys("m"), "k").alias("has_k"),
        F.element_at(F.transform_values("m", lambda _k, v: v * 2), "k").alias(
            "k_doubled"
        ),
        F.element_at(
            F.map_concat(
                "m",
                F.create_map(F.lit("extra"), (F.col("event_id") % 7).cast("int")),
            ),
            "extra",
        ).alias("extra_val"),
    )


# --- struct functions --------------------------------------------------------

@query(
    "scalar_struct_ops",
    oracle="""
    SELECT o_orderkey,
           o_totalprice AS price_from_struct,
           o_orderpriority AS pr_from_nested,
           o_totalprice * 1.1 AS updated_price,
           (o_totalprice < 300000.0
              OR (o_totalprice = 300000.0 AND o_orderkey < 0)) AS below_pivot
    FROM orders
    """,
)
def scalar_struct_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StructType surface: nested struct build, dotted field access,
    ``withField`` update, and lexicographic struct comparison (the idiom
    behind arg-min/arg-max and composite ordering keys).

    Scale: structs are columnar shreds under Tungsten — field access is a
    column read, not a deserialization; zero shuffles here.
    """
    o = _t(spark, sf_dir, "orders")
    s = F.struct(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("price"),
        F.struct(
            F.col("o_orderpriority").alias("pr"),
            F.col("o_orderstatus").alias("st"),
        ).alias("tag"),
    )
    withs = o.select("o_orderkey", s.alias("s"))
    pivot = F.struct(
        F.lit(300000.0).alias("price"), F.lit(0).cast("long").alias("k")
    )
    return withs.select(
        "o_orderkey",
        F.col("s.price").alias("price_from_struct"),
        F.col("s.tag.pr").alias("pr_from_nested"),
        F.col("s")
        .withField("price", F.col("s.price") * 1.1)
        .getField("price")
        .alias("updated_price"),
        (
            F.struct(F.col("s.price").alias("price"), F.col("s.k").alias("k"))
            < pivot
        ).alias("below_pivot"),
    )


# --- regexp_extract_all ------------------------------------------------------

_TWORD_RE = r"\b(t[a-z]+)\b"


@query(
    "scalar_regexp_extract_all",
    oracle=f"""
    SELECT doc_id,
           CAST(LEN(regexp_extract_all(text, '{_TWORD_RE}', 1)) AS INTEGER)
             AS n_matches,
           COALESCE(array_to_string(regexp_extract_all(text, '{_TWORD_RE}', 1),
                    ','), '') AS all_matches,
           regexp_extract_all(text, '{_TWORD_RE}', 1)[1] AS first_match,
           regexp_extract_all(text, '{_TWORD_RE}', 1)[-1] AS last_match
    FROM documents
    """,
)
def scalar_regexp_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-capturing ``regexp_extract_all`` battery: match count, joined
    match list, first/last match (negative index). Flat outputs only.
    Scan-speed codegen regex — no shuffle, no Python."""
    docs = _t(spark, sf_dir, "documents")
    # F.lit for the pattern: \b inside a SQL string literal would be eaten
    # as a backspace escape by the SQL parser.
    arr = F.regexp_extract_all("text", F.lit(_TWORD_RE), 1)
    return docs.select(
        "doc_id",
        F.size(arr).cast("int").alias("n_matches"),
        F.array_join(arr, ",").alias("all_matches"),
        F.try_element_at(arr, F.lit(1)).alias("first_match"),
        F.try_element_at(arr, F.lit(-1)).alias("last_match"),
    )


# --- cube + grouping_id ------------------------------------------------------

@query(
    "agg_grouping_id",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           CAST(GROUPING(o_orderpriority, o_orderstatus) AS INTEGER) AS gid,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY CUBE (o_orderpriority, o_orderstatus)
    """,
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE with ``grouping_id()`` — the bitmask that distinguishes a real
    NULL group key from a rollup super-aggregate row (complements the
    GROUPING()-per-column form in ``agg_grouping_sets``). DataFrame-API
    entry (``df.cube``), exact decimal money sums."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_price"),
        )
        .select("o_orderpriority", "o_orderstatus", "gid", "n_orders", "total_price")
    )


# --- per-user inter-event gap statistics -------------------------------------

_SESSION_GAP_US = 30 * 60 * 1_000_000


@query(
    "win_session_gaps",
    oracle=f"""
    WITH gaps AS (
      SELECT user_id, event_id,
             epoch_us(ts) - epoch_us(lag(ts) OVER w) AS gap_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    g AS (
      SELECT user_id, gap_us,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY gap_us, event_id)
               AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n
      FROM gaps WHERE gap_us IS NOT NULL
    )
    SELECT user_id,
           COUNT(*) AS n_gaps,
           CAST(1 + SUM(CASE WHEN gap_us > {_SESSION_GAP_US} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_sessions,
           MAX(gap_us) / 1e6 AS max_gap_s,
           CAST(SUM(gap_us) AS DOUBLE) / COUNT(*) / 1e6 AS mean_gap_s,
           CAST(SUM(CASE WHEN rn IN ((n + 1) // 2, (n + 2) // 2) THEN gap_us
                         ELSE 0 END) AS DOUBLE)
             / SUM(CASE WHEN rn IN ((n + 1) // 2, (n + 2) // 2) THEN 1 ELSE 0 END)
             / 1e6 AS median_gap_s
    FROM g
    GROUP BY user_id
    """,
)
def win_session_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap profile per user: gap count, session count (gap >
    30 min opens a session), max/mean/exact-median gap seconds — the
    distribution a pipeline inspects before choosing its sessionization gap
    (the assignment itself is ``events_sessionize_batch``).

    Exactness: gaps are integer microseconds; mean and median are integer
    sums divided by integer counts (one identical double division per
    engine); the median is the rank-selected middle element(s), not an
    interpolating percentile. Scale: both windows and the final agg share
    one user_id hash partitioning — a single exchange end-to-end.
    """
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        e.select(
            "user_id",
            "event_id",
            (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias(
                "gap_us"
            ),
        )
        .filter(F.col("gap_us").isNotNull())
    )
    wr = Window.partitionBy("user_id").orderBy("gap_us", "event_id")
    wn = Window.partitionBy("user_id")
    g = gaps.select(
        "user_id",
        "gap_us",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    mid = ((F.col("rn") == ((F.col("n") + 1) / 2).cast("long"))
           | (F.col("rn") == ((F.col("n") + 2) / 2).cast("long")))
    return g.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        (
            1 + F.sum(F.when(F.col("gap_us") > _SESSION_GAP_US, 1).otherwise(0))
        ).alias("n_sessions"),
        (F.max("gap_us") / 1e6).alias("max_gap_s"),
        (F.sum("gap_us").cast("double") / F.count(F.lit(1)) / 1e6).alias(
            "mean_gap_s"
        ),
        (
            F.sum(F.when(mid, F.col("gap_us")).otherwise(0)).cast("double")
            / F.sum(F.when(mid, 1).otherwise(0))
            / 1e6
        ).alias("median_gap_s"),
    )


# --- retention cohorts -------------------------------------------------------

@query(
    "events_retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS act_week FROM events
    ),
    sizes AS (
      SELECT cohort_week, COUNT(*) AS cohort_size FROM firsts GROUP BY 1
    ),
    ret AS (
      SELECT f.cohort_week,
             CAST(datediff('day', f.cohort_week, a.act_week) // 7 AS INTEGER)
               AS week_offset,
             COUNT(DISTINCT a.user_id) AS n_active
      FROM activity a JOIN firsts f USING (user_id)
      GROUP BY 1, 2
    )
    SELECT strftime(r.cohort_week, '%Y-%m-%d') AS cohort_week,
           r.week_offset, r.n_active, s.cohort_size,
           CAST(r.n_active AS DOUBLE) / s.cohort_size AS retention
    FROM ret r JOIN sizes s ON r.cohort_week = s.cohort_week
    """,
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity week; for each
    (cohort, week-offset) cell, the count and fraction of the cohort still
    active — the standard growth-analytics triangle.

    Scale: two aggs over user_id (same partitioning, one exchange), a
    broadcast of the tiny per-cohort size table, and a distinct count per
    cell. Retention is an exact integer ratio.
    """
    e = _t(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = e.select(
        "user_id", F.date_trunc("week", "ts").alias("act_week")
    ).distinct()
    sizes = firsts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    ret = (
        activity.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("act_week", "cohort_week") / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
    )
    return ret.join(F.broadcast(sizes), "cohort_week").select(
        F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
        "week_offset",
        "n_active",
        "cohort_size",
        (F.col("n_active").cast("double") / F.col("cohort_size")).alias(
            "retention"
        ),
    )


# --- 2-D histogram -----------------------------------------------------------

@query(
    "events_histogram_2d",
    oracle="""
    SELECT CAST(hour(ts) AS INTEGER) AS hr,
           CAST(floor(value / 100) AS BIGINT) AS vbin,
           COUNT(*) AS n,
           MIN(value) AS v_min,
           MAX(value) AS v_max
    FROM events
    GROUP BY 1, 2
    """,
)
def events_histogram_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D histogram (hour-of-day × value bin) — the joint-distribution
    profile behind load heatmaps and anomaly baselines. One partial-agg
    shuffle on a bounded key grid (24 × value range / 100 cells)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.hour("ts").cast("int").alias("hr"),
            F.floor(F.col("value") / 100).alias("vbin"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("v_min"),
            F.max("value").alias("v_max"),
        )
    )


# --- grouped approximate quantiles ------------------------------------------

@query(
    "events_approx_quantile_stats",
    # Same exactness regime as stats_percentile_approx: Spark's GK sketch is
    # exact while per-group n <= accuracy (1e6) and then equals DuckDB's
    # quantile_disc — comfortably above per-group counts at every check SF.
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           quantile_disc(value, 0.10) AS p10,
           quantile_disc(value, 0.50) AS p50,
           quantile_disc(value, 0.90) AS p90,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
             AS mean_value
    FROM events
    GROUP BY event_type
    """,
)
def events_approx_quantile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distribution card: count, approx p10/p50/p90
    (Greenwald-Khanna sketch — single-pass, mergeable, the 100 TB quantile
    path) and exact-decimal mean. Flat scalar outputs."""
    e = _t(spark, sf_dir, "events")
    # accuracy 1_000_000 keeps the GK sketch exact (== quantile_disc) well
    # past sf0.1's ~20k rows/group, so the oracle hash holds at any SF the
    # driver checks; memory is still O(accuracy) per group — fine per-task.
    q = F.percentile_approx("value", [0.10, 0.50, 0.90], 1_000_000)
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        q.getItem(0).alias("p10"),
        q.getItem(1).alias("p50"),
        q.getItem(2).alias("p90"),
        (dsum("value") / F.count(F.lit(1))).alias("mean_value"),
    )


# --- bucketed co-located join ------------------------------------------------

N_BUCKETS = 8


@query(
    "join_bucketed_orders_customer",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def join_bucketed_orders_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free co-located join via bucketed tables: both sides are
    written bucketed (8 buckets, same key) and joined through the catalog —
    Spark aligns bucket spec on both sides, so the SortMergeJoin needs NO
    Exchange (plan-asserted in tests/test_bucketing.py for this layout).

    Why this matters at 100 TB: a fact-fact join on pre-bucketed storage
    skips the dominant shuffle entirely — bucketing is the amortize-once
    answer when the same join key is hit repeatedly. The write cost is paid
    here per-call only because the demo materializes its own inputs; a real
    deployment buckets at ingest.
    """
    # Discriminate by sf-dir AND session so two concurrent runs on the same
    # scale factor cannot clobber each other's bucketed files mid-read; the
    # app-scoped demo dir is re-created per call, so artifacts don't pile up.
    sf_tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    app_tag = spark.sparkContext.applicationId.replace("-", "_").replace(".", "_")
    tag = f"{sf_tag}_{app_tag}"
    base = f"/tmp/oe_bucket_demo/{tag}"
    shutil.rmtree(base, ignore_errors=True)
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    customer = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    (
        orders.write.bucketBy(N_BUCKETS, "o_custkey")
        .sortBy("o_custkey")
        .option("path", f"{base}/orders_b")
        .mode("overwrite")
        .saveAsTable(f"oe_orders_bucketed_{tag}")
    )
    (
        customer.write.bucketBy(N_BUCKETS, "c_custkey")
        .sortBy("c_custkey")
        .option("path", f"{base}/customer_b")
        .mode("overwrite")
        .saveAsTable(f"oe_customer_bucketed_{tag}")
    )
    ob = spark.table(f"oe_orders_bucketed_{tag}")
    cb = spark.table(f"oe_customer_bucketed_{tag}")
    return (
        ob.join(cb, ob["o_custkey"] == cb["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_price"),
        )
    )


@query(
    "scalar_variant_events",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
           CAST(json_extract(props, '$.k') AS BIGINT) * 2 AS k_doubled,
           CAST(json_extract('{"a": {"b": [' || CAST(event_id AS VARCHAR)
                || ', ' || CAST(event_id * 3 AS VARCHAR) || ']}}',
                '$.a.b[1]') AS BIGINT) AS nested_pick
    FROM events
    """,
)
def scalar_variant_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VARIANT type: ``parse_json``
    turns the props JSON into an open-schema VARIANT once, and
    ``variant_get`` extracts typed values by path — including a nested
    array path over a synthesized document. VARIANT is the schema-on-read
    answer for event properties that drift across producers: the binary
    encoding is columnar-shredding-friendly and path access is evaluated
    JVM-side (no regex, no per-row Python), unlike string json_extract
    which re-parses the text per call.

    Differential note: the oracle reads the same paths with DuckDB's JSON
    functions — VARIANT vs JSON-text engines agree on the extracted typed
    values, which is exactly the portability contract a user migrating
    props pipelines needs.
    """
    e = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    nested = F.parse_json(
        F.concat(
            F.lit('{"a": {"b": ['),
            F.col("event_id").cast("string"),
            F.lit(", "),
            (F.col("event_id") * 3).cast("string"),
            F.lit("]}}"),
        )
    )
    return e.select(
        "event_id",
        F.variant_get(v, "$.k", "bigint").alias("k_val"),
        (F.variant_get(v, "$.k", "bigint") * 2).alias("k_doubled"),
        F.variant_get(nested, "$.a.b[1]", "bigint").alias("nested_pick"),
    )
