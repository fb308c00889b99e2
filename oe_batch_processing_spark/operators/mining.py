"""Pattern-mining and data-quality operators.

Frequent-itemset mining (association rules) and a Deequ-style declarative
constraint report — the two pipeline-hygiene shapes a production batch
platform grows next to its ETL core (the reference's BatchStatus/BatchRun
ledgers record per-record outcomes; these operators audit whole-table
invariants and cross-item structure).

All metrics are exact integers or ppm-quantized integer ratios
((1_000_000 * num) div den — floor division, bit-identical across engines;
same convention as operators/langmodel.py), so both queries carry full
DuckDB hash oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oe_batch_processing_spark.registry import query
from oe_batch_processing_spark.tables import load_table, register_views

_MIN_SUPPORT = 3  # absolute basket count at sf<=0.1; a fraction at scale
_PPM = 1_000_000


@query(
    "itemsets_frequent_pairs",
    oracle=f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem
    ),
    n_baskets AS (SELECT COUNT(DISTINCT basket) AS nb FROM items),
    item_cnt AS (
      SELECT item, COUNT(*) AS n FROM items GROUP BY 1
      HAVING COUNT(*) >= {_MIN_SUPPORT}
    ),
    pair_cnt AS (
      SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS n_ab
      FROM items a
      JOIN items b ON a.basket = b.basket AND a.item < b.item
      JOIN item_cnt ca ON ca.item = a.item
      JOIN item_cnt cb ON cb.item = b.item
      GROUP BY 1, 2
      HAVING COUNT(*) >= {_MIN_SUPPORT}
    )
    SELECT p.item_a, p.item_b,
           CAST(p.n_ab AS BIGINT) AS n_ab,
           CAST(({_PPM} * p.n_ab) // ca.n AS BIGINT) AS conf_a_to_b_ppm,
           CAST(({_PPM} * p.n_ab) // cb.n AS BIGINT) AS conf_b_to_a_ppm,
           CAST(({_PPM} * p.n_ab * nb.nb) // (ca.n * cb.n) AS BIGINT)
             AS lift_ppm
    FROM pair_cnt p
    JOIN item_cnt ca ON ca.item = p.item_a
    JOIN item_cnt cb ON cb.item = p.item_b
    CROSS JOIN n_baskets nb
    ORDER BY n_ab DESC, item_a, item_b
    """,
)
def itemsets_frequent_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules: frequent part PAIRS across orders
    with support, both-direction confidence, and lift — all ppm-quantized
    integers. The a-priori property does the heavy lifting: items below
    min-support are pruned BEFORE the pair join (an infrequent item cannot
    appear in a frequent pair), collapsing the quadratic per-basket blowup
    to frequent-item co-occurrences only.

    100 TB plan: distinct (basket, item) is one shuffle; the frequent-item
    filter is a broadcast-able dimension (item counts are Zipf-bounded);
    the pair join shuffles by basket with per-basket fan-out capped by
    (frequent items per basket)^2 — the standard two-round distributed
    a-priori. No driver state; min-support becomes a fraction of basket
    count at scale (absolute here so the sf0.01 oracle is non-trivial).
    """
    items = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_orderkey").alias("basket"), F.col("l_partkey").alias("item")
        )
        .distinct()
    )
    n_baskets = items.agg(
        F.count_distinct("basket").alias("nb")
    )
    item_cnt = (
        items.groupBy("item")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= _MIN_SUPPORT)
    )
    freq_items = (
        items.join(F.broadcast(item_cnt.select("item")), "item", "leftsemi")
    )
    a = freq_items.select("basket", F.col("item").alias("item_a"))
    b = freq_items.select("basket", F.col("item").alias("item_b"))
    pair_cnt = (
        a.join(b, "basket")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= _MIN_SUPPORT)
    )
    ca = item_cnt.select(F.col("item").alias("item_a"), F.col("n").alias("na"))
    cb = item_cnt.select(F.col("item").alias("item_b"), F.col("n").alias("nb_i"))
    return (
        pair_cnt.join(F.broadcast(ca), "item_a")
        .join(F.broadcast(cb), "item_b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "n_ab",
            F.expr(f"({_PPM}L * n_ab) div na").alias("conf_a_to_b_ppm"),
            F.expr(f"({_PPM}L * n_ab) div nb_i").alias("conf_b_to_a_ppm"),
            F.expr(f"({_PPM}L * n_ab * nb) div (na * nb_i)").alias("lift_ppm"),
        )
        .orderBy(F.col("n_ab").desc(), "item_a", "item_b")
    )


@query(
    "dq_constraint_report",
    oracle=f"""
    WITH o AS (SELECT * FROM orders),
    m AS (
      SELECT
        COUNT(*) AS n_rows,
        COUNT(o_custkey) AS n_custkey,
        COUNT(DISTINCT o_orderkey) AS n_distinct_key,
        SUM(CASE WHEN o_totalprice > 0 THEN 1 ELSE 0 END) AS n_price_pos,
        SUM(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 ELSE 0 END)
          AS n_status_ok,
        SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS n_orphans
      FROM o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    )
    SELECT name, passed, metric_ppm FROM (
      SELECT 'complete_custkey' AS name,
             n_custkey = n_rows AS passed,
             CAST(({_PPM} * n_custkey) // n_rows AS BIGINT) AS metric_ppm, 1 AS ord
      FROM m
      UNION ALL
      SELECT 'unique_orderkey', n_distinct_key = n_rows,
             CAST(({_PPM} * n_distinct_key) // n_rows AS BIGINT), 2 FROM m
      UNION ALL
      SELECT 'positive_totalprice', n_price_pos = n_rows,
             CAST(({_PPM} * n_price_pos) // n_rows AS BIGINT), 3 FROM m
      UNION ALL
      SELECT 'status_in_domain', n_status_ok = n_rows,
             CAST(({_PPM} * n_status_ok) // n_rows AS BIGINT), 4 FROM m
      UNION ALL
      SELECT 'fk_custkey_resolves', n_orphans = 0,
             CAST(({_PPM} * (n_rows - n_orphans)) // n_rows AS BIGINT), 5 FROM m
    ) ORDER BY ord
    """,
)
def dq_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality suite (the Deequ/expectations shape): five
    constraints over orders — completeness, key uniqueness, value bounds,
    domain membership, referential integrity vs customer — evaluated in
    ONE pass + one join, emitted as a (constraint, passed, metric_ppm)
    report. This is the pre-ingest gate a 100 TB pipeline runs before
    publishing a partition; pass/fail booleans plus ppm metrics make the
    report engine-exact.

    Plan: all row-local constraint counters fold into a single aggregate
    over the fact scan; the FK check rides one broadcast-able dim join.
    The 5-row report is a driver-sized unpivot of that one-row aggregate.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    joined = o.join(
        F.broadcast(c), o["o_custkey"] == c["c_custkey"], "left"
    )
    m = joined.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_custkey").alias("n_custkey"),
        F.count_distinct("o_orderkey").alias("n_distinct_key"),
        F.sum((F.col("o_totalprice") > 0).cast("long")).alias("n_price_pos"),
        F.sum(
            F.col("o_orderstatus").isin("O", "F", "P").cast("long")
        ).alias("n_status_ok"),
        F.sum(F.col("c_custkey").isNull().cast("long")).alias("n_orphans"),
    )
    checks = [
        ("complete_custkey", "n_custkey = n_rows",
         f"({_PPM}L * n_custkey) div n_rows"),
        ("unique_orderkey", "n_distinct_key = n_rows",
         f"({_PPM}L * n_distinct_key) div n_rows"),
        ("positive_totalprice", "n_price_pos = n_rows",
         f"({_PPM}L * n_price_pos) div n_rows"),
        ("status_in_domain", "n_status_ok = n_rows",
         f"({_PPM}L * n_status_ok) div n_rows"),
        ("fk_custkey_resolves", "n_orphans = 0L",
         f"({_PPM}L * (n_rows - n_orphans)) div n_rows"),
    ]
    report = m.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("name"),
                        F.expr(cond).alias("passed"),
                        F.expr(ppm).alias("metric_ppm"),
                    )
                    for name, cond, ppm in checks
                ]
            )
        ).alias("r")
    )
    return report.select("r.name", "r.passed", "r.metric_ppm")


@query(
    "profile_documents_columns",
    oracle="""
    WITH n AS (SELECT COUNT(*) AS total FROM documents)
    SELECT 'lang' AS col_name,
           (SELECT total FROM n) AS n_rows,
           CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_nulls,
           COUNT(DISTINCT lang) AS n_distinct,
           MIN(lang) AS min_str, MAX(lang) AS max_str
    FROM documents
    UNION ALL
    SELECT 'source',
           (SELECT total FROM n),
           CAST(SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT source),
           MIN(source), MAX(source)
    FROM documents
    UNION ALL
    SELECT 'n_chars',
           (SELECT total FROM n),
           CAST(SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT n_chars),
           CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR)
    FROM documents
    """,
)
def profile_documents_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiler (the dbt-docs / Deequ-profile shape): one report
    row per column — row count, null count, exact distinct count,
    min/max (stringified so heterogeneous columns share a schema). The
    pre-ingestion scan a pipeline runs to decide constraints, and the
    companion of ``dq_constraint_report`` (which CHECKS; this one
    DISCOVERS what to check).

    Scale: Spark computes all columns' profiles in ONE pass over the
    scan (a single aggregate with per-column expressions), not one scan
    per column — the oracle's UNION ALL per column is the naive
    spelling; at 100 TB the single-pass form reads the data once and
    unpivots a 1-row aggregate, and exact distincts per column become
    HLL sketches (`approx_count_distinct`) when cardinality explodes.
    """
    docs = load_table(spark, sf_dir, "documents")
    agg = docs.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("lang").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("lang_nulls"),
        F.count_distinct("lang").alias("lang_distinct"),
        F.min("lang").alias("lang_min"),
        F.max("lang").alias("lang_max"),
        F.sum(F.when(F.col("source").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("source_nulls"),
        F.count_distinct("source").alias("source_distinct"),
        F.min("source").alias("source_min"),
        F.max("source").alias("source_max"),
        F.sum(F.when(F.col("n_chars").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_chars_nulls"),
        F.count_distinct("n_chars").alias("n_chars_distinct"),
        F.min("n_chars").cast("string").alias("n_chars_min"),
        F.max("n_chars").cast("string").alias("n_chars_max"),
    )
    return agg.selectExpr(
        """stack(3,
             'lang', n_rows, lang_nulls, lang_distinct, lang_min, lang_max,
             'source', n_rows, source_nulls, source_distinct, source_min,
               source_max,
             'n_chars', n_rows, n_chars_nulls, n_chars_distinct, n_chars_min,
               n_chars_max)
           AS (col_name, n_rows, n_nulls, n_distinct, min_str, max_str)"""
    )


# --- Benford first-digit screen ---------------------------------------------

import math as _math

# log10(1 + 1/d) for d = 1..9, materialized as repr() literals so the Spark
# plan and the DuckDB oracle parse the IDENTICAL doubles (computing log10 in
# each engine could differ in the last ULP; a shared literal cannot).
_BENFORD_P = {d: _math.log10(1.0 + 1.0 / d) for d in range(1, 10)}
_BENFORD_VALUES_SQL = ", ".join(
    # CAST: DuckDB types a bare decimal literal as DECIMAL, and decimal
    # arithmetic then overflows/diverges; force the shared-literal DOUBLE.
    f"({d}, CAST({_BENFORD_P[d]!r} AS DOUBLE))" for d in range(1, 10)
)


@query(
    "dq_benford_screen",
    oracle=f"""
    WITH obs AS (
      SELECT CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
                         1, 1) AS INTEGER) AS digit,
             COUNT(*) AS obs
      FROM orders GROUP BY 1
    ),
    tot AS (SELECT COUNT(*) AS n FROM orders),
    benford(digit, p) AS (VALUES {_BENFORD_VALUES_SQL})
    SELECT b.digit,
           COALESCE(o.obs, 0) AS obs,
           t.n,
           CAST(FLOOR(t.n * b.p * 1000000.0) AS BIGINT) AS expected_micro,
           CAST(FLOOR(COALESCE(o.obs, 0) * 1000000.0 / t.n
                      - b.p * 1000000.0) AS BIGINT) AS dev_micro,
           CAST(FLOOR((COALESCE(o.obs, 0) - t.n * b.p)
                      * (COALESCE(o.obs, 0) - t.n * b.p)
                      / (t.n * b.p) * 1000000.0) AS BIGINT) AS chi2_micro
    FROM benford b
    LEFT JOIN obs o ON o.digit = b.digit
    CROSS JOIN tot t
    """,
)
def dq_benford_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-significant-digit screen over order totals —
    the classic fabricated-data / upstream-corruption detector for a
    financial fact column. Emits, per digit 1-9: the observed count, the
    Benford-expected count, the deviation, and the per-digit chi-square
    contribution, all micro-quantized (floor of 1e6x) for bit-exact
    cross-engine comparison.

    Exactness: the first digit is read from the DECIMAL(18,2) string form
    (both engines recover the same 2-dp decimal from the same double, so
    the same character); the Benford probabilities are shared repr()
    literals, so every double expression is the identical IEEE op
    sequence in both engines, and FLOOR lands on the same integer.

    Scale: one map-side-combinable 9-group aggregation over the fact
    table + a broadcast of the 9-row constant spine and the 1-row total —
    a single scan, a single tiny shuffle, no skew exposure (9 groups
    combine map-side to 9 rows per task before the exchange).
    """
    orders = load_table(spark, sf_dir, "orders")
    digit = F.substring(
        F.col("o_totalprice").cast("decimal(18,2)").cast("string"), 1, 1
    ).cast("int")
    obs = orders.groupBy(digit.alias("digit")).agg(
        F.count(F.lit(1)).alias("obs")
    )
    tot = orders.agg(F.count(F.lit(1)).alias("n"))
    spine = spark.createDataFrame(
        [(d, _BENFORD_P[d]) for d in range(1, 10)], "digit int, p double"
    )
    j = (
        spine.join(F.broadcast(obs), "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce(F.col("obs"), F.lit(0)).alias("obs"),
            "n",
            "p",
        )
    )
    np_ = F.col("n") * F.col("p")
    return j.select(
        "digit",
        "obs",
        "n",
        F.floor(np_ * F.lit(1000000.0)).alias("expected_micro"),
        F.floor(
            F.col("obs") * F.lit(1000000.0) / F.col("n")
            - F.col("p") * F.lit(1000000.0)
        ).alias("dev_micro"),
        F.floor(
            (F.col("obs") - np_) * (F.col("obs") - np_) / np_
            * F.lit(1000000.0)
        ).alias("chi2_micro"),
    )


# ---------------------------------------------------------------------------
# Differentially-private count release via the (truncated) geometric
# mechanism, with deterministic md5-seeded noise
# ---------------------------------------------------------------------------

_DP_B = 14          # truncation bound: noise support is [-B, B]
_DP_SEED = "dp7"    # release seed; a new release uses a new seed

# Two-sided geometric with alpha = 3/4 (epsilon = ln(4/3) ~ 0.2877 for
# sensitivity-1 counts): exact integer weights w_k = 3^|k| * 4^(B-|k|)
# over k in [-B, B] (common denominator 4^B), truncated and renormalized.
_DP_ROWS: list[tuple[int, int, int]] = []
_cum = 0
for _k in range(-_DP_B, _DP_B + 1):
    _w = 3 ** abs(_k) * 4 ** (_DP_B - abs(_k))
    _DP_ROWS.append((_k, _cum, _cum + _w))
    _cum += _w
_DP_T = _cum  # total weight = the uniform's modulus

_DP_VALUES = ", ".join(f"({k}, {lo}, {hi})" for k, lo, hi in _DP_ROWS)
# 15 md5 nibbles -> a 60-bit uniform (modulo bias vs T < 2^30 is < 2^-30).
# Each multiplier is CAST to BIGINT: small powers of 16 fit INT32, and
# Spark then types the product INT32 too — nibble * 16^7 silently wraps
# under non-ANSI semantics (measured: term 8 of the sum came back
# negative). DuckDB is unaffected but parses the cast identically.
_DP_U60 = " + ".join(
    f"(instr('0123456789abcdef', substr(hx, {i}, 1)) - 1)"
    f" * CAST({16 ** (15 - i)} AS BIGINT)"
    for i in range(1, 16)
)

_DP_SQL = f"""
WITH g AS (
  SELECT c_nationkey AS nationkey, c_mktsegment AS segment,
         CAST(COUNT(*) AS BIGINT) AS n_true,
         md5(CAST(c_nationkey AS STRING) || ':' || c_mktsegment
             || ':{_DP_SEED}') AS hx
  FROM customer GROUP BY 1, 2
),
u AS (
  SELECT nationkey, segment, n_true,
         ({_DP_U60}) % {_DP_T} AS u
  FROM g
)
SELECT u.nationkey, u.segment, u.n_true,
       CAST(t.k AS BIGINT) AS noise,
       CAST(u.n_true + t.k AS BIGINT) AS n_released
FROM u JOIN (VALUES {_DP_VALUES}) AS t(k, lo, hi)
  ON u.u >= t.lo AND u.u < t.hi
"""


@query("dq_dp_geometric_counts", oracle=_DP_SQL)
def dq_dp_geometric_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private release of the customer count per
    (nation, market segment) via the geometric mechanism — the discrete
    analogue of Laplace and the standard DP primitive for
    sensitivity-1 counting queries (Ghosh-Roughgarden-Sundararajan's
    utility-optimal mechanism). Noise follows the truncated two-sided
    geometric with alpha = 3/4 (epsilon = ln(4/3)), realized EXACTLY in
    integers: weights 3^|k| * 4^(B-|k|) over [-B, B] partition [0, T),
    and a 60-bit uniform is derived from 15 md5 nibbles of the group
    key + release seed, then mapped through the inverse CDF by a
    29-row interval join. Deterministic seeding makes the release
    reproducible and oracle-checkable; the documented deviations from a
    production release are (a) the md5 stream stands in for a crypto
    RNG, (b) the modulo bias (< 2^-30) and [-B, B] truncation
    (tail mass ~ (3/4)^B) slightly perturb the distribution, and
    (c) n_true is emitted here ONLY for the differential harness — a
    real release ships n_released alone.

    Scale: one map-side-combinable count per group, then a broadcast
    interval join against the constant 29-row CDF table — noise
    generation is O(groups), embarrassingly parallel, no extra shuffle.
    Shared-SQL verbatim on both engines.
    """
    register_views(spark, sf_dir)
    return spark.sql(_DP_SQL)
