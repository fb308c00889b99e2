"""Distributed-ML statistics operators: closed-form multivariate OLS via
normal equations and lagged cross-correlation between event series.

Both follow the sufficient-statistics doctrine for 100 TB model fitting:
one distributed pass reduces the fact table to a constant-size moment
vector (every sum an exact integer through the round-and-sum-BIGINT
convention), and the model solve is a deterministic scalar expression on
those moments — no iterative optimizer, no driver-side data movement
beyond the moments themselves. The SQL text is shared VERBATIM between
the Spark query and the DuckDB oracle, so the (large) determinant
formulas cannot drift between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oe_batch_processing_spark.registry import query
from oe_batch_processing_spark.tables import register_views

# Cramer's rule for M b = v with
#   M = [[n, X1, X2], [X1, X11, X12], [X2, X12, X22]],  v = [Y, X1Y, X2Y]
_DET = (
    "(n_d*(X11*X22 - X12*X12) - X1*(X1*X22 - X12*X2) + X2*(X1*X12 - X11*X2))"
)
_DET0 = (
    "(Y*(X11*X22 - X12*X12) - X1*(X1Y*X22 - X12*X2Y) + X2*(X1Y*X12 - X11*X2Y))"
)
_DET1 = (
    "(n_d*(X1Y*X22 - X12*X2Y) - Y*(X1*X22 - X12*X2) + X2*(X1*X2Y - X1Y*X2))"
)
_DET2 = (
    "(n_d*(X11*X2Y - X1Y*X12) - X1*(X1*X2Y - X1Y*X2) + Y*(X1*X12 - X11*X2))"
)

_OLS_SQL = f"""
WITH s AS (
  SELECT COUNT(*) AS n,
         SUM(CAST(l_quantity AS BIGINT)) AS s1,
         SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) AS s2,
         SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS sy,
         SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS s11,
         SUM(CAST(ROUND(l_quantity * l_discount * 100) AS BIGINT)) AS s12,
         SUM(CAST(ROUND(l_discount * l_discount * 10000) AS BIGINT)) AS s22,
         SUM(CAST(ROUND(l_quantity * l_extendedprice * 100) AS BIGINT)) AS s1y,
         SUM(CAST(ROUND(l_discount * l_extendedprice * 10000) AS BIGINT)) AS s2y,
         SUM(CAST(ROUND(l_extendedprice * l_extendedprice * 10) AS BIGINT)) AS syy
  FROM lineitem
),
m AS (
  SELECT CAST(n AS DOUBLE) AS n_d,
         CAST(s1 AS DOUBLE) AS X1,
         CAST(s2 AS DOUBLE) / 100 AS X2,
         CAST(sy AS DOUBLE) / 100 AS Y,
         CAST(s11 AS DOUBLE) AS X11,
         CAST(s12 AS DOUBLE) / 100 AS X12,
         CAST(s22 AS DOUBLE) / 10000 AS X22,
         CAST(s1y AS DOUBLE) / 100 AS X1Y,
         CAST(s2y AS DOUBLE) / 10000 AS X2Y,
         CAST(syy AS DOUBLE) / 10 AS YY
  FROM s
),
b AS (
  SELECT n_d, Y, X1Y, X2Y, YY,
         {_DET0} / {_DET} AS beta0,
         {_DET1} / {_DET} AS beta1,
         {_DET2} / {_DET} AS beta2
  FROM m
)
SELECT CAST(n_d AS BIGINT) AS n, beta0, beta1, beta2,
       1 - (YY - beta0*Y - beta1*X1Y - beta2*X2Y)
           / (YY - Y*Y/n_d) AS r2
FROM b
"""


@query("regression_multivar_normal_eq", oracle=_OLS_SQL)
def regression_multivar_normal_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multivariate OLS (l_extendedprice ~ l_quantity + l_discount +
    intercept) solved in closed form: one distributed aggregation
    reduces 6e9 rows-at-scale to ten moments, and Cramer's rule on the
    3x3 normal matrix yields the coefficients plus R^2 — the
    sufficient-statistics shape that replaces iterative SGD for any
    model linear in its parameters. At 100 TB this is ONE map-side-
    combinable pass; the solve is O(1).

    Exactness: each moment is round-to-scaled-BIGINT summed (exact,
    order-independent, all magnitudes < 2^53 — y^2 deliberately at
    scale 10 to stay under the bound at sf0.1), converted once to
    double; the determinant algebra is one shared SQL text so both
    engines evaluate the identical IEEE expression tree. A 4x4 (more
    features) swaps the formula for LDL^T on the driver — the moments
    pass is unchanged.
    """
    register_views(spark, sf_dir)
    return spark.sql(_OLS_SQL)


_XCORR_SQL = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hr,
         SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
  FROM events GROUP BY 1
),
lags AS (SELECT 0 AS lag UNION ALL SELECT 1 UNION ALL
         SELECT 2 UNION ALL SELECT 3),
paired AS (
  SELECT l.lag, a.c, b.p
  FROM lags l
  JOIN hourly a ON TRUE
  JOIN hourly b ON b.hr = a.hr + l.lag * INTERVAL '1' HOUR
),
mo AS (
  SELECT lag, COUNT(*) AS n,
         SUM(c) AS sc, SUM(p) AS sp,
         SUM(c * c) AS scc, SUM(p * p) AS spp, SUM(c * p) AS scp
  FROM paired GROUP BY lag
)
SELECT CAST(lag AS INTEGER) AS lag, CAST(n AS BIGINT) AS n,
       (CAST(n AS DOUBLE) * CAST(scp AS DOUBLE)
          - CAST(sc AS DOUBLE) * CAST(sp AS DOUBLE))
       / (SQRT(CAST(n AS DOUBLE) * CAST(scc AS DOUBLE)
               - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE))
          * SQRT(CAST(n AS DOUBLE) * CAST(spp AS DOUBLE)
                 - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE)))
         AS xcorr
FROM mo
"""


@query("events_lagged_crosscorr", oracle=_XCORR_SQL)
def events_lagged_crosscorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lagged cross-correlation between the hourly click and purchase
    count series (lags 0-3h): the does-activity-lead-conversion
    diagnostic. Counts are integers, so every Pearson moment is an
    exact BIGINT sum and the correlation is a fixed IEEE expression —
    hash-exact across engines with no decimal scaffolding.

    Scale: events collapse to the hourly grid first (one hash shuffle,
    grid is O(hours) regardless of event volume); the lag join runs on
    the tiny grid. The lag set is a constant inline relation, so
    Catalyst unrolls it as a broadcast.
    """
    register_views(spark, sf_dir)
    return spark.sql(_XCORR_SQL)


# ---------------------------------------------------------------------------
# Two-sample distribution tests (drift detection), integer-exact
# ---------------------------------------------------------------------------

_KS_BINS_PER_UNIT = 16  # ECDF quantization: 1/16 value units per bin

_KS_SQL = f"""
WITH b AS (
  SELECT CAST(FLOOR(value * {_KS_BINS_PER_UNIT}) AS BIGINT) AS bin,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS c2
  FROM events WHERE event_type IN ('click', 'purchase')
  GROUP BY 1
),
c AS (
  SELECT bin,
         CAST(SUM(c1) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS BIGINT) AS f1,
         CAST(SUM(c2) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS BIGINT) AS f2
  FROM b
),
t AS (
  SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
  FROM b
)
SELECT n1, n2, ABS(n2 * f1 - n1 * f2) AS d_scaled, bin AS at_bin
FROM c, t
ORDER BY d_scaled DESC, at_bin
LIMIT 1
"""


@query("stats_ks_two_sample", oracle=_KS_SQL)
def stats_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the click and
    purchase value distributions — the distribution-drift test a data-QC
    gate runs between corpus snapshots / sources before a training mix is
    trusted. D = max |F1 - F2| over the binned ECDFs, reported as the
    integer d_scaled = max |n2·C1 - n1·C2| (D = d_scaled/(n1·n2)) plus the
    bin where the gap peaks — exact integers end to end, no float ECDFs.

    Scale: values quantize to {_KS_BINS_PER_UNIT} bins/unit FIRST (one
    map-side-combined shuffle on bin), so the ordered-window relation is
    the BIN aggregate — bounded by the value range, independent of row
    count. That quantization is what makes ECDF comparison feasible at
    100 TB (exact continuous KS needs a global sort of every observation;
    binned KS bounds the error by one bin width and runs on a frame of a
    few thousand rows). The shared-SQL text runs verbatim on both engines.
    """
    register_views(spark, sf_dir)
    return spark.sql(_KS_SQL)


_MWU_SQL = """
WITH x AS (
  SELECT value AS v,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is1
  FROM events WHERE event_type IN ('click', 'purchase')
),
g AS (
  SELECT v, CAST(SUM(is1) AS BIGINT) AS n1v, CAST(COUNT(*) AS BIGINT) AS tv
  FROM x GROUP BY v
),
c AS (
  SELECT v, n1v, tv,
         CAST(COALESCE(SUM(tv) OVER (ORDER BY v ROWS BETWEEN
              UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb
  FROM g
),
t AS (
  SELECT CAST(SUM(n1v) AS BIGINT) AS n1,
         CAST(SUM(tv) - SUM(n1v) AS BIGINT) AS n2
  FROM g
)
SELECT n1, n2,
       CAST(SUM(n1v * (2 * cb + tv + 1)) AS BIGINT) AS r1_x2,
       CAST(2 * n1 * n2 + n1 * (n1 + 1)
            - SUM(n1v * (2 * cb + tv + 1)) AS BIGINT) AS u1_x2
FROM c, t
GROUP BY n1, n2
"""


@query("stats_mann_whitney_u", oracle=_MWU_SQL)
def stats_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (rank-sum) test between the click and purchase value
    samples — the nonparametric did-the-distribution-shift test (no
    normality assumption), the standard A/B significance primitive when
    means are outlier-fragile. Tie handling is the textbook average-rank
    rule, made integer-exact by doubling: a value with cb predecessors and
    tv ties contributes rank-sum n1v·(2·cb + tv + 1)/2, so r1_x2 = 2·R1
    and u1_x2 = 2·U1 are exact BIGINTs (U1 = u1_x2/2).

    Scale: one hash shuffle collapses the fact rows to the distinct-value
    frame (rank math needs only per-value counts); the ordered window runs
    on that aggregate, bounded by value cardinality — for continuous
    unbounded-cardinality data, quantize first exactly as the KS op does.
    Shared-SQL verbatim on both engines.
    """
    register_views(spark, sf_dir)
    return spark.sql(_MWU_SQL)


# ---------------------------------------------------------------------------
# Deterministic bootstrap confidence interval (LCG resampling, integer-exact)
# ---------------------------------------------------------------------------

_BOOT_B = 200  # bootstrap replicates
_BOOT_SCALE = 1000


@query(
    "stats_bootstrap_ci_weekly_orders",
    oracle=f"""
    WITH base AS (
      SELECT CAST(floor(date_diff('day', DATE '1970-01-01',
                                  CAST(o_orderdate AS DATE)) / 7) AS BIGINT) AS wk,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM orders GROUP BY 1
    ),
    idx AS (
      SELECT wk, x, ROW_NUMBER() OVER (ORDER BY wk) AS rn,
             COUNT(*) OVER () AS n
      FROM base
    ),
    draws AS (
      SELECT b.b, i.i,
             1 + ((b.b * 1000003 + i.i) * 48271 % 2147483647)
                 % (SELECT MAX(n) FROM idx) AS pick
      FROM (SELECT UNNEST(range(1, {_BOOT_B} + 1)) AS b) b,
           (SELECT UNNEST(range(1, (SELECT MAX(n) FROM idx) + 1)) AS i) i
    ),
    reps AS (
      SELECT d.b,
             CAST(({_BOOT_SCALE} * SUM(idx.x)) // MAX(idx.n) AS BIGINT)
               AS mean_q
      FROM draws d JOIN idx ON idx.rn = d.pick
      GROUP BY d.b
    ),
    ranked AS (
      SELECT mean_q, ROW_NUMBER() OVER (ORDER BY mean_q, b) AS rk FROM reps
    )
    SELECT (SELECT CAST(MAX(n) AS BIGINT) FROM idx) AS n_weeks,
           {_BOOT_B} AS n_boot,
           (SELECT CAST(({_BOOT_SCALE} * SUM(x)) // MAX(n) AS BIGINT)
            FROM idx) AS mean_q,
           (SELECT mean_q FROM ranked WHERE rk = 5) AS ci_lo_q,
           (SELECT mean_q FROM ranked WHERE rk = 195) AS ci_hi_q
    """,
)
def stats_bootstrap_ci_weekly_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap confidence interval for the mean weekly order count —
    made fully DETERMINISTIC (and therefore hash-oracle-able, which no
    RNG bootstrap is) by drawing resample indices from an explicit LCG:
    pick(b,i) = 1 + ((b·1000003 + i)·48271 mod 2³¹−1) mod n. {_BOOT_B}
    replicates × n draws, replicate means quantized as (1000·Σx) div n,
    CI = percentile_disc(2.5%/97.5%) of the ranked replicate means (ranks
    5 and 195, ties broken by replicate id). Reproducible uncertainty
    quantification for pipeline metrics — rerunnable on any engine,
    auditable draw by draw; a production run swaps the LCG for a
    splittable counter-based RNG with the identical relational shape.

    Plan: the fact table collapses to the O(weeks) bucket frame first;
    the draw grid is B×n rows (bounded by the AGGREGATE's size, never
    the corpus) built from two nested sequence-explodes, resolved by one
    hash join on the row index, one groupBy(b), one rank over B rows.
    """
    from pyspark.sql import Window

    from oe_batch_processing_spark.tables import load_table

    orders = load_table(spark, sf_dir, "orders")

    base = orders.groupBy(
        F.floor(F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")) / 7)
        .cast("long")
        .alias("wk")
    ).agg(F.count(F.lit(1)).alias("x"))
    w_all = Window.partitionBy()
    idx = base.select(
        "x",
        F.row_number().over(Window.orderBy("wk")).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    n_frame = F.broadcast(idx.agg(F.max("n").alias("n")))
    draws = (
        n_frame.select("n", F.explode(F.expr(f"sequence(1, {_BOOT_B})")).alias("b"))
        .select("n", "b", F.explode(F.expr("sequence(1, n)")).alias("i"))
        .select(
            "b",
            (
                F.lit(1)
                + F.expr("((b * 1000003 + i) * 48271 % 2147483647) % n")
            ).alias("pick"),
        )
    )
    reps = (
        draws.join(idx, draws["pick"] == idx["rn"])
        .groupBy("b")
        .agg(F.expr(f"CAST(({_BOOT_SCALE} * SUM(x)) div MAX(n) AS BIGINT)").alias("mean_q"))
    )
    ranked = reps.select(
        "mean_q", F.row_number().over(Window.orderBy("mean_q", "b")).alias("rk")
    )
    lo = ranked.filter(F.col("rk") == 5).select(F.col("mean_q").alias("ci_lo_q"))
    hi = ranked.filter(F.col("rk") == 195).select(F.col("mean_q").alias("ci_hi_q"))
    overall = idx.agg(
        F.max("n").alias("n_weeks"),
        F.lit(_BOOT_B).alias("n_boot"),
        F.expr(f"CAST(({_BOOT_SCALE} * SUM(x)) div MAX(n) AS BIGINT)").alias("mean_q"),
    )
    return overall.crossJoin(F.broadcast(lo)).crossJoin(F.broadcast(hi))


# --- one-way ANOVA ----------------------------------------------------------

# Shared VERBATIM between Spark and DuckDB (the mlstats doctrine): one
# distributed pass reduces orders x customer to 5 per-segment moment rows
# (exact decimal sums, pre-scaled 1e-5 so squares stay far under the 2^53
# decimal->double bound), the grand totals re-sum those decimals exactly,
# and the between/within sum-of-squares terms are quantized to
# DECIMAL(24,12) per group so the final 5-row sums are order-independent;
# every double expression is the identical IEEE op sequence in both
# engines.
_ANOVA_SQL = """
WITH j AS (
  SELECT c.c_mktsegment AS seg, o.o_totalprice * 1e-5 AS x
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
g AS (
  SELECT seg, COUNT(*) AS n_g,
         CAST(SUM(CAST(x AS DECIMAL(18,8))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(x * x AS DECIMAL(20,10))) AS DOUBLE) AS sxx
  FROM j GROUP BY seg
),
tot AS (
  SELECT CAST(SUM(n_g) AS BIGINT) AS n,
         COUNT(*) AS k,
         CAST(SUM(CAST(sx AS DECIMAL(18,8))) AS DOUBLE) AS s
  FROM g
),
terms AS (
  SELECT
    CAST(g.n_g * ((g.sx / g.n_g) - (t.s / t.n))
               * ((g.sx / g.n_g) - (t.s / t.n)) AS DECIMAL(24,12)) AS ssb_g,
    CAST(g.sxx - (g.sx * g.sx) / g.n_g AS DECIMAL(24,12)) AS ssw_g
  FROM g CROSS JOIN tot t
),
agg AS (
  SELECT CAST(SUM(ssb_g) AS DOUBLE) AS ssb,
         CAST(SUM(ssw_g) AS DOUBLE) AS ssw
  FROM terms
)
SELECT t.k, t.n, a.ssb, a.ssw,
       (a.ssb / (t.k - 1)) / (a.ssw / (t.n - t.k)) AS f_stat,
       a.ssb / (a.ssb + a.ssw) AS eta_sq
FROM agg a CROSS JOIN tot t
"""


@query("stats_anova_oneway", oracle=_ANOVA_SQL)
def stats_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of order totals across the five customer market
    segments: between/within sum of squares, the F statistic, and the
    eta-squared effect size — the standard "does this grouping matter"
    screen a feature-engineering pipeline runs before keeping a
    categorical column.

    Exactness (the sufficient-statistics doctrine): the fact scan reduces
    to per-group (n, sum x, sum x^2) via exact pre-scaled decimal sums;
    grand totals re-sum those (<= 8/10 dp, exactly representable) in
    decimal; each group's SSB/SSW term is one deterministic double
    expression quantized to DECIMAL(24,12), so the cross-group sums are
    order-independent; the F ratio is scalar math on two exact inputs.

    Scale: one shuffle join (orders x customer on custkey) + a map-side
    combinable 5-group aggregate; everything after the moment rows is
    constant-size. The SQL text is shared verbatim with the oracle.
    """
    register_views(spark, sf_dir)
    return spark.sql(_ANOVA_SQL)


# --- Neyman (optimal) stratified-sample allocation --------------------------

_NEYMAN_N = 1_000  # total sample budget to allocate across strata

_NEYMAN_SQL = f"""
WITH j AS (
  SELECT c.c_mktsegment AS seg, o.o_totalprice * 1e-5 AS x
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
g AS (
  SELECT seg, COUNT(*) AS n_h,
         CAST(SUM(CAST(x AS DECIMAL(18,8))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(x * x AS DECIMAL(20,10))) AS DOUBLE) AS sxx
  FROM j GROUP BY seg
),
s AS (
  SELECT seg, n_h,
         SQRT((n_h * sxx - sx * sx) / (CAST(n_h AS DOUBLE) * (n_h - 1)))
           AS std_h
  FROM g
),
w AS (
  -- weights quantize to DECIMAL(24,8) so the cross-strata window SUM is
  -- order-independent (a raw double SUM OVER () differs in the last ULP
  -- between engines). Scale 8, NOT higher: the quantized value must stay
  -- within ~12 significant digits — at scale 12 the 16-digit boundary
  -- exceeded double precision and the two engines' double->decimal
  -- quantizers legitimately disagreed in the last place (measured).
  SELECT seg, n_h, std_h,
         CAST(CAST(n_h * std_h AS DECIMAL(24,8)) AS DOUBLE) AS weight,
         CAST(SUM(CAST(n_h * std_h AS DECIMAL(24,8))) OVER () AS DOUBLE)
           AS total_weight
  FROM s
),
q AS (
  SELECT seg, n_h, std_h,
         {_NEYMAN_N} * (weight / total_weight) AS quota,
         CAST(FLOOR({_NEYMAN_N} * (weight / total_weight)) AS BIGINT)
           AS base_alloc
  FROM w
),
r AS (
  SELECT seg, n_h, std_h, quota, base_alloc,
         ROW_NUMBER() OVER (
           ORDER BY quota - FLOOR(quota) DESC, seg) AS frac_rank,
         {_NEYMAN_N} - SUM(base_alloc) OVER () AS leftover
  FROM q
)
SELECT seg, CAST(n_h AS BIGINT) AS n_h, std_h, quota,
       CAST(base_alloc + CASE WHEN frac_rank <= leftover THEN 1 ELSE 0 END
            AS BIGINT) AS n_alloc
FROM r
"""


@query("sample_neyman_allocation", oracle=_NEYMAN_SQL)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified-sample allocation: split a fixed budget
    of {n} draws across the customer market segments proportionally to
    N_h * S_h (stratum size x within-stratum std of order totals) — the
    allocation that minimizes the stratified-mean variance — with the
    fractional quotas settled by largest-remainder apportionment
    (deterministic tie-break on segment name). This is the DESIGN step
    in front of the existing samplers (`sample_stratified_documents`
    materializes a design; `alloc_largest_remainder` is the apportionment
    primitive); emitting it as a table is what a pipeline ships to its
    sampling stage.

    Exactness: stratum stds come from exact pre-scaled decimal moments
    (the stats_corr_regression convention), the share arithmetic is the
    identical IEEE op sequence in both engines, FLOOR lands on the same
    integers, and the remainder ranking is a total order. SQL shared
    verbatim with the oracle.

    Scale: one shuffle join + a 5-row moment aggregate; the allocation
    window functions run on 5 rows.
    """.format(n=_NEYMAN_N)
    register_views(spark, sf_dir)
    return spark.sql(_NEYMAN_SQL)


# ---------------------------------------------------------------------------
# Rank-correlation battery: Spearman (tie-averaged ranks) + Kendall tau-b
# ---------------------------------------------------------------------------

_RANKCORR_SQL = """
WITH base AS (
  SELECT o_orderpriority AS series,
         CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS mth,
         CAST(COUNT(*) AS BIGINT) AS x,
         CAST(100 * SUM(o_totalprice) AS BIGINT) AS y
  FROM orders GROUP BY 1, 2
),
ranked AS (
  SELECT series, x, y,
         2 * RANK() OVER (PARTITION BY series ORDER BY x)
           + COUNT(*) OVER (PARTITION BY series, x) - 1 AS rx,
         2 * RANK() OVER (PARTITION BY series ORDER BY y)
           + COUNT(*) OVER (PARTITION BY series, y) - 1 AS ry
  FROM base
),
sp AS (
  SELECT series, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(*) * SUM(rx * ry) - SUM(rx) * SUM(ry) AS BIGINT)
           AS spearman_num,
         CAST(COUNT(*) * SUM(rx * rx) - SUM(rx) * SUM(rx) AS BIGINT)
           AS spearman_denx,
         CAST(COUNT(*) * SUM(ry * ry) - SUM(ry) * SUM(ry) AS BIGINT)
           AS spearman_deny
  FROM ranked GROUP BY series
),
kd AS (
  SELECT a.series,
         CAST(COUNT(*) AS BIGINT) AS n0,
         CAST(SUM(CASE WHEN (a.x - b.x) * (a.y - b.y) > 0 THEN 1
                       WHEN (a.x - b.x) * (a.y - b.y) < 0 THEN -1
                       ELSE 0 END) AS BIGINT) AS s_kendall,
         CAST(SUM(CASE WHEN a.x = b.x THEN 1 ELSE 0 END) AS BIGINT) AS tx,
         CAST(SUM(CASE WHEN a.y = b.y THEN 1 ELSE 0 END) AS BIGINT) AS ty
  FROM base a JOIN base b ON a.series = b.series AND a.mth < b.mth
  GROUP BY a.series
)
SELECT s.series, s.n, s.spearman_num, s.spearman_denx, s.spearman_deny,
       CAST(s.spearman_num AS DOUBLE)
         / (sqrt(CAST(s.spearman_denx AS DOUBLE))
            * sqrt(CAST(s.spearman_deny AS DOUBLE))) AS spearman_rho,
       k.n0, k.s_kendall, k.tx, k.ty,
       CAST(k.s_kendall AS DOUBLE)
         / (sqrt(CAST(k.n0 - k.tx AS DOUBLE))
            * sqrt(CAST(k.n0 - k.ty AS DOUBLE))) AS kendall_tau_b
FROM sp s JOIN kd k ON k.series = s.series
WHERE s.spearman_denx > 0 AND s.spearman_deny > 0
  AND k.n0 - k.tx > 0 AND k.n0 - k.ty > 0
"""


@query("stats_rank_correlation_battery", oracle=_RANKCORR_SQL)
def stats_rank_correlation_battery(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Spearman rho (textbook tie-averaged ranks) and Kendall tau-b
    (with both tie corrections) between monthly order volume and monthly
    revenue per priority — the robust are-these-monotonically-related
    primitives that survive outliers and nonlinearity where Pearson
    does not. Exactness: tie-averaged ranks are made integer by
    doubling (2*avg_rank = 2*RANK() + |ties| - 1, the Mann-Whitney
    idiom); all sufficient statistics (Pearson-on-ranks numerator and
    denominators; concordant-minus-discordant S plus per-variable tie
    pair counts) are exact BIGINTs emitted raw, and the final
    irrational ratios are computed with the IDENTICAL IEEE op order in
    both engines (cast, sqrt, sqrt, multiply, divide — each operation
    correctly rounded, so identical inputs give bit-identical doubles;
    the repo's established sqrt/divide idiom).

    Scale: one fact-table collapse to the O(months * series) frame;
    ranks are windows over that bounded frame, and the Kendall pair
    join is O(months^2) per series over the COLLAPSED frame (bounded by
    the calendar, not the data; for series long enough to matter, the
    O(n log n) merge-sort inversion count is the drop-in replacement).
    Shared-SQL verbatim on both engines.
    """
    register_views(spark, sf_dir)
    return spark.sql(_RANKCORR_SQL)


# ---------------------------------------------------------------------------
# RANSAC robust line fit with deterministic seeded sampling
# ---------------------------------------------------------------------------

_RANSAC_K = 32      # candidate models per series
_RANSAC_SEED = "rs7"


def _u60(col: str) -> str:
    """60-bit uniform from 15 md5 nibbles of column ``col`` (the
    dq_dp_geometric_counts idiom; multipliers CAST to BIGINT — small
    powers of 16 otherwise type the product INT32 on Spark and wrap)."""
    return " + ".join(
        f"(instr('0123456789abcdef', substr({col}, {i}, 1)) - 1)"
        f" * CAST({16 ** (15 - i)} AS BIGINT)"
        for i in range(1, 16)
    )


_RANSAC_KS = ", ".join(f"({k})" for k in range(1, _RANSAC_K + 1))

_RANSAC_SQL = f"""
WITH base AS (
  SELECT o_orderpriority AS series,
         CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS mth,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM orders GROUP BY 1, 2
),
pts AS (
  SELECT series, y,
         CAST(ROW_NUMBER() OVER (PARTITION BY series ORDER BY mth)
              AS BIGINT) AS t
  FROM base
),
sstats AS (
  SELECT series, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS sy
  FROM pts GROUP BY 1
),
tolc AS (
  SELECT series, n,
         GREATEST(CAST(FLOOR(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) / 10.0)
                       AS BIGINT), 1) AS tol
  FROM sstats
),
ks(k) AS (VALUES {_RANSAC_KS}),
cand0 AS (
  SELECT t.series, t.n, t.tol, ks.k,
         md5(t.series || ':' || CAST(ks.k AS STRING) || ':a:{_RANSAC_SEED}')
           AS ha,
         md5(t.series || ':' || CAST(ks.k AS STRING) || ':b:{_RANSAC_SEED}')
           AS hb
  FROM tolc t CROSS JOIN ks
),
cand1 AS (
  SELECT series, n, tol, k,
         1 + ({_u60('ha')}) % n AS i0,
         1 + ({_u60('hb')}) % (n - 1) AS j0
  FROM cand0
),
cand AS (
  SELECT series, n, tol, k, i0 AS i,
         j0 + CASE WHEN j0 >= i0 THEN 1 ELSE 0 END AS j
  FROM cand1
),
lines AS (
  SELECT c.series, c.k, c.tol,
         pi.t AS t1, pi.y AS y1,
         pj.t - pi.t AS dx, pj.y - pi.y AS dy
  FROM cand c
  JOIN pts pi ON pi.series = c.series AND pi.t = c.i
  JOIN pts pj ON pj.series = c.series AND pj.t = c.j
),
scored AS (
  SELECT l.series, l.k, l.tol, l.t1, l.y1, l.dx, l.dy,
         CAST(SUM(CASE WHEN ABS(l.dx * (p.y - l.y1) - l.dy * (p.t - l.t1))
                            <= l.tol * ABS(l.dx)
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_in
  FROM lines l JOIN pts p ON p.series = l.series
  GROUP BY l.series, l.k, l.tol, l.t1, l.y1, l.dx, l.dy
),
best AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY series
                            ORDER BY n_in DESC, k) AS rk
  FROM scored
),
refit AS (
  SELECT b.series, b.k, b.n_in, b.tol,
         CAST(COUNT(*) AS BIGINT) AS n2,
         CAST(SUM(p.t) AS BIGINT) AS st,
         CAST(SUM(p.y) AS BIGINT) AS syy,
         CAST(SUM(p.t * p.y) AS BIGINT) AS sty,
         CAST(SUM(p.t * p.t) AS BIGINT) AS stt
  FROM best b
  JOIN pts p ON p.series = b.series
    AND ABS(b.dx * (p.y - b.y1) - b.dy * (p.t - b.t1))
          <= b.tol * ABS(b.dx)
  WHERE b.rk = 1
  GROUP BY b.series, b.k, b.n_in, b.tol
)
SELECT series, CAST(k AS INTEGER) AS k_best, n_in, tol,
       n2 AS n_refit, st, syy, sty, stt,
       CAST(n2 * sty - st * syy AS DOUBLE)
         / CAST(n2 * stt - st * st AS DOUBLE) AS slope,
       (CAST(syy AS DOUBLE)
        - (CAST(n2 * sty - st * syy AS DOUBLE)
           / CAST(n2 * stt - st * st AS DOUBLE)) * CAST(st AS DOUBLE))
         / CAST(n2 AS DOUBLE) AS intercept
FROM refit
"""


@query("stats_ransac_line_fit", oracle=_RANSAC_SQL)
def stats_ransac_line_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANSAC — the classical robust regression: fit a trend line to the
    monthly order-count series per priority by consensus rather than
    least squares, so outlier months cannot drag the fit (the failure
    mode Theil-Sen addresses by medians; RANSAC addresses it by random
    sampling + inlier voting, and is THE standard in vision/robotics
    pipelines). Made fully deterministic and hash-oracleable: the 32
    candidate point-pairs are drawn by md5-seeded 60-bit uniforms
    (distinct-index correction j -> j + [j >= i]), the inlier test is
    EXACT integer arithmetic (|dx*(y-y1) - dy*(t-t1)| <= tol*|dx| — the
    cross-multiplied point-to-line residual, no division anywhere), the
    winner is argmax inliers with a deterministic low-k tie-break, and
    the final least-squares REFIT on the consensus set emits exact
    BIGINT moments plus slope/intercept doubles computed with identical
    IEEE op order in both engines. The tolerance is data-adaptive
    (10 percent of the mean count, floor-exact).

    Scale: the fact table collapses once to the calendar-length series;
    candidates x points is a K * months frame per series (bounded by
    the calendar); one window picks winners; the refit is one more
    bounded join. Shared-SQL verbatim on both engines.
    """
    register_views(spark, sf_dir)
    return spark.sql(_RANSAC_SQL)

