"""Time-series operators: forward-fill gap repair and windowed EWMA.

The reference's pipelines stop at record parsing (lib/batchProcessing.js is
a row-at-a-time ETL loop); these are the time-series shapes a telemetry /
training-data pipeline layers on top once events are tabular. Both are pure
JVM column expressions (no Python UDFs).

Scale notes (SCALE.md has the full argument):
  - ``events_gap_fill_locf`` windows over the *dense grid*, not the raw
    events — the grid is O(time-span / bucket) rows (105k/year at 5-min
    buckets), thousands of times smaller than the 100 TB event set, so the
    single-partition ordered window over it is deliberate and bounded. The
    per-bucket aggregation that feeds it is a normal hash-partitioned
    groupBy over events. For per-series fill (millions of series), the same
    expressions run under ``Window.partitionBy("series")`` unchanged.
  - ``events_ewma_user`` is a bounded ROWS window (18 rows) partitioned by
    user — state per task is constant; skewed users are split by AQE. The
    binary decay (alpha = 1/2, 18 terms) keeps every weight a power of two,
    so weighted terms are exact double scalings and the decimal-sum
    convention (registry.dsum) gives bit-identical cross-engine results —
    the same trick that makes the money sums exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from oe_batch_processing_spark.registry import query
from oe_batch_processing_spark.tables import load_table

_BUCKET_S = 300  # 5-minute buckets

# EWMA contract: alpha = 1/2, truncated at 18 terms (adjust=True form:
# weights renormalized over the terms present). Weight of the k-th most
# recent term is 2^(17-k); terms older than 18 steps would carry relative
# weight < 2^-17 ~ 8e-6 and are dropped — identically in both engines,
# because the formula (not floating-point luck) defines the cutoff.
_EWMA_TERMS = 18
_EWMA_TOP = _EWMA_TERMS - 1  # exponent of the newest term


@query(
    "events_gap_fill_locf",
    oracle=f"""
    WITH bounds AS (
      SELECT CAST(floor(MIN(epoch(ts)) / {_BUCKET_S}) AS BIGINT) AS b0,
             CAST(floor(MAX(epoch(ts)) / {_BUCKET_S}) AS BIGINT) AS b1
      FROM events
    ),
    grid AS (
      SELECT b0 + i AS bucket FROM bounds, UNNEST(range(b1 - b0 + 1)) AS t(i)
    ),
    agg AS (
      SELECT CAST(floor(epoch(ts) / {_BUCKET_S}) AS BIGINT) AS bucket,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value)
               AS avg_value
      FROM events GROUP BY 1
    ),
    joined AS (
      SELECT grid.bucket, COALESCE(n, 0) AS n_events, avg_value,
             COUNT(avg_value) OVER (ORDER BY grid.bucket) AS fill_grp
      FROM grid LEFT JOIN agg ON grid.bucket = agg.bucket
    )
    SELECT strftime(make_timestamp(bucket * {_BUCKET_S} * 1000000),
                    '%Y-%m-%d %H:%M:%S') AS bucket_ts,
           n_events,
           MAX(avg_value) OVER (PARTITION BY fill_grp) AS filled_avg,
           CAST(n_events = 0 AS BOOLEAN) AS is_filled
    FROM joined
    """,
)
def events_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap repair by last-observation-carried-forward: densify event time
    to a 5-minute grid (sequence+explode — no driver loop), then carry the
    last seen bucket-average across empty buckets. The fill uses the
    non-null running count as a group id and a per-group MAX — a
    formulation that needs no IGNORE NULLS support. Both windows run in
    the single grid-sized partition (one SinglePartition exchange; the
    second window re-sorts in place on the group id — no second
    exchange). ``is_filled`` marks carried rows so downstream models can
    weight them.

    Distinct from ``events_resample_5min`` (zero-fill counts): LOCF repairs
    a *level* signal, zero-fill repairs a *rate* signal.
    """
    e = load_table(spark, sf_dir, "events")
    bucket = F.floor(F.unix_micros("ts") / F.lit(_BUCKET_S * 1_000_000)).alias(
        "bucket"
    )
    bounds = e.select(bucket).agg(
        F.min("bucket").alias("b0"), F.max("bucket").alias("b1")
    )
    grid = bounds.select(
        F.explode(F.sequence(F.col("b0"), F.col("b1"))).alias("bucket")
    )
    agg = (
        e.select(bucket, "value")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                / F.count("value")
            ).alias("avg_value"),
        )
    )
    w_run = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    joined = (
        grid.join(agg, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("n", F.lit(0)).alias("n_events"),
            "avg_value",
        )
        .withColumn("fill_grp", F.count("avg_value").over(w_run))
    )
    w_grp = Window.partitionBy("fill_grp")
    return joined.select(
        F.date_format(
            F.timestamp_seconds(F.col("bucket") * _BUCKET_S),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("bucket_ts"),
        "n_events",
        F.max("avg_value").over(w_grp).alias("filled_avg"),
        (F.col("n_events") == 0).alias("is_filled"),
    )


@query(
    "events_ewma_user",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
      FROM events
    ),
    pairs AS (
      SELECT a.user_id, a.event_id, a.value,
             CAST(b.value * POW(2, {_EWMA_TOP} - (a.rn - b.rn))
                  AS DECIMAL(18,6)) AS term,
             CAST(POW(2, {_EWMA_TOP} - (a.rn - b.rn)) AS DECIMAL(18,6)) AS wt
      FROM seq a JOIN seq b
        ON b.user_id = a.user_id
       AND b.rn BETWEEN a.rn - {_EWMA_TOP} AND a.rn
    )
    SELECT user_id, event_id, value,
           CAST(SUM(term) AS DOUBLE) / CAST(SUM(wt) AS DOUBLE) AS ewma
    FROM pairs
    GROUP BY user_id, event_id, value
    """,
)
def events_ewma_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially weighted moving average of event value
    (alpha = 1/2, 18-term truncated, adjust=True renormalization — the
    pandas ``ewm(alpha=.5, adjust=True)`` form, truncated where weights
    fall below 2^-17).

    Implementation: one bounded ROWS window collects the last 18 values in
    order; a higher-order ``transform`` assigns each the power-of-two
    weight 2^(17 - age) and an ``aggregate`` folds the decimal sum — all
    JVM expressions, no shuffle beyond the one hash partition on user_id.
    Powers of two make every weighted term an exact double scaling, so the
    decimal casts agree bit-for-bit with the oracle's self-join form.
    """
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-_EWMA_TOP, 0)
    )
    arr = F.collect_list("value").over(w)  # oldest -> current, <= 18 values
    witharr = e.select("user_id", "event_id", "value", arr.alias("arr"))
    # age of element i (0-based, oldest first) = size - 1 - i; weight
    # exponent = TOP - age, matching the oracle's TOP - (a.rn - b.rn).
    sz = F.size("arr")
    exp_of = lambda i: F.lit(_EWMA_TOP) - (sz - 1 - i)  # noqa: E731
    dec = "decimal(18,6)"
    terms = F.transform(
        "arr", lambda x, i: (x * F.pow(F.lit(2.0), exp_of(i))).cast(dec)
    )
    wts = F.transform(
        "arr", lambda x, i: F.pow(F.lit(2.0), exp_of(i)).cast(dec)
    )
    zero = F.lit(0).cast(dec)
    # decimal + widens to (19,6); cast back so the fold keeps the
    # accumulator type (values stay ~1e10, far under the (18,6) bound).
    add = lambda acc, x: (acc + x).cast(dec)  # noqa: E731
    num = F.aggregate(terms, zero, add).cast("double")
    den = F.aggregate(wts, zero, add).cast("double")
    return witharr.select(
        "user_id", "event_id", "value", (num / den).alias("ewma")
    )


@query(
    "events_type_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev_type
      FROM events
    ),
    cnt AS (
      SELECT prev_type, event_type AS next_type, COUNT(*) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT prev_type, SUM(n) AS row_n FROM cnt GROUP BY 1
    )
    SELECT c.prev_type, c.next_type, CAST(c.n AS BIGINT) AS n,
           CAST((1000000 * c.n) // t.row_n AS BIGINT) AS p_scaled
    FROM cnt c JOIN tot t USING (prev_type)
    ORDER BY 1, 2
    """,
)
def events_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    for each (prev_type -> next_type) pair, the transition count and the
    row-normalized probability quantized to parts-per-million ((1e6 * n)
    div row_total — integer floor division, engine-exact; same convention
    as the langmodel operators). The behavioral-model primitive for
    funnels, anomaly detection, and synthetic-session generation.

    Scale: one shuffle partitions users for the LAG window (per-user state,
    AQE splits skewed users), then a |types|^2-row aggregation — the
    transition matrix is tiny regardless of event volume.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    cnt = (
        seq.groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = cnt.groupBy("prev_type").agg(F.sum("n").alias("row_n"))
    return (
        cnt.join(tot, "prev_type")
        .select(
            "prev_type",
            "next_type",
            "n",
            F.expr("(1000000L * n) div row_n").alias("p_scaled"),
        )
        .orderBy("prev_type", "next_type")
    )


@query(
    "events_resample_interp_linear",
    oracle=f"""
    WITH bounds AS (
      SELECT CAST(floor(MIN(epoch(ts)) / {_BUCKET_S}) AS BIGINT) AS b0,
             CAST(floor(MAX(epoch(ts)) / {_BUCKET_S}) AS BIGINT) AS b1
      FROM events
    ),
    grid AS (
      SELECT b0 + i AS bucket FROM bounds, UNNEST(range(b1 - b0 + 1)) AS t(i)
    ),
    agg AS (
      SELECT CAST(floor(epoch(ts) / {_BUCKET_S}) AS BIGINT) AS bucket,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value)
               AS avg_value
      FROM events GROUP BY 1
    ),
    ctx AS (
      SELECT grid.bucket, COALESCE(n, 0) AS n_events, avg_value,
             LAST_VALUE(avg_value IGNORE NULLS) OVER
               (ORDER BY grid.bucket
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             LAST_VALUE(CASE WHEN avg_value IS NOT NULL THEN grid.bucket END
                        IGNORE NULLS) OVER
               (ORDER BY grid.bucket
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pb,
             FIRST_VALUE(avg_value IGNORE NULLS) OVER
               (ORDER BY grid.bucket
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             FIRST_VALUE(CASE WHEN avg_value IS NOT NULL THEN grid.bucket END
                         IGNORE NULLS) OVER
               (ORDER BY grid.bucket
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb
      FROM grid LEFT JOIN agg ON grid.bucket = agg.bucket
    )
    SELECT strftime(make_timestamp(bucket * {_BUCKET_S} * 1000000),
                    '%Y-%m-%d %H:%M:%S') AS bucket_ts,
           n_events,
           CASE WHEN avg_value IS NOT NULL THEN avg_value
                WHEN pv IS NULL OR nv IS NULL THEN NULL
                ELSE pv + (nv - pv) * (CAST(bucket - pb AS DOUBLE)
                                       / CAST(nb - pb AS DOUBLE))
           END AS interp_value,
           CAST(avg_value IS NULL AS BOOLEAN) AS is_interpolated
    FROM ctx
    """,
)
def events_resample_interp_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation resampling: densify to the 5-minute grid and
    fill empty buckets by time-weighted interpolation between the
    nearest observed bucket averages on each side — the LEVEL-signal
    repair for downstream models that can't tolerate LOCF's staircase
    bias (``events_gap_fill_locf`` is the step-function twin; grid edges
    with only one neighbor stay NULL rather than extrapolate).

    Cross-engine exactness: the interpolation weight is a ratio of
    bucket-index INTEGERS, and both engines evaluate the identical
    double expression tree on identical inputs — one fused
    multiply-free formula, no reassociation — so even invented values
    hash-match bit-for-bit.

    Scale: same single-Exchange shape as LOCF — the fact-sized work is
    the per-bucket aggregate; all four carry windows run over the dense
    GRID (time-span-bounded, not data-bounded), and per-series
    interpolation just adds partitionBy(series) to every window.
    """
    e = load_table(spark, sf_dir, "events")
    bucket = F.floor(F.unix_micros("ts") / F.lit(_BUCKET_S * 1_000_000)).alias(
        "bucket"
    )
    bounds = e.select(bucket).agg(
        F.min("bucket").alias("b0"), F.max("bucket").alias("b1")
    )
    grid = bounds.select(
        F.explode(F.sequence(F.col("b0"), F.col("b1"))).alias("bucket")
    )
    agg = (
        e.select(bucket, "value")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                / F.count("value")
            ).alias("avg_value"),
        )
    )
    wb = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    wf = Window.orderBy("bucket").rowsBetween(0, Window.unboundedFollowing)
    known_bucket = F.when(
        F.col("avg_value").isNotNull(), F.col("bucket")
    )
    ctx = (
        grid.join(agg, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("n", F.lit(0)).alias("n_events"),
            "avg_value",
        )
        .withColumn("pv", F.last("avg_value", ignorenulls=True).over(wb))
        .withColumn("pb", F.last(known_bucket, ignorenulls=True).over(wb))
        .withColumn("nv", F.first("avg_value", ignorenulls=True).over(wf))
        .withColumn("nb", F.first(known_bucket, ignorenulls=True).over(wf))
    )
    interp = (
        F.when(F.col("avg_value").isNotNull(), F.col("avg_value"))
        .when(F.col("pv").isNull() | F.col("nv").isNull(), F.lit(None))
        .otherwise(
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (
                (F.col("bucket") - F.col("pb")).cast("double")
                / (F.col("nb") - F.col("pb")).cast("double")
            )
        )
    )
    return ctx.select(
        F.date_format(
            F.timestamp_seconds(F.col("bucket") * _BUCKET_S),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("bucket_ts"),
        "n_events",
        interp.alias("interp_value"),
        F.col("avg_value").isNull().alias("is_interpolated"),
    )


@query(
    "events_weekly_seasonality",
    oracle="""
    SELECT CAST(dayofweek(ts) AS INT) AS dow_sun0,
           CAST(hour(ts) AS INT) AS hr,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
             AS avg_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY 1, 2
    """,
)
def events_weekly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly seasonality profile: the (day-of-week × hour) activity grid
    — event counts, exact mean value, distinct users — the baseline
    surface that anomaly detectors and capacity planners diff against
    ("is this Tuesday 3pm normal FOR a Tuesday 3pm?"). Day numbering is
    normalized to DuckDB's Sunday=0 (Spark's dayofweek is Sunday=1, the
    ``scalar_interval_arith`` convention).

    Scale: one map-side-combined aggregate into a fixed 168-cell grid —
    the profile is constant-size regardless of event volume, and
    re-buildable incrementally per partition then merged (counts and
    decimal sums add; the distinct-user column is the one non-mergeable
    — swap for an HLL sketch per cell at 100 TB, the
    ``sketch_hll_user_rollup`` shape).
    """
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(
        (F.dayofweek("ts") - 1).cast("int").alias("dow_sun0"),
        F.hour("ts").cast("int").alias("hr"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_value"),
        F.count_distinct("user_id").alias("n_users"),
    )


@query(
    "events_late_arrival_profile",
    oracle="""
    WITH o AS (
      SELECT event_type, event_id,
             CAST(epoch_ns(ts) // 1000 AS BIGINT) AS ts_us
      FROM events
    ),
    d AS (
      SELECT event_type,
             GREATEST(COALESCE(MAX(ts_us) OVER w, ts_us) - ts_us, 0)
               AS late_us
      FROM o
      WINDOW w AS (PARTITION BY event_type ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_out_of_order,
           CAST(SUM(CASE WHEN late_us > 60000000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_late_1m,
           CAST(SUM(CASE WHEN late_us > 600000000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_late_10m,
           MAX(late_us) // 1000000 AS max_disorder_sec
    FROM d GROUP BY event_type
    """,
)
def events_late_arrival_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-orderness profile — the measurement that SIZES a watermark:
    treating event_id as arrival order, each event's lateness is how far
    its event time lags the running max of everything that arrived
    before it; reported per type as disorder counts at 0s/1m/10m
    thresholds plus the worst case. Run this BEFORE picking
    ``withWatermark`` bounds (streaming/event_windows.py uses 1 hour) —
    a watermark below the observed tail silently drops those rows, a
    watermark far above it holds state for no reason.

    Scale: one shuffle on event_type for the ordered pass (same exchange
    any per-key window pays), then a map-side-combined fold to
    |types| rows.
    """
    e = load_table(spark, sf_dir, "events")
    o = e.select(
        "event_type", "event_id", F.unix_micros("ts").alias("ts_us")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    late = F.greatest(
        F.coalesce(F.max("ts_us").over(w), F.col("ts_us")) - F.col("ts_us"),
        F.lit(0),
    )
    d = o.select("event_type", late.alias("late_us"))
    return d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("late_us") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_out_of_order"),
        F.sum(F.when(F.col("late_us") > 60_000_000, 1).otherwise(0))
        .cast("long")
        .alias("n_late_1m"),
        F.sum(F.when(F.col("late_us") > 600_000_000, 1).otherwise(0))
        .cast("long")
        .alias("n_late_10m"),
        F.expr("max(late_us) div 1000000").alias("max_disorder_sec"),
    )


@query(
    "events_anomaly_seasonal",
    oracle="""
    WITH base AS (
      SELECT event_id, event_type, value,
             CAST(dayofweek(ts) AS INT) AS dow, CAST(hour(ts) AS INT) AS hr
      FROM events
    ),
    cells AS (
      SELECT event_type, dow, hr,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
               AS cell_mean
      FROM base GROUP BY 1, 2, 3
    ),
    resid AS (
      SELECT b.event_id, b.event_type, b.value,
             CAST(b.value - c.cell_mean AS DECIMAL(18,6)) AS r
      FROM base b JOIN cells c
        ON c.event_type = b.event_type AND c.dow = b.dow AND c.hr = b.hr
    ),
    stats AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(r) AS DOUBLE) AS s1,
             CAST(SUM(CAST(CAST(r AS DOUBLE) * CAST(r AS DOUBLE)
                  AS DECIMAL(18,6))) AS DOUBLE) AS s2
      FROM resid
    )
    SELECT event_id, event_type, value,
           CAST(r AS DOUBLE) / SQRT((s2 - s1 * s1 / n) / n) AS seasonal_z
    FROM resid, stats
    WHERE ABS(CAST(r AS DOUBLE) / SQRT((s2 - s1 * s1 / n) / n)) > 4.0
    """,
)
def events_anomaly_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonally-adjusted anomaly detection: each event is scored
    against its OWN (type × day-of-week × hour) baseline cell, and the
    residual is z-scored against the global residual distribution —
    "high for 3am Sunday" flags that a raw z-score (which mixes Monday
    peaks with Sunday troughs into one inflated variance) structurally
    misses. Residuals are decimal-quantized before the moment sums, so
    the z-scores and the flag boundary are engine-exact; SQRT is
    correctly rounded per IEEE-754.

    Scale: the baseline grid is |types| × 168 cells (broadcast back);
    the residual moments are one map-side-combined fold; flagging is a
    codegen filter over the enriched stream. The streaming twin keeps
    the same grid as a static broadcast against a live stream
    (``stream_static_enrich`` shape).
    """
    e = load_table(spark, sf_dir, "events")
    base = e.select(
        "event_id",
        "event_type",
        "value",
        F.dayofweek("ts").cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hr"),
    )
    cells = base.groupBy("event_type", "dow", "hr").agg(
        (
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("cell_mean")
    )
    resid = base.join(
        F.broadcast(cells), ["event_type", "dow", "hr"]
    ).select(
        "event_id",
        "event_type",
        "value",
        (F.col("value") - F.col("cell_mean"))
        .cast("decimal(18,6)")
        .alias("r"),
    )
    stats = resid.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("r").cast("double").alias("s1"),
        F.sum(
            (F.col("r").cast("double") * F.col("r").cast("double")).cast(
                "decimal(18,6)"
            )
        )
        .cast("double")
        .alias("s2"),
    )
    j = resid.crossJoin(F.broadcast(stats))
    z = F.col("r").cast("double") / F.sqrt(
        (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / F.col("n")
    )
    return j.filter(F.abs(z) > 4.0).select(
        "event_id", "event_type", "value", z.alias("seasonal_z")
    )


_CUSUM_TARGET = "52.0"  # drift reference k: detect sustained upward shift
_CUSUM_H = 120.0  # alarm threshold on the one-sided CUSUM statistic


@query(
    "events_changepoint_cusum",
    oracle=f"""
    WITH e AS (
      SELECT user_id, ts, event_id,
             CAST(value - {_CUSUM_TARGET} AS DECIMAL(18,6)) AS y
      FROM events
    ),
    p AS (
      SELECT user_id, ts, event_id, y,
             SUM(y) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS prefix
      FROM e
    ),
    m AS (
      SELECT user_id, event_id, ts, prefix,
             MIN(prefix) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS mn
      FROM p
    ),
    s AS (
      SELECT user_id, event_id,
             CAST(CASE WHEN mn < 0 THEN prefix - mn ELSE prefix END
                  AS DOUBLE) AS cusum
      FROM m
    )
    SELECT user_id, event_id, cusum FROM s WHERE cusum > {_CUSUM_H}
    """,
)
def events_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM changepoint detector per user: alarms where the
    cumulative excess of ``value`` over a reference level builds past a
    threshold — the classic sequential shift detector (Page 1954).

    The textbook form is a recurrence, S_i = max(0, S_{i-1} + y_i),
    which looks stream-only; it is in fact window-expressible through
    the prefix identity S_i = P_i - min(0, min_{j<=i} P_j) (running sum
    minus the running minimum of the running sum). That turns an
    order-dependent loop into two stock window aggregates — no UDF, no
    applyInPandas, full codegen.

    Exactness: terms quantize to DECIMAL(18,6); both window passes stay
    decimal (the subtraction keeps both operands the engine's own
    promoted decimal type — mixing widths through LEAST() makes DuckDB
    fall back to double and drift ULPs), with a single decimal->double
    cast at the end.

    Scale: one hash shuffle on user_id; both windows and the filter run
    in the same partitioning (a single Exchange + Sort in the plan).
    State per task is O(1) per series. The streaming twin of this shape
    is an applyInPandasWithState carry of (S, min_prefix).
    """
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    y = F.expr(f"CAST(value - {_CUSUM_TARGET} AS DECIMAL(18,6))")
    prefix = F.sum(y).over(w)
    base = events.select(
        "user_id", "ts", "event_id", prefix.alias("prefix")
    ).withColumn("mn", F.min("prefix").over(w))
    cusum = F.when(
        F.col("mn") < 0, F.col("prefix") - F.col("mn")
    ).otherwise(F.col("prefix")).cast("double")
    return (
        base.select("user_id", "event_id", cusum.alias("cusum"))
        .filter(F.col("cusum") > _CUSUM_H)
    )


_HOLT_ORACLE = """
WITH RECURSIVE base AS (
  SELECT o_orderpriority AS series,
         CAST(floor(date_diff('day', DATE '1970-01-01',
                              CAST(o_orderdate AS DATE)) / 7) AS BIGINT) AS wk,
         COUNT(*) AS x
  FROM orders GROUP BY 1, 2
),
seq AS (
  SELECT series, wk, CAST(x AS DOUBLE) AS x,
         ROW_NUMBER() OVER (PARTITION BY series ORDER BY wk) AS rn
  FROM base
),
holt AS (
  SELECT series, rn, wk, x,
         x AS level,
         COALESCE((SELECT s2.x FROM seq s2
          WHERE s2.series = seq.series AND s2.rn = 2) - x, 0.0) AS trend
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.series, s.rn, s.wk, s.x,
         0.5 * s.x + 0.5 * (h.level + h.trend) AS level,
         0.5 * ((0.5 * s.x + 0.5 * (h.level + h.trend)) - h.level)
           + 0.5 * h.trend AS trend
  FROM holt h JOIN seq s ON s.series = h.series AND s.rn = h.rn + 1
)
SELECT series, CAST(rn AS INTEGER) AS rn, wk, x, level, trend,
       level + trend AS forecast_next
FROM holt
"""


@query("orders_forecast_holt", oracle=_HOLT_ORACLE)
def orders_forecast_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend exponential smoothing over the weekly order
    count per priority: level_t = a*x_t + (1-a)(level+trend),
    trend_t = b*(level_t - level) + (1-b)*trend with a = b = 1/2,
    initialized level_1 = x_1, trend_1 = x_2 - x_1. Emits the full
    fitted path plus the one-step forecast.

    This is the genuinely sequential family (the recurrence couples
    level and trend, so no prefix identity exists as it does for CUSUM)
    — the correct Spark shape is ``applyInPandas`` per series: the
    recurrence runs as a plain float64 loop over each (bounded,
    time-length) series while Spark parallelizes ACROSS series. The
    oracle is a DuckDB recursive CTE stepping the identical IEEE
    expressions in the identical order — bit-equal doubles with no
    decimal crutch, which is the exactness argument: same ops, same
    order, same floats.

    Scale: series count partitions the work (here 5, at 100 TB
    millions); each group is O(weeks), not O(events) — the groupBy
    pre-aggregation collapses the fact table before any Python sees it.
    """
    orders = load_table(spark, sf_dir, "orders")
    base = orders.groupBy(
        F.col("o_orderpriority").alias("series"),
        F.floor(F.unix_date(F.col("o_orderdate").cast("date")) / 7)
        .cast("bigint")
        .alias("wk"),
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))

    def fit(pdf):
        import pandas as pd

        pdf = pdf.sort_values("wk").reset_index(drop=True)
        n = len(pdf)
        x = pdf["x"].to_numpy()
        level = [0.0] * n
        trend = [0.0] * n
        if n >= 1:
            level[0] = float(x[0])
            trend[0] = (float(x[1]) - float(x[0])) if n >= 2 else 0.0
        for i in range(1, n):
            lv = 0.5 * float(x[i]) + 0.5 * (level[i - 1] + trend[i - 1])
            tr = 0.5 * (lv - level[i - 1]) + 0.5 * trend[i - 1]
            level[i] = lv
            trend[i] = tr
        return pd.DataFrame(
            {
                "series": pdf["series"],
                "rn": range(1, n + 1),
                "wk": pdf["wk"],
                "x": pdf["x"],
                "level": level,
                "trend": trend,
                "forecast_next": [lv + tr for lv, tr in zip(level, trend)],
            }
        )

    return base.groupBy("series").applyInPandas(
        fit,
        "series string, rn int, wk bigint, x double, level double,"
        " trend double, forecast_next double",
    )


_HW_ORACLE = """
WITH RECURSIVE base AS (
  SELECT o_orderpriority AS series,
         date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day,
         CAST(COUNT(*) AS DOUBLE) AS x
  FROM orders GROUP BY 1, 2
),
seq AS (
  SELECT series, day, x,
         ROW_NUMBER() OVER (PARTITION BY series ORDER BY day) AS rn
  FROM base
),
r AS (
  SELECT series, rn, day, x,
         0.5 * (x - 0.0) + 0.5 * (0.0 + 0.0) AS l,
         0.5 * ((0.5 * (x - 0.0) + 0.5 * (0.0 + 0.0)) - 0.0) + 0.5 * 0.0 AS b,
         [CASE WHEN j = 0 THEN
            0.5 * (x - (0.5 * (x - 0.0) + 0.5 * (0.0 + 0.0))) + 0.5 * 0.0
          ELSE 0.0 END FOR j IN range(7)] AS s
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT q.series, q.rn, q.day, q.x,
         0.5 * (q.x - r.s[(q.rn - 1) % 7 + 1]) + 0.5 * (r.l + r.b) AS l,
         0.5 * ((0.5 * (q.x - r.s[(q.rn - 1) % 7 + 1]) + 0.5 * (r.l + r.b))
                - r.l) + 0.5 * r.b AS b,
         [CASE WHEN j = (q.rn - 1) % 7 THEN
            0.5 * (q.x - (0.5 * (q.x - r.s[(q.rn - 1) % 7 + 1])
                          + 0.5 * (r.l + r.b)))
            + 0.5 * r.s[(q.rn - 1) % 7 + 1]
          ELSE r.s[j + 1] END FOR j IN range(7)] AS s
  FROM r JOIN seq q ON q.series = r.series AND q.rn = r.rn + 1
)
SELECT series, CAST(rn AS INTEGER) AS rn, CAST(day AS BIGINT) AS day, x,
       l AS level, b AS trend,
       s[(rn - 1) % 7 + 1] AS seasonal,
       l + b + s[rn % 7 + 1] AS forecast_next
FROM r
"""


@query("orders_forecast_holt_winters", oracle=_HW_ORACLE)
def orders_forecast_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt-Winters (triple exponential smoothing) with weekly
    seasonality over the DAILY order-count series per priority — the
    forecasting-family completion past ``orders_forecast_holt``: level,
    trend AND a 7-phase seasonal ring, alpha = beta = gamma = 1/2,
    uniformly zero-initialized (l_{-1} = b_{-1} = s = 0, so the recurrence
    needs no special first-row case):

        l_i = ½(x_i − s_prev) + ½(l + b)
        b_i = ½(l_i − l) + ½b
        s[phase] = ½(x_i − l_i) + ½s_prev,   phase = (rn−1) mod 7
        forecast = l_i + b_i + s[next phase]

    Same exactness argument as Holt: both engines step the identical IEEE
    expressions in the identical order — the DuckDB oracle is a recursive
    CTE carrying the seasonal ring as a 7-double list — so the fitted path
    hash-matches bit-for-bit with no decimal scaffolding. The phase is the
    row index mod 7 (observed-day sequence; a production run gap-fills
    first — ``events_gap_fill_locf`` is that operator).

    Scale: identical to Holt — the fact table collapses to O(days) per
    series before any Python; ``applyInPandas`` parallelizes across
    series; the per-series loop is O(days) with an O(7) ring.
    """
    orders = load_table(spark, sf_dir, "orders")
    base = orders.groupBy(
        F.col("o_orderpriority").alias("series"),
        F.unix_date(F.col("o_orderdate").cast("date")).cast("bigint").alias("day"),
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))

    def fit(pdf):
        import pandas as pd

        pdf = pdf.sort_values("day").reset_index(drop=True)
        n = len(pdf)
        x = pdf["x"].to_numpy()
        level = [0.0] * n
        trend = [0.0] * n
        seasonal = [0.0] * n
        forecast = [0.0] * n
        s = [0.0] * 7
        l_prev = 0.0
        b_prev = 0.0
        for i in range(n):
            phase = i % 7
            sprev = s[phase]
            xv = float(x[i])
            lv = 0.5 * (xv - sprev) + 0.5 * (l_prev + b_prev)
            bv = 0.5 * (lv - l_prev) + 0.5 * b_prev
            s[phase] = 0.5 * (xv - lv) + 0.5 * sprev
            level[i] = lv
            trend[i] = bv
            seasonal[i] = s[phase]
            forecast[i] = lv + bv + s[(phase + 1) % 7]
            l_prev, b_prev = lv, bv
        return pd.DataFrame(
            {
                "series": pdf["series"],
                "rn": range(1, n + 1),
                "day": pdf["day"],
                "x": pdf["x"],
                "level": level,
                "trend": trend,
                "seasonal": seasonal,
                "forecast_next": forecast,
            }
        )

    return base.groupBy("series").applyInPandas(
        fit,
        "series string, rn int, day bigint, x double, level double,"
        " trend double, seasonal double, forecast_next double",
    )


# --- STL-style decomposition (moving-average flavor, exact integer math) ----

_STL_OFF = 1_000_000_000  # floor-division offset: Spark `div` truncates
# toward zero while DuckDB `//` floors; adding OFF*cnt to the (possibly
# negative) numerator makes it non-negative, where truncate == floor, then
# OFF subtracts back out exactly.


@query(
    "orders_stl_decompose_monthly",
    oracle=f"""
    WITH m AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
             COUNT(*) AS n_orders
      FROM orders GROUP BY 1
    ),
    w AS (
      SELECT mon, n_orders,
             SUM(n_orders) OVER (ORDER BY (year(mon) * 12 + month(mon))
               RANGE BETWEEN 6 PRECEDING AND 6 FOLLOWING) AS s13,
             COUNT(*) OVER (ORDER BY (year(mon) * 12 + month(mon))
               RANGE BETWEEN 6 PRECEDING AND 6 FOLLOWING) AS c13
      FROM m
    ),
    t AS (
      SELECT mon, n_orders, month(mon) AS moy,
             CASE WHEN c13 = 13
                  THEN CAST((1000 * s13) // 13 AS BIGINT) END AS trend_milli
      FROM w
    ),
    d AS (
      SELECT *, 1000 * n_orders - trend_milli AS det_milli FROM t
    ),
    seas AS (
      SELECT moy,
             CAST((SUM(det_milli) + {_STL_OFF} * COUNT(*)) // COUNT(*)
                  - {_STL_OFF} AS BIGINT) AS seas_milli
      FROM d WHERE det_milli IS NOT NULL GROUP BY moy
    )
    SELECT strftime(d.mon, '%Y-%m') AS month,
           CAST(d.n_orders AS BIGINT) AS n_orders,
           d.trend_milli, s.seas_milli,
           CAST(d.det_milli - s.seas_milli AS BIGINT) AS resid_milli
    FROM d JOIN seas s USING (moy)
    """,
)
def orders_stl_decompose_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-style seasonal decomposition of the monthly order-count series
    (the moving-average classical flavor, complementing the model-based
    ``orders_forecast_holt_winters``): trend = centered 13-month moving
    average (defined only where all 13 months exist), detrended = series −
    trend, seasonal = per month-of-year mean of the detrended values,
    residual = detrended − seasonal. ALL arithmetic is quantized-integer
    milli-units — the one subtlety is floor semantics: Spark ``div``
    truncates toward zero while DuckDB ``//`` floors, which diverges on
    the (negative) detrended sums, so the seasonal mean adds
    ``{_STL_OFF}·cnt`` before dividing (non-negative ⇒ truncate == floor)
    and subtracts it back — bit-exact in both engines.

    Scale: the fact table collapses to |months| rows in one
    map-side-combined aggregate; the window, seasonal aggregate, and join
    all run on that bounded series. The same shape decomposes any keyed
    series (add the key to every PARTITION BY/GROUP BY).
    """
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(F.trunc("o_orderdate", "month").alias("mon")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    idx = (F.year("mon") * 12 + F.month("mon")).alias("idx")
    w = Window.orderBy(idx).rangeBetween(-6, 6)
    t = m.select(
        "mon",
        "n_orders",
        F.month("mon").alias("moy"),
        F.when(
            F.count(F.lit(1)).over(w) == 13,
            F.expr("1000") * F.sum("n_orders").over(w),
        ).alias("s13_milli"),
    ).withColumn(
        "trend_milli", F.expr("CAST(s13_milli div 13 AS BIGINT)")
    ).withColumn(
        "det_milli", F.expr("1000 * n_orders - trend_milli")
    )
    seas = (
        t.filter(F.col("det_milli").isNotNull())
        .groupBy("moy")
        .agg(
            F.expr(
                f"CAST((SUM(det_milli) + {_STL_OFF}L * COUNT(*)) div COUNT(*) "
                f"- {_STL_OFF}L AS BIGINT)"
            ).alias("seas_milli")
        )
    )
    return t.join(seas, "moy").select(
        F.date_format("mon", "yyyy-MM").alias("month"),
        F.col("n_orders").cast("long").alias("n_orders"),
        "trend_milli",
        "seas_milli",
        (F.col("det_milli") - F.col("seas_milli")).cast("long").alias("resid_milli"),
    )


_CROSTON_ORACLE = """
WITH RECURSIVE base AS (
  SELECT o_orderpriority AS series,
         CAST(floor(date_diff('day', DATE '1970-01-01',
                              CAST(o_orderdate AS DATE)) / 7) AS BIGINT) AS wk,
         CAST(COUNT(*) AS DOUBLE) AS x
  FROM orders WHERE o_totalprice > 300000.0 GROUP BY 1, 2
),
seq AS (
  SELECT series, wk, x,
         ROW_NUMBER() OVER (PARTITION BY series ORDER BY wk) AS rn,
         CAST(COALESCE(wk - LAG(wk) OVER (PARTITION BY series ORDER BY wk),
                       1) AS DOUBLE) AS q
  FROM base
),
c AS (
  SELECT series, rn, wk, x, q, x AS z, CAST(1.0 AS DOUBLE) AS p
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.series, s.rn, s.wk, s.x, s.q,
         0.5 * s.x + 0.5 * c.z AS z,
         0.5 * s.q + 0.5 * c.p AS p
  FROM c JOIN seq s ON s.series = c.series AND s.rn = c.rn + 1
)
SELECT series, CAST(rn AS INTEGER) AS rn, wk, x, q, z, p,
       z / p AS forecast, 0.75 * (z / p) AS forecast_sba
FROM c
"""


@query("orders_forecast_croston", oracle=_CROSTON_ORACLE)
def orders_forecast_croston(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's method for INTERMITTENT demand (Croston 1972) with the
    Syntetos-Boylan approximation: the demand series is weekly counts of
    big-ticket orders (> 300k) per priority — mostly-zero weeks, the
    regime where plain exponential smoothing is biased. Croston smooths
    the nonzero demand sizes z and the inter-demand intervals p as two
    coupled recurrences updated ONLY at demand points
    (z' = a*x + (1-a)z, p' = a*q + (1-a)p, a = 1/2, q = weeks since the
    previous demand), forecasting z/p per week; the SBA column applies
    the (1 - a/2) bias correction.

    Same execution shape as orders_forecast_holt: the fact table
    collapses to per-(series, week) counts JVM-side, then applyInPandas
    runs the O(demand-points) float loop per series while Spark
    parallelizes across series; the oracle is a DuckDB recursive CTE
    stepping the identical IEEE expressions in the identical order —
    bit-equal doubles, no decimal crutch needed.

    Scale: series count partitions the work; each group is O(demand
    weeks) — far smaller than O(orders) after the pre-aggregation. The
    zero weeks never materialize anywhere (Croston only consumes demand
    points + gap lengths), which is exactly why it beats dense-grid
    methods at 100 TB sparsity.
    """
    orders = load_table(spark, sf_dir, "orders")
    base = (
        orders.filter(F.col("o_totalprice") > 300000.0)
        .groupBy(
            F.col("o_orderpriority").alias("series"),
            F.floor(F.unix_date(F.col("o_orderdate").cast("date")) / 7)
            .cast("bigint")
            .alias("wk"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("x"))
    )

    def fit(pdf):
        import pandas as pd

        pdf = pdf.sort_values("wk").reset_index(drop=True)
        n = len(pdf)
        wk = pdf["wk"].to_numpy()
        x = pdf["x"].to_numpy()
        q = [1.0] * n
        for i in range(1, n):
            q[i] = float(wk[i] - wk[i - 1])
        z = [0.0] * n
        p = [0.0] * n
        if n:
            z[0] = float(x[0])
            p[0] = 1.0
        for i in range(1, n):
            z[i] = 0.5 * float(x[i]) + 0.5 * z[i - 1]
            p[i] = 0.5 * q[i] + 0.5 * p[i - 1]
        fc = [zi / pi for zi, pi in zip(z, p)]
        return pd.DataFrame(
            {
                "series": pdf["series"],
                "rn": range(1, n + 1),
                "wk": pdf["wk"],
                "x": pdf["x"],
                "q": q,
                "z": z,
                "p": p,
                "forecast": fc,
                "forecast_sba": [0.75 * f for f in fc],
            }
        )

    return base.groupBy("series").applyInPandas(
        fit,
        "series string, rn int, wk bigint, x double, q double, z double,"
        " p double, forecast double, forecast_sba double",
    )


_ACF_LAGS = (1, 2, 3, 6, 12, 24)
_ACF_SCALE = 1_000_000
_ACF_OFF = 2_000_000  # |r| <= 1 so SCALE*num + OFF*den >= (OFF-SCALE)*den >= 0


def _acf_oracle() -> str:
    lag_cols = ",\n         ".join(
        f"LEAD(x, {k}) OVER w AS l{k}" for k in _ACF_LAGS
    )
    aggs = ",\n       ".join(
        f"SUM(CASE WHEN l{k} IS NOT NULL THEN (n*x - s) * (n*l{k} - s) "
        f"ELSE 0 END) AS num{k},\n       COUNT(l{k}) AS np{k}"
        for k in _ACF_LAGS
    )
    arms = "\n    UNION ALL\n".join(
        f"    SELECT event_type, {k} AS lag, n, np{k} AS n_pairs, den, "
        f"num{k} AS num FROM per"
        for k in _ACF_LAGS
    )
    return f"""
    WITH counts AS (
      SELECT event_type,
             date_diff('hour', TIMESTAMP '1970-01-01 00:00:00', ts) AS hr,
             COUNT(*) AS x
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT event_type, MIN(hr) AS h0, MAX(hr) AS h1 FROM counts GROUP BY 1
    ),
    grid AS (
      SELECT event_type, UNNEST(range(h0, h1 + 1)) AS hr FROM bounds
    ),
    dense AS (
      SELECT g.event_type, g.hr, COALESCE(c.x, 0) AS x
      FROM grid g LEFT JOIN counts c USING (event_type, hr)
    ),
    stats AS (
      SELECT event_type, COUNT(*) AS n, SUM(x) AS s FROM dense GROUP BY 1
    ),
    led AS (
      SELECT d.event_type, d.hr, d.x, st.n, st.s,
         {lag_cols}
      FROM dense d JOIN stats st USING (event_type)
      WINDOW w AS (PARTITION BY d.event_type ORDER BY d.hr)
    ),
    per AS (
      SELECT event_type, n,
       SUM((n*x - s) * (n*x - s)) AS den,
       {aggs}
      FROM led GROUP BY 1, 2
    ),
    stacked AS (
{arms}
    )
    SELECT event_type, lag, CAST(n AS BIGINT) AS n,
           CAST(n_pairs AS BIGINT) AS n_pairs,
           CAST(den AS BIGINT) AS den, CAST(num AS BIGINT) AS num,
           CAST((({_ACF_SCALE} * num + {_ACF_OFF} * den) // den)
                - {_ACF_OFF} AS BIGINT) AS r_micro
    FROM stacked WHERE den > 0
    """


@query("events_acf_battery", oracle=_acf_oracle())
def events_acf_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation battery over the hourly event-count series
    per event type, at lags 1/2/3/6/12/24 — the standard seasonality /
    burstiness diagnostic (lag 24 exposes the diurnal cycle). The series
    is densified to every hour between each type's first and last event
    (missing hours count 0), exactly like a resample step.

    Exactness: the estimator is computed as the exact RATIONAL
    r_k = num_k / den with num_k = sum (n*x_t - S)(n*x_{t+k} - S) and
    den = sum (n*x_t - S)^2 — multiplying the mean-deviation by n keeps
    everything in BIGINT (counts are integers), and the sums are
    order-independent. r is emitted micro-quantized via the
    offset-before-div idiom (Spark ``div`` truncates toward zero, DuckDB
    ``//`` floors; adding OFF*den first makes the numerator non-negative
    where they agree, then OFF subtracts back out). |num| <= den by
    Cauchy-Schwarz, so the offset bound holds; magnitudes stay far below
    2^63 at every test SF (den ~ n * (n*x)^2; the DECIMAL(38,0) widening
    is the documented remedy if a 1000x larger grid ever pushes it).

    Scale: one shuffle to (type, hour) counts (map-side combinable), a
    broadcast-size bounds frame, one window pass per type for the leads
    (all six lags share one sort), and a final 6-row-per-type stack.
    State is O(hours), not O(events) — the fact table collapses first.
    """
    events = load_table(spark, sf_dir, "events")
    hr = F.floor(F.unix_timestamp(F.col("ts")) / 3600).cast("bigint")
    counts = events.groupBy(F.col("event_type"), hr.alias("hr")).agg(
        F.count(F.lit(1)).alias("x")
    )
    bounds = counts.groupBy("event_type").agg(
        F.min("hr").alias("h0"), F.max("hr").alias("h1")
    )
    grid = bounds.select(
        "event_type", F.explode(F.sequence("h0", "h1")).alias("hr")
    )
    dense = grid.join(counts, ["event_type", "hr"], "left").select(
        "event_type", "hr", F.coalesce(F.col("x"), F.lit(0)).alias("x")
    )
    part = Window.partitionBy("event_type")
    ordered = part.orderBy("hr")
    led = dense.select(
        "event_type",
        "hr",
        "x",
        F.count(F.lit(1)).over(part).alias("n"),
        F.sum("x").over(part).alias("s"),
        *[F.lead("x", k).over(ordered).alias(f"l{k}") for k in _ACF_LAGS],
    )
    dev = F.col("n") * F.col("x") - F.col("s")
    per = led.groupBy("event_type", "n").agg(
        F.sum(dev * dev).alias("den"),
        *[
            a
            for k in _ACF_LAGS
            for a in (
                F.sum(
                    F.when(
                        F.col(f"l{k}").isNotNull(),
                        dev * (F.col("n") * F.col(f"l{k}") - F.col("s")),
                    ).otherwise(F.lit(0))
                ).alias(f"num{k}"),
                F.count(F.col(f"l{k}")).alias(f"np{k}"),
            )
        ],
    )
    stack_args = ", ".join(
        f"{k}, np{k}, num{k}" for k in _ACF_LAGS
    )
    stacked = per.selectExpr(
        "event_type",
        "n",
        "den",
        f"stack({len(_ACF_LAGS)}, {stack_args}) AS (lag, n_pairs, num)",
    )
    return stacked.filter(F.col("den") > 0).select(
        "event_type",
        "lag",
        F.col("n").cast("bigint").alias("n"),
        F.col("n_pairs").cast("bigint").alias("n_pairs"),
        "den",
        "num",
        F.expr(
            f"(({_ACF_SCALE} * num + {_ACF_OFF} * den) div den) - {_ACF_OFF}"
        ).alias("r_micro"),
    )


# --- AR(2) fit + forecast via Yule-Walker, in exact integer arithmetic ------

_AR2_SCALE = 1_000_000      # ppm quantization for the AR coefficients
_AR2_OFF = 10_000_000       # offset for floor-division of negative numerators
_AR2_OFF2 = 10 ** 12        # offset for the 2-step forecast's ppm rescale

_AR2_ORACLE = f"""
WITH base AS (
  SELECT o_orderpriority AS series,
         CAST(floor(date_diff('day', DATE '1970-01-01',
                              CAST(o_orderdate AS DATE)) / 7) AS BIGINT) AS wk,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM orders GROUP BY 1, 2
),
stats AS (
  SELECT series, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS s
  FROM base GROUP BY 1
),
dev AS (
  SELECT b.series, b.wk, t.n, t.s // t.n AS m,
         b.x - t.s // t.n AS e,
         ROW_NUMBER() OVER (PARTITION BY b.series ORDER BY b.wk) AS rn
  FROM base b JOIN stats t ON t.series = b.series
),
led AS (
  SELECT series, n, m, e, rn,
         LEAD(e, 1) OVER (PARTITION BY series ORDER BY rn) AS e1,
         LEAD(e, 2) OVER (PARTITION BY series ORDER BY rn) AS e2
  FROM dev
),
c AS (
  SELECT series, ANY_VALUE(n) AS n, ANY_VALUE(m) AS m,
         CAST(SUM(e * e) AS BIGINT) AS c0,
         CAST(SUM(CASE WHEN e1 IS NOT NULL THEN e * e1 ELSE 0 END)
              AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN e2 IS NOT NULL THEN e * e2 ELSE 0 END)
              AS BIGINT) AS c2,
         CAST(MAX(CASE WHEN rn = n THEN e END) AS BIGINT) AS e_last,
         CAST(MAX(CASE WHEN rn = n - 1 THEN e END) AS BIGINT) AS e_prev
  FROM led GROUP BY series
),
phi AS (
  SELECT series, n, m, c0, c1, c2, e_last, e_prev,
         c0 * c0 - c1 * c1 AS d,
         c1 * (c0 - c2) AS a1,
         c0 * c2 - c1 * c1 AS a2
  FROM c WHERE n >= 8 AND c0 * c0 - c1 * c1 <> 0
),
q AS (
  SELECT series, n, m, c0, c1, c2, e_last, e_prev,
         (({_AR2_SCALE} * a1 + {_AR2_OFF} * d) // d) - {_AR2_OFF} AS phi1_ppm,
         (({_AR2_SCALE} * a2 + {_AR2_OFF} * d) // d) - {_AR2_OFF} AS phi2_ppm
  FROM phi
),
f AS (
  SELECT series, n, m, c0, c1, c2, phi1_ppm, phi2_ppm, e_last, e_prev,
         phi1_ppm * e_last + phi2_ppm * e_prev AS f1_dev
  FROM q
)
SELECT series,
       CAST(n AS BIGINT) AS n_weeks,
       c0, c1, c2,
       CAST(phi1_ppm AS BIGINT) AS phi1_ppm,
       CAST(phi2_ppm AS BIGINT) AS phi2_ppm,
       CAST({_AR2_SCALE} * m + f1_dev AS BIGINT) AS forecast1_ppm,
       CAST({_AR2_SCALE} * m
            + ((phi1_ppm * f1_dev + {_AR2_OFF2} * {_AR2_SCALE})
               // {_AR2_SCALE}) - {_AR2_OFF2}
            + phi2_ppm * e_last AS BIGINT) AS forecast2_ppm
FROM f
"""


@query("orders_forecast_ar2_yule_walker", oracle=_AR2_ORACLE)
def orders_forecast_ar2_yule_walker(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """AR(2) autoregression fit by Yule-Walker plus 1- and 2-step
    forecasts, entirely in exact integer arithmetic — the classical
    Box-Jenkins baseline for the weekly order-count series per priority.
    With floor-mean-centered deviations e_t = x_t - (S div n) (the
    integer centering IS the estimator definition, as in
    events_acf_battery) and raw autocovariance sums C0, C1, C2, the
    Yule-Walker solution is the exact rational

        phi1 = C1(C0 - C2) / (C0^2 - C1^2)
        phi2 = (C0*C2 - C1^2) / (C0^2 - C1^2)

    quantized to ppm with the offset-before-division trick (Spark `div`
    truncates toward zero, DuckDB `//` floors; adding OFF*denominator
    first makes the numerator non-negative where they agree). Forecasts
    unroll the recurrence in ppm-deviation space, with one documented
    offset-rescale for the 2-step term. Emits the moments themselves
    (c0/c1/c2) so the oracle pins the estimator, not just the ratios.

    Magnitude bound: products reach ~OFF * C0^2 ≈ 1e7 * (weeks * e^2)^2;
    BIGINT-safe through ~sf0.3 of this corpus (documented bound, same
    discipline as the 2^53 decimal notes in registry.py).

    Scale: the fact table collapses to O(weeks) buckets per series in
    one shuffle; the deviation/lead window and both aggregates run in
    that same series partitioning (series count parallelizes the work;
    each series is O(weeks)). The 5-row stats join broadcasts.
    """
    orders = load_table(spark, sf_dir, "orders")
    base = orders.groupBy(
        F.col("o_orderpriority").alias("series"),
        F.floor(F.unix_date(F.col("o_orderdate").cast("date")) / 7)
        .cast("bigint")
        .alias("wk"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))

    stats = base.groupBy("series").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").alias("s"),
    )
    dev = (
        base.join(F.broadcast(stats), "series")
        .select(
            "series",
            "wk",
            "n",
            F.expr("s div n").alias("m"),
            F.expr("x - s div n").alias("e"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("series").orderBy("wk")
            ),
        )
    )
    w = Window.partitionBy("series").orderBy("rn")
    led = dev.select(
        "series", "n", "m", "e", "rn",
        F.lead("e", 1).over(w).alias("e1"),
        F.lead("e", 2).over(w).alias("e2"),
    )
    c = led.groupBy("series").agg(
        F.any_value("n").alias("n"),
        F.any_value("m").alias("m"),
        F.sum(F.expr("e * e")).alias("c0"),
        F.sum(F.expr("CASE WHEN e1 IS NOT NULL THEN e * e1 ELSE 0 END"))
        .alias("c1"),
        F.sum(F.expr("CASE WHEN e2 IS NOT NULL THEN e * e2 ELSE 0 END"))
        .alias("c2"),
        F.max(F.expr("CASE WHEN rn = n THEN e END")).alias("e_last"),
        F.max(F.expr("CASE WHEN rn = n - 1 THEN e END")).alias("e_prev"),
    )
    phi = c.filter(
        (F.col("n") >= 8) & (F.expr("c0 * c0 - c1 * c1") != 0)
    ).select(
        "*",
        F.expr("c0 * c0 - c1 * c1").alias("d"),
        F.expr("c1 * (c0 - c2)").alias("a1"),
        F.expr("c0 * c2 - c1 * c1").alias("a2"),
    )
    q = phi.select(
        "series", "n", "m", "c0", "c1", "c2", "e_last", "e_prev",
        F.expr(
            f"(({_AR2_SCALE} * a1 + {_AR2_OFF} * d) div d) - {_AR2_OFF}"
        ).alias("phi1_ppm"),
        F.expr(
            f"(({_AR2_SCALE} * a2 + {_AR2_OFF} * d) div d) - {_AR2_OFF}"
        ).alias("phi2_ppm"),
    ).withColumn(
        "f1_dev", F.expr("phi1_ppm * e_last + phi2_ppm * e_prev")
    )
    return q.select(
        "series",
        F.col("n").alias("n_weeks"),
        "c0", "c1", "c2",
        F.col("phi1_ppm").cast("bigint").alias("phi1_ppm"),
        F.col("phi2_ppm").cast("bigint").alias("phi2_ppm"),
        F.expr(f"{_AR2_SCALE} * m + f1_dev").cast("bigint")
        .alias("forecast1_ppm"),
        F.expr(
            f"{_AR2_SCALE} * m"
            f" + ((phi1_ppm * f1_dev + {_AR2_OFF2} * {_AR2_SCALE})"
            f"    div {_AR2_SCALE}) - {_AR2_OFF2}"
            f" + phi2_ppm * e_last"
        ).cast("bigint").alias("forecast2_ppm"),
    )


# --- periodogram at fixed seasonal periods, via the Goertzel recurrence -----

import math as _math

_GOERTZEL_PERIODS = (3, 4, 6, 12)  # months
# 2*cos(2*pi/P), computed ONCE here and embedded as a repr literal in
# BOTH engine texts (the Benford shared-repr-literal rule): the engines'
# own cos() need not agree to the last ULP — the constant is pinned.
_GOERTZEL_C = {p: 2.0 * _math.cos(2.0 * _math.pi / p)
               for p in _GOERTZEL_PERIODS}

_GOERTZEL_FREQS = ", ".join(
    f"({p}, CAST({_GOERTZEL_C[p]!r} AS DOUBLE))" for p in _GOERTZEL_PERIODS
)

_GOERTZEL_ORACLE = f"""
WITH RECURSIVE base AS (
  SELECT o_orderpriority AS series,
         CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS mth,
         CAST(COUNT(*) AS DOUBLE) AS x
  FROM orders GROUP BY 1, 2
),
seq AS (
  SELECT series, x,
         ROW_NUMBER() OVER (PARTITION BY series ORDER BY mth) AS rn
  FROM base
),
cnt AS (SELECT series, CAST(COUNT(*) AS BIGINT) AS np FROM base GROUP BY 1),
freqs(period, c) AS (VALUES {_GOERTZEL_FREQS}),
g AS (
  SELECT s.series, f.period, f.c, s.rn,
         CAST(s.x AS DOUBLE) AS s1, CAST(0.0 AS DOUBLE) AS s2
  FROM seq s, freqs f WHERE s.rn = 1
  UNION ALL
  SELECT g.series, g.period, g.c, s.rn,
         s.x + g.c * g.s1 - g.s2 AS s1,
         g.s1 AS s2
  FROM g JOIN seq s ON s.series = g.series AND s.rn = g.rn + 1
)
SELECT g.series, CAST(g.period AS INTEGER) AS period, cnt.np AS n_points,
       g.s1, g.s2,
       g.s1 * g.s1 + g.s2 * g.s2 - g.c * g.s1 * g.s2 AS power
FROM g JOIN cnt ON cnt.series = g.series
WHERE g.rn = cnt.np
"""


@query("orders_periodogram_goertzel", oracle=_GOERTZEL_ORACLE)
def orders_periodogram_goertzel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spectral analysis, bit-exact across engines: the periodogram of
    the monthly order-count series per priority at the seasonal periods
    (3/4/6/12 months), computed with the Goertzel algorithm — the
    single-frequency DFT as a second-order recurrence
    s_t = x_t + c*s_(t-1) - s_(t-2) with c = 2cos(2*pi/P), and
    |X(w)|^2 = s1^2 + s2^2 - c*s1*s2 at the end. This is the sequential
    family (like Holt/Croston): the Spark shape is applyInPandas per
    series (a plain float64 loop over the bounded, calendar-length
    series), the oracle a recursive CTE stepping the IDENTICAL IEEE
    expressions in the identical order, and the cosine constants are
    computed once in Python and embedded as repr literals in both texts
    (the shared-repr-literal rule) — so no engine ever calls its own
    cos() and every double matches bit-for-bit.

    Scale: the fact table collapses to O(months * series) in one
    shuffle; each (series, period) recurrence is O(months) — a Goertzel
    pass is how you scan 100 TB of per-key series for seasonality at a
    known period without materializing an FFT per key.
    """
    orders = load_table(spark, sf_dir, "orders")
    base = orders.groupBy(
        F.col("o_orderpriority").alias("series"),
        (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
        .cast("bigint")
        .alias("mth"),
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))

    periods = list(_GOERTZEL_PERIODS)
    consts = dict(_GOERTZEL_C)

    def fit(pdf):
        import pandas as pd

        pdf = pdf.sort_values("mth").reset_index(drop=True)
        x = [float(v) for v in pdf["x"]]
        n = len(x)
        rows = []
        for p in periods:
            c = consts[p]
            s1 = x[0]
            s2 = 0.0
            for t in range(1, n):
                s1, s2 = x[t] + c * s1 - s2, s1
            rows.append({
                "series": pdf["series"].iloc[0],
                "period": p,
                "n_points": n,
                "s1": s1,
                "s2": s2,
                "power": s1 * s1 + s2 * s2 - c * s1 * s2,
            })
        return pd.DataFrame(
            rows,
            columns=["series", "period", "n_points", "s1", "s2", "power"],
        )

    return base.groupBy("series").applyInPandas(
        fit,
        "series string, period int, n_points bigint, s1 double, "
        "s2 double, power double",
    )
