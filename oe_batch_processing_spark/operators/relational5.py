"""Relational surface, part 5: Spark-4 SQL pipe syntax, native batch
session windows, ordered string aggregation (LISTAGG), and robust
(median/MAD) anomaly detection.

These close the remaining "modern SQL surface" gaps a migrating user
expects: pipe syntax is Spark 4's linear query form (each ``|>`` stage is
sugar over the same Catalyst plan — zero runtime cost, verified by the
oracle being the classic ANSI spelling of the identical query);
``session_window`` is the engine-native gap sessionizer whose batch form
mirrors the streaming operator (streaming/event_windows.py) so one
definition serves both modes; LISTAGG (SQL:2023) pins ordered/DISTINCT
string aggregation semantics across engines; and the MAD detector is the
robust twin of ``events_anomaly_zscore`` (pipeline.py) — medians shrug
off the very outliers a mean/std score is distorted by.

Scale notes: pipe-syntax and LISTAGG compile to ordinary hash aggregates
(one shuffle); session_window is one shuffle on user_id then a per-key
ordered merge; the MAD detector's per-type stats are |event_types| rows
that broadcast back onto the fact stream, but its exact medians are a
global sort per group — at 100 TB swap ``median`` for
``approx_percentile`` (the ``events_approx_quantile_stats`` shape) unless
exactness is contractual.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oe_batch_processing_spark.registry import query
from oe_batch_processing_spark.tables import load_table, register_views


@query(
    "sql_pipe_revenue_by_flag",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def sql_pipe_revenue_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-4 SQL pipe syntax: the Q1 revenue rollup written as a linear
    ``|>`` pipeline (FROM |> WHERE |> EXTEND |> AGGREGATE). Pipe stages
    are pure syntax over the same Catalyst plan — the oracle is the
    classic ANSI spelling and hash-matches, proving the two forms are one
    query. EXTEND names the discounted price once; AGGREGATE's GROUP BY
    emits the keys alongside the aggregates (no SELECT repetition).
    """
    register_views(spark, sf_dir)
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_shipdate <= DATE '1998-09-02'
        |> EXTEND l_extendedprice * (1 - l_discount) AS disc_price
        |> AGGREGATE COUNT(*) AS n_items,
                     CAST(SUM(CAST(disc_price AS DECIMAL(18,6))) AS DOUBLE)
                       AS revenue
           GROUP BY l_returnflag, l_linestatus
        """
    )


@query(
    "events_session_window_native",
    oracle="""
    WITH o AS (
      SELECT user_id, value,
             CAST(epoch_ns(ts) // 1000 AS BIGINT) AS ts_us
      FROM events
    ),
    flagged AS (
      SELECT user_id, value, ts_us,
             CASE WHEN ts_us - LAG(ts_us) OVER w IS NULL
                    OR ts_us - LAG(ts_us) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM o
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
    ),
    sess AS (
      SELECT user_id, value, ts_us,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us
                                 ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM flagged
    )
    SELECT user_id,
           strftime(make_timestamp(MIN(ts_us)), '%Y-%m-%d %H:%M:%S')
             AS session_start,
           strftime(make_timestamp(MAX(ts_us) + 1800000000),
                    '%Y-%m-%d %H:%M:%S') AS window_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM sess GROUP BY user_id, session_seq
    """,
)
def events_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-native batch sessionization: ``session_window(ts, '30
    minutes')`` in a plain groupBy — the same operator the streaming
    sessionizer uses (streaming/event_windows.py:110), here in batch mode
    so one session definition serves both. Spark merges events whose
    [t, t+gap) windows overlap OR TOUCH (an exactly-30-minute gap stays
    one session — verified empirically), so the gaps-and-islands oracle
    opens a new session only when the gap is STRICTLY greater than 30
    minutes; the emitted window end is last event + gap, not last event.
    Contrast with ``events_sessionize_batch`` (sessions.py), the manual
    lag/running-sum spelling of the same partition semantics.

    Scale: one shuffle on user_id; per-key session merging is a single
    ordered pass, and the windowed aggregation state is
    watermark-evictable in the streaming twin.
    """
    e = load_table(spark, sf_dir, "events")
    sess = e.groupBy(
        "user_id", F.session_window("ts", "30 minutes").alias("sw")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("total_value"),
    )
    return sess.select(
        "user_id",
        F.date_format("sw.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("sw.end", "yyyy-MM-dd HH:mm:ss").alias("window_end"),
        "n_events",
        "total_value",
    )


@query(
    "agg_listagg_segment_nations",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_nations,
           string_agg(n_name, ',' ORDER BY n_name) AS nations,
           string_agg(n_name, '|' ORDER BY n_name DESC) AS nations_desc
    FROM (SELECT DISTINCT c.c_mktsegment, n.n_name
          FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey) t
    GROUP BY c_mktsegment
    """,
)
def agg_listagg_segment_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG (SQL:2023 ordered string aggregation, new in Spark 4):
    per market segment, the distinct nation names present, as ordered
    delimited strings — ascending comma-joined and descending
    pipe-joined — over an explicitly pre-deduplicated relation.

    Known issue pinned here: Spark 4.1.2's ``RewriteDistinctAggregates``
    throws ``ClassCastException`` when ``listagg(DISTINCT …) WITHIN
    GROUP`` shares a query with another DISTINCT aggregate (ListAgg's
    withNewChildrenInternal miscasts the rewritten ordering child). The
    ``SELECT DISTINCT`` subquery sidesteps the rewrite entirely — and is
    the scale-correct shape anyway: dedupe once, then every aggregate is
    a plain hash agg (one shuffle, map-side combinable) instead of a
    per-aggregate distinct expansion.

    Scale: an ordered string agg is a hash agg whose per-group state is
    the value list — bounded here by |nations|; for unbounded groups the
    collect-then-join shape (``agg_collect_sorted``) with an explicit
    size cap is the guarded variant.
    """
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_mktsegment,
               COUNT(*) AS n_nations,
               listagg(n_name, ',')
                 WITHIN GROUP (ORDER BY n_name) AS nations,
               listagg(n_name, '|')
                 WITHIN GROUP (ORDER BY n_name DESC) AS nations_desc
        FROM (SELECT DISTINCT c.c_mktsegment, n.n_name
              FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey)
        GROUP BY c_mktsegment
        """
    )


@query(
    "events_anomaly_mad",
    oracle="""
    WITH med AS (
      SELECT event_type,
             quantile_cont(CAST(value AS DOUBLE), 0.5) AS med
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_id, e.event_type, e.value,
             ABS(e.value - m.med) AS adev
      FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, quantile_cont(adev, 0.5) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT d.event_id, d.event_type, d.value,
           d.adev / (1.4826 * m.mad) AS robust_z
    FROM dev d JOIN mad m USING (event_type)
    WHERE m.mad > 0 AND d.adev / (1.4826 * m.mad) > 3.5
    """,
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection via median absolute deviation: events
    whose |value - median| exceeds 3.5 robust-z units (MAD scaled by the
    normal-consistency constant 1.4826). The robust twin of
    ``events_anomaly_zscore`` — a handful of extreme values inflate a
    mean/std score (masking), but leave the median and MAD untouched.
    Exact medians interpolate identically in both engines over doubles;
    every derived quantity is the same double arithmetic on both sides,
    so the oracle hash-matches without quantization.

    Scale: two grouped medians (|event_types| groups) whose exact form is
    a per-group sort; the per-type stats rows broadcast back onto the
    event stream (two map-side joins, no fact shuffle). At 100 TB, swap
    exact ``median`` for ``approx_percentile`` with a pinned accuracy —
    the ``events_approx_quantile_stats`` shape — unless exactness is
    contractual.
    """
    e = load_table(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(F.median("value").alias("med"))
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_id",
        "event_type",
        "value",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(F.median("adev").alias("mad"))
    robust_z = F.col("adev") / (F.lit(1.4826) * F.col("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter((F.col("mad") > 0) & (robust_z > 3.5))
        .select("event_id", "event_type", "value", robust_z.alias("robust_z"))
    )


@query(
    "join_null_safe_halves",
    oracle="""
    WITH halves AS (
      SELECT event_id % 2 AS half,
             CASE WHEN event_type = 'click' THEN NULL ELSE event_type END
               AS tkey,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT a.tkey AS type_key, a.n AS n_even, b.n AS n_odd
    FROM (SELECT * FROM halves WHERE half = 0) a
    JOIN (SELECT * FROM halves WHERE half = 1) b
      ON a.tkey IS NOT DISTINCT FROM b.tkey
    """,
)
def join_null_safe_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (``<=>`` / IS NOT DISTINCT FROM): the two
    event-id-parity halves of the event stream, aggregated per type key
    with one type nulled out, joined so the NULL groups MATCH each other
    — a plain ``=`` join silently drops them, the classic bug when a
    nullable dimension key feeds a reconciliation join. Catalyst plans
    ``<=>`` as an ordinary hash join (null-safe keys still hash), so the
    same shape holds at fact scale; DuckDB spells it IS NOT DISTINCT
    FROM.
    """
    e = load_table(spark, sf_dir, "events")
    halves = e.groupBy(
        (F.col("event_id") % 2).alias("half"),
        F.when(F.col("event_type") == "click", F.lit(None))
        .otherwise(F.col("event_type"))
        .alias("tkey"),
    ).agg(F.count(F.lit(1)).alias("n"))
    a = halves.filter(F.col("half") == 0).alias("a")
    b = halves.filter(F.col("half") == 1).alias("b")
    return a.join(b, F.col("a.tkey").eqNullSafe(F.col("b.tkey"))).select(
        F.col("a.tkey").alias("type_key"),
        F.col("a.n").alias("n_even"),
        F.col("b.n").alias("n_odd"),
    )


@query(
    "agg_group_by_all",
    oracle="""
    SELECT o_orderpriority,
           o_orderstatus,
           substr(o_orderdate::VARCHAR, 1, 4) AS order_year,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS total_price
    FROM orders
    GROUP BY ALL
    """,
)
def agg_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY ALL`` (Spark 4 sugar, same spelling in DuckDB): every
    non-aggregate select item becomes a grouping key — the
    keep-the-projection-and-grouping-in-sync form analysts reach for
    first. Resolves at analysis time to an ordinary hash aggregate;
    the oracle runs DuckDB's own GROUP BY ALL, pinning that both engines
    infer the identical key set (including the computed year column).
    """
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority,
               o_orderstatus,
               substr(CAST(o_orderdate AS STRING), 1, 4) AS order_year,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                 AS total_price
        FROM orders
        GROUP BY ALL
        """
    )


# Shared by the batch query below and its streaming twin
# (streaming/event_windows.py): availableNow + complete mode reproduces
# batch session semantics exactly, so ONE oracle serves both.
DYN_SESS_ORACLE = """
    WITH o AS (
      SELECT user_id, value,
             CAST(epoch_ns(ts) // 1000 AS BIGINT) AS ts_us,
             CASE event_type WHEN 'click' THEN 1200000000
                             WHEN 'purchase' THEN 3600000000
                             ELSE 2400000000 END AS gap_us
      FROM events
    ),
    flagged AS (
      SELECT user_id, value, ts_us, gap_us,
             CASE WHEN MAX(ts_us + gap_us) OVER
                    (PARTITION BY user_id ORDER BY ts_us
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    IS NULL
                  OR ts_us > MAX(ts_us + gap_us) OVER
                    (PARTITION BY user_id ORDER BY ts_us
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS new_sess
      FROM o
    ),
    sess AS (
      SELECT user_id, value, ts_us, gap_us,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us
                                 ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM flagged
    )
    SELECT user_id,
           strftime(make_timestamp(MIN(ts_us)), '%Y-%m-%d %H:%M:%S')
             AS session_start,
           strftime(make_timestamp(MAX(ts_us + gap_us)),
                    '%Y-%m-%d %H:%M:%S') AS window_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM sess GROUP BY user_id, session_seq
    """


@query("events_session_window_dynamic_gap", oracle=DYN_SESS_ORACLE)
def events_session_window_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC-gap sessionization — ``session_window`` with a PER-EVENT gap
    expression (Spark 3.2+/4 feature the fixed-gap op can't express): a
    click keeps its session alive 20 minutes, a purchase 60, everything
    else 40. Spark merges events whose [t, t+gap(t)) windows overlap or
    touch, so the merged window end is the MAX of per-event ends — the
    gaps-and-islands oracle therefore needs a running max of (ts + gap)
    over PRECEDING rows (a plain LAG is wrong: an earlier long-gap event
    can outreach a later short-gap one). Session grouping is invariant
    under equal-timestamp tie order: whichever tied row is scanned first
    carries the new-session flag, and the aggregate per session is the
    same set of rows either way.

    Scale: identical to the fixed-gap twin — one shuffle on user_id, one
    ordered merge pass per key, watermark-evictable in streaming.
    """
    e = load_table(spark, sf_dir, "events")
    return dynamic_gap_sessions(e)


def dynamic_gap_sessions(e: DataFrame) -> DataFrame:
    """Unified transformation (batch or stream) behind
    ``events_session_window_dynamic_gap`` and its streaming twin."""
    # session_window requires CalendarIntervalType — INTERVAL literals
    # parse as DayTimeIntervalType under ANSI-interval rules, so build the
    # gap with make_interval (a string CASE would also work)
    gap = F.expr(
        "CASE event_type WHEN 'click' THEN make_interval(0,0,0,0,0,20,0) "
        "WHEN 'purchase' THEN make_interval(0,0,0,0,1,0,0) "
        "ELSE make_interval(0,0,0,0,0,40,0) END"
    )
    sess = e.groupBy("user_id", F.session_window("ts", gap).alias("sw")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("total_value"),
    )
    return sess.select(
        "user_id",
        F.date_format("sw.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("sw.end", "yyyy-MM-dd HH:mm:ss").alias("window_end"),
        "n_events",
        "total_value",
    )
