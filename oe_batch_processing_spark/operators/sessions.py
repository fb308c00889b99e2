"""Batch sessionization — the gap-based session assignment every
clickstream/training-telemetry pipeline needs (the streaming twin is
``stream_session_windows`` in streaming/event_windows.py; this is the
backfill/batch form over the same events table).

Scale shape: exactly two exchanges — one hash partition on user_id for the
lag/cumsum windows (both windows share the same partitioning, so Catalyst
plans a single Exchange + two Window ops in one stage), and the final
per-session groupBy, which reuses the same user_id partitioning (no second
shuffle of the event rows, only the partial-agg combine). No explode, no
Python. Skewed power users are bounded by per-user event counts; AQE
skew-split handles the rest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from oe_batch_processing_spark.registry import dsum, query
from oe_batch_processing_spark.tables import load_table

GAP_MINUTES = 30
_GAP_US = GAP_MINUTES * 60 * 1_000_000


@query(
    "events_sessionize_batch",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {_GAP_US}
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts, value,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM ordered
    )
    SELECT user_id,
           CAST(session_seq AS BIGINT) AS session_seq,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM sess
    GROUP BY user_id, session_seq
    """,
)
def events_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity closes a session):
    lag → new-session flag → running sum as session id → per-session stats.
    Timestamps are compared at microsecond precision (``unix_micros`` here,
    ``epoch_us`` in the oracle — both engines store micros)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    new_sess = F.when(
        gap_us.isNull() | (gap_us > _GAP_US), F.lit(1)
    ).otherwise(F.lit(0))
    sess = e.select(
        "user_id",
        "ts",
        "value",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("session_seq"),
    )
    return sess.groupBy("user_id", "session_seq").agg(
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        dsum("value").alias("total_value"),
    )


_F_WEEK_US = 7 * 86400 * 1_000_000
_F_DAY_US = 86400 * 1_000_000


@query(
    "events_funnel_staged_windows",
    oracle=f"""
    WITH o AS (
      SELECT user_id, event_type,
             CAST(epoch_ns(ts) // 1000 AS BIGINT) AS ts_us
      FROM events
    ),
    s AS (
      SELECT user_id, MIN(ts_us) AS signup_us
      FROM o WHERE event_type = 'signup' GROUP BY user_id
    ),
    c AS (
      SELECT s.user_id, s.signup_us, MIN(o.ts_us) AS click_us
      FROM s JOIN o ON o.user_id = s.user_id
       AND o.event_type = 'click'
       AND o.ts_us >= s.signup_us
       AND o.ts_us < s.signup_us + {_F_WEEK_US}
      GROUP BY 1, 2
    ),
    p AS (
      SELECT c.user_id, MIN(o.ts_us) AS purchase_us
      FROM c JOIN o ON o.user_id = c.user_id
       AND o.event_type = 'purchase'
       AND o.ts_us >= c.click_us
       AND o.ts_us < c.click_us + {_F_DAY_US}
      GROUP BY 1
    )
    SELECT s.user_id, s.signup_us, c.click_us, p.purchase_us,
           CASE WHEN p.purchase_us IS NOT NULL THEN 'purchase'
                WHEN c.click_us IS NOT NULL THEN 'click'
                ELSE 'signup' END AS stage
    FROM s
    LEFT JOIN c ON c.user_id = s.user_id
    LEFT JOIN p ON p.user_id = s.user_id
    """,
)
def events_funnel_staged_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-CONSTRAINED multi-step funnel: signup → first click within 7
    days → first purchase within 1 day OF THAT CLICK — each window
    anchors on the previous stage's achieved event, which is what
    separates a real activation funnel from the unconstrained ordered
    funnel (``events_funnel``): a purchase three weeks later should NOT
    count as conversion. Integer-microsecond arithmetic end to end.

    Scale: each stage is one keyed aggregate + an equi-join on user_id
    with the time bound evaluated post-probe (the band-join shape —
    never a range-only join); stages chain but each shuffles only the
    funnel survivors, a shrinking set by construction.
    """
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("signup_us"))
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts_us").alias("c_us")
    )
    c = (
        s.join(clicks, "user_id")
        .filter(
            (F.col("c_us") >= F.col("signup_us"))
            & (F.col("c_us") < F.col("signup_us") + F.lit(_F_WEEK_US))
        )
        .groupBy("user_id", "signup_us")
        .agg(F.min("c_us").alias("click_us"))
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts_us").alias("p_us")
    )
    p = (
        c.join(purchases, "user_id")
        .filter(
            (F.col("p_us") >= F.col("click_us"))
            & (F.col("p_us") < F.col("click_us") + F.lit(_F_DAY_US))
        )
        .groupBy("user_id")
        .agg(F.min("p_us").alias("purchase_us"))
    )
    return (
        s.join(c.select("user_id", "click_us"), "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "signup_us",
            "click_us",
            "purchase_us",
            F.when(F.col("purchase_us").isNotNull(), "purchase")
            .when(F.col("click_us").isNotNull(), "click")
            .otherwise("signup")
            .alias("stage"),
        )
    )
