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
