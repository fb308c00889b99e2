"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.2 streaming row; the brief's "custom stateful operators" path).

Operator: per-user running totals — state carries (event count, value cents)
across micro-batches and emits the updated totals each batch. Value cents are
exact integers so the bounded-stream result hash-matches a batch SQL oracle.

Scale: state lives in the state store keyed by user_id (one shuffle to
co-locate keys); memory is O(distinct users), independent of stream length.
A timeout (processing-time) would evict idle users — omitted here since the
bounded replay never idles.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

from oe_batch_processing_spark.registry import query
from oe_batch_processing_spark.streaming.event_windows import (
    events_stream,
    run_available_now,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("total_cents", LongType(), False),
    ]
)
STATE_SCHEMA = StructType(
    [
        StructField("n", LongType(), False),
        StructField("cents", LongType(), False),
    ]
)


def _update_user_totals(
    key: tuple, pdfs: Iterator, state: GroupState
) -> Iterator[Any]:
    import pandas as pd

    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        cents += int(pdf["y_cents"].astype("int64").sum())
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_cents": [cents]}
    )


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Streaming transformation: per-user running (count, cents) state."""
    prepped = events.select(
        "user_id", F.round(F.col("value") * 100).cast("long").alias("y_cents")
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


@query(
    "stream_stateful_user_totals",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM events
    GROUP BY user_id
    """,
)
def stream_stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-stream execution of the custom stateful operator; the final
    per-user state equals the batch aggregate (exact integer cents). The
    memory sink keeps one row per user per micro-batch update — the last
    update per user is the final state."""
    raw = run_available_now(
        stateful_user_totals(events_stream(spark, sf_dir)), "update"
    )
    # keep the final update per user (n_events strictly increases, so the
    # struct max picks the whole latest row — never mixes fields)
    latest = F.max(F.struct("n_events", "total_cents")).alias("s")
    return raw.groupBy("user_id").agg(latest).select(
        "user_id", "s.n_events", "s.total_cents"
    )
