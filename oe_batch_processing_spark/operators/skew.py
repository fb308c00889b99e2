"""Skew-handling utilities (brief: "skewed keys hurt; salting for skew").

AQE's skew-join split handles most skew automatically (enabled in
session.py); ``salted_join`` is the manual pattern for the extreme case AQE
can't fix — a single key so hot one task would still exceed memory after
splitting, or a non-AQE environment. The left (skewed/fact) side gets a
random-ish salt derived deterministically from a row key; the right
(dimension) side is exploded across all salt values; the join key becomes
(key, salt) so the hot key spreads over ``n_salts`` tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    n_salts: int = 8,
    salt_source: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side's hot keys spread across n_salts tasks.

    ``salt_source``: a left column whose hash picks the salt (defaults to the
    join key itself via xxhash64 of the whole row id — pass a unique column
    like a row id for best spread). Deterministic, so results are stable.
    """
    src = salt_source or left_key
    salted_left = left.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(src)), F.lit(n_salts)).cast("int")
    )
    salts = F.explode(F.array(*[F.lit(i) for i in range(n_salts)])).alias("__salt")
    salted_right = right.select("*", salts)
    out = salted_left.join(
        salted_right,
        (F.col(left_key) == F.col(right_key)) & (salted_left["__salt"] == salted_right["__salt"]),
        how,
    )
    return out.drop("__salt")


# --- registered query: salted two-stage aggregation -------------------------

from pyspark.sql import SparkSession  # noqa: E402

from oe_batch_processing_spark.registry import dsum, query  # noqa: E402
from oe_batch_processing_spark.tables import load_table  # noqa: E402

N_AGG_SALTS = 16


@query(
    "agg_salted_user_totals",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY user_id
    """,
)
def agg_salted_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof aggregation: two-stage salted groupBy whose result is
    PROVABLY identical to the plain groupBy — the oracle is the unsalted
    SQL, so the driver hash-verifies the equivalence every round.

    Stage 1 groups on (user_id, salt) — a hot user spreads over N_AGG_SALTS
    reducers; stage 2 merges the per-salt partials per user. Counts add;
    the decimal-exact sums add associatively, so the merged total is
    bit-identical to a single-stage sum regardless of how rows landed in
    salt buckets. This is the manual fallback for skew AQE can't split
    (one key too hot for a single task even after splitting).
    """
    ev = load_table(spark, sf_dir, "events")
    salt = F.pmod(F.xxhash64("event_id"), F.lit(N_AGG_SALTS)).cast("int")
    partial = (
        ev.withColumn("__salt", salt)
        .groupBy("user_id", "__salt")
        .agg(
            F.count(F.lit(1)).alias("n_partial"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("v_partial"),
        )
    )
    return partial.groupBy("user_id").agg(
        F.sum("n_partial").alias("n_events"),
        F.sum("v_partial").cast("double").alias("total_value"),
    )
