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


@query(
    "join_salted_orders_segment",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def join_salted_orders_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salted JOIN (the agg twin is ``agg_salted_user_totals``): the
    fact side's hot keys are spread over 8 salts keyed off the unique
    o_orderkey, the dimension side is exploded across all 8, and the join
    runs on (custkey, salt) — so a single viral customer's orders land on
    8 tasks instead of 1. The oracle is the plain unsalted join: salting
    must be a pure physical rewrite with zero semantic drift, and the
    value-hash check enforces exactly that. Post-join aggregation reuses
    the decimal-sum convention so totals are order-independent.

    At 100 TB this is the fallback when AQE's skew split can't help —
    e.g. a hot key inside a single unsplittable shuffle block; the 8x
    dimension replication is bounded by the dimension's size. A merge-join
    hint pins the shuffle path at test SF (the dim is broadcast-small
    there, which would otherwise bypass the salt being demonstrated).
    """
    orders = load_table(spark, sf_dir, "orders")
    # The SMJ hint forces the shuffle path (the dim is broadcast-small at
    # test SF, which would silently bypass the salt being demonstrated).
    customer = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment")
        .hint("merge")
    )
    joined = salted_join(
        orders.select("o_orderkey", "o_custkey", "o_totalprice"),
        customer,
        "o_custkey",
        "c_custkey",
        n_salts=8,
        salt_source="o_orderkey",
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("total_price"),
    )
