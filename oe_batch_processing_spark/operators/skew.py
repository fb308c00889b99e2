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
