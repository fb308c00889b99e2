"""Query registry shared by all operator modules.

Every implemented operator registers a named query callable
``(spark, sf_dir) -> DataFrame`` and (when SQL-expressible) a DuckDB oracle SQL
string. ``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over
this registry, so the driver's differential harness sees every operator.

Exact-match discipline (why the DECIMAL dance exists):
The driver hash-compares values between Spark and DuckDB. Floating-point SUM is
order-dependent, and the two engines sum in different orders, so raw
``SUM(double)`` would differ in final ULPs and break the hash. Instead every
double aggregate is computed as ``CAST(SUM(CAST(term AS DECIMAL(18,6))) AS
DOUBLE)``: each *term* is a deterministic double expression (identical in both
engines), the cast to decimal is identical, decimal summation is exact and
order-independent, and the final decimal->double cast is identical. Result:
bit-equal doubles on both sides with no rounding fuzz.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query recipe; ``oracle=None`` => rows-only driver check."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def dsum(col: Column | str, scale: int = 6) -> Column:
    """Order-independent, engine-exact sum of a double expression.

    SQL-side equivalent: ``CAST(SUM(CAST(x AS DECIMAL(18,{scale}))) AS DOUBLE)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def davg(col: Column | str, scale: int = 6) -> Column:
    """Exact-match average: exact decimal sum divided by count, in double.

    Both engines perform one identical double division at the end.
    """
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale) / F.count(c)
