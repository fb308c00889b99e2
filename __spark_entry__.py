"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``oe_batch_processing_spark`` package; operator
modules register themselves into a shared registry on import.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import oe_batch_processing_spark.operators  # noqa: F401  (registers queries)
from oe_batch_processing_spark import registry

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return registry.QUERIES["flagship_revenue_by_nation"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered so the
    queries that most need a correctness row this round come first (the
    driver checks a registration-order prefix; registry.DRIVER_CHECK_PRIORITY)."""
    return registry.driver_ordered(dict(registry.QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; omitted keys
    get the driver's weaker rows-only check (approximate/streaming ops)."""
    return registry.driver_ordered(dict(registry.ORACLE))
