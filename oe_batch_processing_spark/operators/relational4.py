"""Relational surface, part 4: LATERAL correlated joins, schema-evolving
unions, and the calendar/interval arithmetic battery.

These round out the SQL surface a user migrating relational pipelines
expects: LATERAL is the standard form for "top-N related rows per outer
row" (Catalyst rewrites it to a ranked join — no nested-loop execution),
``unionByName(allowMissingColumns=True)`` is the schema-evolution-safe
append used when producers drift (the batch analog of the reference's
partial-row tolerance, lib/parsers.js coercion of missing fields), and
the interval battery pins down cross-engine calendar semantics
(end-of-month clamping, ISO weeks, quarter truncation).

Scale: LATERAL's rewrite shuffles once on the join key; the union is a
zero-shuffle narrow op; the calendar battery is pure codegen projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oe_batch_processing_spark.registry import query
from oe_batch_processing_spark.tables import load_table, register_views


@query(
    "lateral_recent_orders",
    oracle="""
    SELECT c.c_custkey, c.c_acctbal, l.o_orderkey,
           strftime(l.o_orderdate, '%Y-%m-%d') AS o_date, l.o_totalprice
    FROM (SELECT c_custkey, c_acctbal FROM customer
          ORDER BY c_acctbal DESC, c_custkey LIMIT 10) c,
      LATERAL (SELECT o_orderkey, o_orderdate, o_totalprice
               FROM orders o WHERE o.o_custkey = c.c_custkey
               ORDER BY o_orderdate DESC, o_orderkey LIMIT 3) l
    """,
)
def lateral_recent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery: the 3 most recent orders for each of
    the 10 richest customers — the canonical "top-N per outer row" shape.
    Catalyst plans the lateral as a join + per-key ranking (run
    ``.explain``: no iterative per-customer execution), so the same SQL
    holds when the outer side is millions of rows.
    """
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_acctbal, l.o_orderkey,
               date_format(l.o_orderdate, 'yyyy-MM-dd') AS o_date,
               l.o_totalprice
        FROM (SELECT c_custkey, c_acctbal FROM customer
              ORDER BY c_acctbal DESC, c_custkey LIMIT 10) c,
          LATERAL (SELECT o_orderkey, o_orderdate, o_totalprice
                   FROM orders o WHERE o.o_custkey = c.c_custkey
                   ORDER BY o_orderdate DESC, o_orderkey LIMIT 3) l
        """
    )


@query(
    "set_union_by_name",
    oracle="""
    SELECT * FROM (
      SELECT c_custkey AS entity_key, c_name AS entity_name,
             c_acctbal AS acctbal, c_mktsegment AS mktsegment,
             'customer' AS src
      FROM customer
      UNION ALL BY NAME
      SELECT s_suppkey AS entity_key, s_name AS entity_name,
             s_nationkey AS nationkey, 'supplier' AS src
      FROM supplier
    )
    """,
)
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution-safe append: ``unionByName(allowMissingColumns=
    True)`` aligns columns by NAME and null-fills the ones either side
    lacks — the positional ``UNION ALL`` would silently mis-align here.
    This is how drifted producer schemas append into one training corpus
    without a coordinated migration. Oracle: DuckDB's ``UNION ALL BY
    NAME`` (same semantics).
    """
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_key"),
        F.col("c_name").alias("entity_name"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_mktsegment").alias("mktsegment"),
        F.lit("customer").alias("src"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("entity_key"),
        F.col("s_name").alias("entity_name"),
        F.col("s_nationkey").alias("nationkey"),
        F.lit("supplier").alias("src"),
    )
    return cust.unionByName(supp, allowMissingColumns=True)


@query(
    "scalar_interval_arith",
    oracle="""
    SELECT o_orderkey,
           strftime(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH,
                    '%Y-%m-%d') AS plus_3m,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d')
             AS month_end,
           CAST(EXTRACT(DAY FROM last_day(CAST(o_orderdate AS DATE)))
                AS INTEGER) AS days_in_month,
           strftime(date_trunc('week', CAST(o_orderdate AS DATE)),
                    '%Y-%m-%d') AS iso_week_start,
           strftime(date_trunc('quarter', CAST(o_orderdate AS DATE)),
                    '%Y-%m-%d') AS quarter_start,
           CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week,
           CAST(dayofweek(o_orderdate) AS INTEGER) AS dow_sun0,
           strftime(CAST(o_orderdate AS DATE) + INTERVAL 45 DAY,
                    '%Y-%m-%d') AS plus_45d
    FROM orders
    """,
)
def scalar_interval_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar/interval arithmetic battery over order dates, pinning the
    cross-engine semantics users silently rely on: ``add_months``
    end-of-month clamping (Jan 31 + 1 month = Feb 29), ``last_day``,
    Monday-based ISO week truncation, quarter truncation, ISO week
    numbers at year boundaries, and day-of-week numbering (normalized to
    DuckDB's Sunday=0 by subtracting 1 from Spark's Sunday=1).
    """
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    fmt = "yyyy-MM-dd"
    return o.select(
        "o_orderkey",
        F.date_format(F.add_months(d, 3), fmt).alias("plus_3m"),
        F.date_format(F.last_day(d), fmt).alias("month_end"),
        F.dayofmonth(F.last_day(d)).alias("days_in_month"),
        F.date_format(F.date_trunc("week", d), fmt).alias("iso_week_start"),
        F.date_format(F.date_trunc("quarter", d), fmt).alias("quarter_start"),
        F.weekofyear(d).alias("iso_week"),
        (F.dayofweek(d) - 1).alias("dow_sun0"),
        F.date_format(F.date_add(d, 45), fmt).alias("plus_45d"),
    )


@query(
    "recursive_cte_custkey_tree",
    oracle="""
    WITH RECURSIVE tree AS (
      SELECT c_custkey, 0 AS depth FROM customer WHERE c_custkey <= 1
      UNION ALL
      SELECT c.c_custkey, t.depth + 1
      FROM customer c JOIN tree t ON c.c_custkey // 2 = t.c_custkey
      WHERE c.c_custkey >= 2
    )
    SELECT depth, COUNT(*) AS n_nodes,
           MIN(c_custkey) AS min_key, MAX(c_custkey) AS max_key
    FROM tree GROUP BY depth
    """,
)
def recursive_cte_custkey_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (new in Spark 4): iterate an implicit binary-tree
    hierarchy over custkeys (parent = key div 2) from the roots down,
    computing each node's depth — the classic org-chart / BOM traversal
    users previously had to hand-loop on the driver. The engine now runs
    the fixed point itself; per level it is one equi-join against the
    accumulated frontier, so each iteration is a normal shuffled join at
    scale (log2(N) iterations total here).

    Spark-vs-DuckDB: both run the same ANSI WITH RECURSIVE text modulo
    integer-division spelling (``div`` vs ``//``) — a full value-hash
    agreement on an iterative computation.
    """
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH RECURSIVE tree AS (
          SELECT c_custkey, 0 AS depth FROM customer WHERE c_custkey <= 1
          UNION ALL
          SELECT c.c_custkey, t.depth + 1
          FROM customer c JOIN tree t ON c.c_custkey div 2 = t.c_custkey
          WHERE c.c_custkey >= 2
        )
        SELECT depth, COUNT(*) AS n_nodes,
               MIN(c_custkey) AS min_key, MAX(c_custkey) AS max_key
        FROM tree GROUP BY depth
        """
    )
