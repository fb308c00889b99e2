"""Relational surface, part 7: Spark 4 SQL scripting (compound
statements, session variables, control flow) and EXECUTE IMMEDIATE.

The reference's "script" is a Node.js driver program wiring options into
``processFile`` (sample-usage-with-*.js); a SQL-first shop migrating that
orchestration expects the warehouse idiom instead: multi-statement SQL
scripts with declared variables, control flow, and dynamic SQL. Spark 4
ships all three (SQL scripting ``BEGIN … END``, session variables
``DECLARE/SET``, ``EXECUTE IMMEDIATE … USING``); this module pins their
semantics against a single-statement relational rewrite, proving the
procedural surface is sugar over the same Catalyst plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from oe_batch_processing_spark.registry import query
from oe_batch_processing_spark.tables import register_views


@query(
    "sql_scripting_vars",
    oracle="""
    WITH seg AS (
      SELECT c_mktsegment AS s FROM customer
      GROUP BY c_mktsegment ORDER BY COUNT(*) DESC, c_mktsegment LIMIT 1
    ),
    cutoff AS (
      SELECT MAX(o_orderdate) - INTERVAL 180 DAY AS d FROM orders
    )
    SELECT (SELECT s FROM seg) AS segment,
           o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = (SELECT s FROM seg)
      AND o_orderdate > (SELECT d FROM cutoff)
    GROUP BY o_orderpriority
    """,
)
def sql_scripting_vars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL scripting end-to-end: a ``BEGIN … END`` compound
    statement DECLAREs two variables, fills them with scalar-subquery
    ``SET`` statements (largest market segment; a 180-day recency cutoff
    off the data's own max date), runs a WHILE loop (control flow
    executes inside the script interpreter, not Catalyst), and finishes
    with ``EXECUTE IMMEDIATE … USING`` binding both variables into a
    dynamic aggregate — the injection-safe dynamic-SQL form. The script's
    result is the last statement's DataFrame.

    The oracle is the inlined single-statement equivalent (variables →
    scalar subqueries): a hash match proves the procedural layer changed
    no relational semantics.

    Scale: each ``SET`` is an ordinary Catalyst job (here an aggregate on
    a broadcast-size dim); the final statement is a standard
    broadcast-join aggregate. Scripting adds driver-side control flow
    only — nothing per-row, nothing on executors.
    """
    register_views(spark, sf_dir)
    return spark.sql(
        """
        BEGIN
          DECLARE top_seg STRING;
          DECLARE cutoff DATE;
          DECLARE retries INT DEFAULT 0;
          SET top_seg = (SELECT c_mktsegment FROM customer
                         GROUP BY c_mktsegment
                         ORDER BY COUNT(*) DESC, c_mktsegment LIMIT 1);
          SET cutoff = (SELECT MAX(o_orderdate) - INTERVAL 180 DAY
                        FROM orders);
          WHILE retries < 3 DO
            SET retries = retries + 1;
          END WHILE;
          EXECUTE IMMEDIATE
            'SELECT ? AS segment,
                    o_orderpriority,
                    COUNT(*) AS n_orders,
                    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                      AS total_price
             FROM orders JOIN customer ON o_custkey = c_custkey
             WHERE c_mktsegment = ? AND o_orderdate > ?
             GROUP BY o_orderpriority'
            USING top_seg, top_seg, cutoff;
        END
        """
    )
