"""Iterative graph algorithms over derived relational graphs.

The bipartite customer<->supplier trade graph (distinct pairs from
orders x lineitem) gets a fixed-point-integer PageRank: 3 Jacobi iterations
with all arithmetic in BIGINT micro-units (rank*1e6, integer div for the
out-degree split, integer (85*x) div 100 damping) — deterministic and
order-free, so even an ITERATIVE numeric algorithm carries a full DuckDB
hash oracle (the usual float PageRank would diverge in final ULPs across
engines; fixed-point is also exactly how you make the production job
bit-reproducible across cluster sizes and retry storms).

Companion to ``dedup_connected_components`` (label propagation): together
they cover the convergence-loop family the DataFrame API is said to be bad
at — both run as a handful of self-joins and key shuffles per iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oe_batch_processing_spark.registry import query
from oe_batch_processing_spark.tables import load_table

PR_ITERS = 3
PR_TOP = 20
_UNIT = 1_000_000  # rank 1.0 == 1e6 micro-units

_PR_ORACLE = f"""
    WITH pairs AS (
      SELECT DISTINCT o.o_custkey AS ck, l.l_suppkey AS sk
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    edges AS (
      SELECT ck * 2 AS src, sk * 2 + 1 AS dst FROM pairs
      UNION ALL
      SELECT sk * 2 + 1 AS src, ck * 2 AS dst FROM pairs
    ),
    deg AS (SELECT src, COUNT(*) AS outd FROM edges GROUP BY 1),
    r0 AS (SELECT src AS node, CAST({_UNIT} AS BIGINT) AS r FROM deg),
    r1 AS (
      SELECT e.dst AS node,
             CAST(150000 + (85 * SUM(r.r // d.outd)) // 100 AS BIGINT) AS r
      FROM edges e JOIN r0 r ON r.node = e.src JOIN deg d ON d.src = e.src
      GROUP BY 1
    ),
    r2 AS (
      SELECT e.dst AS node,
             CAST(150000 + (85 * SUM(r.r // d.outd)) // 100 AS BIGINT) AS r
      FROM edges e JOIN r1 r ON r.node = e.src JOIN deg d ON d.src = e.src
      GROUP BY 1
    ),
    r3 AS (
      SELECT e.dst AS node,
             CAST(150000 + (85 * SUM(r.r // d.outd)) // 100 AS BIGINT) AS r
      FROM edges e JOIN r2 r ON r.node = e.src JOIN deg d ON d.src = e.src
      GROUP BY 1
    )
    SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
             AS node_type,
           node // 2 AS entity_key,
           r AS rank_micro
    FROM r3
    ORDER BY r DESC, node
    LIMIT {PR_TOP}
"""


@query("graph_pagerank_trade", oracle=_PR_ORACLE)
def graph_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank ({PR_ITERS} iterations, damping 0.85) over the
    bipartite customer<->supplier trade graph; returns the top-{PR_TOP}
    hubs. See module docstring for the integer-arithmetic determinism
    argument.

    Scale shape: the edge list is built once (one orders-lineitem join +
    distinct) and CACHED; each iteration is one join of the current rank
    vector (|nodes| rows — tiny relative to edges) onto the edge list and
    one groupBy(dst) with map-side partial sums. Partitioning on src/dst is
    reused across iterations; at 100 TB-scale graphs you'd pre-partition
    edges by src once (bucketing) so every iteration's rank join is
    shuffle-free on the edge side and only the |nodes|-sized rank vector
    moves. Final top-k is a TakeOrderedAndProject, not a global sort.
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    fwd = pairs.select(
        (F.col("o_custkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    )
    bwd = pairs.select(
        (F.col("l_suppkey") * 2 + 1).alias("src"),
        (F.col("o_custkey") * 2).alias("dst"),
    )
    edges = fwd.unionAll(bwd)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outd"))
    # edge list annotated with out-degree once, cached across iterations
    ed = edges.join(deg, "src").persist()
    ranks = deg.select(F.col("src").alias("node"), F.lit(_UNIT).cast("long").alias("r"))
    for _ in range(PR_ITERS):
        contrib = ed.join(ranks, ed["src"] == ranks["node"]).select(
            "dst", F.expr("r div outd").alias("c")
        )
        ranks = contrib.groupBy(F.col("dst").alias("node")).agg(
            (F.lit(150_000) + F.expr("(85 * sum(c)) div 100")).alias("r")
        )
    # materialize the final rank vector (tiny: |nodes| rows) through the
    # cached edge list, then release the edge cache — the returned frame
    # re-executes from the small cached vector, not the whole lineage
    ranks = ranks.persist()
    ranks.count()
    ed.unpersist()
    return (
        ranks.select(
            F.when(F.col("node") % 2 == 0, F.lit("customer"))
            .otherwise(F.lit("supplier"))
            .alias("node_type"),
            F.expr("node div 2").alias("entity_key"),
            F.col("r").alias("rank_micro"),
            F.col("node").alias("_tb"),
        )
        .orderBy(F.desc("rank_micro"), F.asc("_tb"))
        .limit(PR_TOP)
        .select("node_type", "entity_key", "rank_micro")
    )


# --- Z-order layout keys -----------------------------------------------------

ZBITS = 16


@query(
    "layout_zorder_events",
    oracle=f"""
    SELECT event_id,
           CAST(user_id % 65536 AS BIGINT) AS u16,
           CAST(LEAST(GREATEST(CAST(FLOOR(value) AS BIGINT), 0), 65535) AS BIGINT)
             AS v16,
           CAST(LIST_SUM([
             (((user_id % 65536) >> b) & 1) * (1 << (2 * b))
             + ((LEAST(GREATEST(CAST(FLOOR(value) AS BIGINT), 0), 65535) >> b) & 1)
               * (1 << (2 * b + 1))
             FOR b IN GENERATE_SERIES(0, {ZBITS - 1})]) AS BIGINT) AS zval
    FROM events
    """,
)
def layout_zorder_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout keys: interleave the bits of two clustering
    dimensions (user_id, bucketed value) into one locality-preserving sort
    key — the data-layout primitive behind multi-dimensional file skipping
    (Delta/Iceberg OPTIMIZE ZORDER). Rows close in z-value are close in BOTH
    dimensions, so writing the table sorted by zval gives every file a tight
    min/max envelope on user_id AND value, and point/range scans on either
    dimension prune most files — at 100 TB this is the difference between a
    full scan and touching a handful of files when filters don't match the
    partition column.

    The key computation itself is a pure per-row integer bit fold (zero
    shuffle; `repartitionByRange(zval)` + sortWithinPartitions is the write
    path). Deterministic integer math — full DuckDB hash oracle.
    """
    e = load_table(spark, sf_dir, "events")
    u16 = "user_id % 65536"
    v16 = "least(greatest(CAST(FLOOR(value) AS BIGINT), 0L), 65535L)"
    z = (
        f"aggregate(sequence(0, {ZBITS - 1}), 0L, (acc, b) -> acc"
        f" + ((({u16}) >> b) & 1) * shiftleft(1L, 2 * b)"
        f" + ((({v16}) >> b) & 1) * shiftleft(1L, 2 * b + 1))"
    )
    return e.select(
        "event_id",
        F.expr(u16).alias("u16"),
        F.expr(v16).alias("v16"),
        F.expr(z).alias("zval"),
    )
