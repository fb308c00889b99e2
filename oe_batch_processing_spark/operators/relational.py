"""Relational operator surface (SURVEY.md §2.2): joins, aggregations, windows,
sorts, set operations, and the scalar function library.

The reference implements none of these (SURVEY.md §2.2 — it is a per-record
ingestion framework, `lib/batchProcessing.js:130-420`); they are the query
capabilities the new engine gets from the DataFrame/Catalyst surface, validated
differentially against DuckDB by the driver.

Scale notes are attached per recipe. The shared conventions:
  - Dimension joins use ``F.broadcast`` explicitly so the fact table never
    shuffles for a dim lookup, independent of statistics quality.
  - All double aggregates go through ``dsum``/``davg`` (exact decimal
    summation — see registry.py) so results are order-independent and
    bit-equal across engines. This is also the *right* answer at scale:
    a 1000-executor sum is exact regardless of partial-aggregate order.
  - Timestamp outputs are formatted to strings so cross-engine comparison
    never depends on timestamp physical representation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from oe_batch_processing_spark.registry import davg, dsum, query
from oe_batch_processing_spark.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Aggregation family
# ---------------------------------------------------------------------------

@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style scan→filter→hash-aggregate over the fact table.

    Scale: single shuffle on a 6-value grouping key; partial aggregation
    (map-side combine) reduces each scan partition to ≤6 rows before the
    exchange, so the shuffle is O(partitions), not O(rows). Filter and the
    8-column projection push into the parquet scan.
    """
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_base_price"),
        dsum(disc_price).alias("sum_disc_price"),
        dsum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
        davg("l_quantity").alias("avg_qty"),
        davg("l_extendedprice").alias("avg_price"),
        davg("l_discount").alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "agg_rollup_nation_priority",
    oracle="""
    SELECT n_name, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_price
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY ROLLUP (n_name, o_orderpriority)
    """,
)
def agg_rollup_nation_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (nation, priority) -> (nation) -> ().

    Scale: rollup is expand+aggregate — one shuffle; both dims broadcast.
    """
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    joined = orders.join(
        F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey")
    ).join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    return joined.rollup("n_name", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("total_price"),
    )


@query(
    "agg_cube_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two low-cardinality dimensions."""
    return _t(spark, sf_dir, "orders").cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("total_price"),
    )


@query(
    "agg_count_distinct",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation alongside plain aggregates.

    Scale: Spark plans count-distinct as a two-phase expand+aggregate; the
    first phase dedups (priority, custkey) pairs map-side, so the shuffle
    carries distinct pairs, not raw rows.
    """
    return _t(spark, sf_dir, "orders").groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("total_price"),
    )


@query("agg_approx_count_distinct")  # approximate => rows-only driver check
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct estimate — the 100 TB-scale answer to
    count-distinct (fixed-size sketch per group; mergeable, single shuffle
    of sketches). Approximate, so no SQL oracle (rows-only check)."""
    return _t(spark, sf_dir, "orders").groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", rsd=0.01).alias("approx_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# Join family
# ---------------------------------------------------------------------------

@query(
    "flagship_revenue_by_nation",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def flagship_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: star-schema join (fact ⋈ 4 dims) → agg → sort.

    Scale: every dim side is broadcast, so the only shuffle is the final
    5-group aggregation (map-side combined). The fact table streams through
    one stage of whole-stage-codegen hash lookups; the o_orderdate filter is
    applied before the lineitem join to shrink the broadcast hash side.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        joined.groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@query(
    "q3_top_unshipped",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1997-06-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_top_unshipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: selective dim filter → fact join → agg → top-N.

    Scale: customer(BUILDING) broadcast; sort is on the aggregated (small)
    side only; LIMIT pushes into a TakeOrderedAndProject, so no global sort
    of the fact data ever happens.
    """
    cutoff = F.lit("1997-06-01").cast("timestamp")
    customer = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    joined = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).join(
        F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey")
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "join_semi_urgent_customers",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey IN (
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    """,
)
def join_semi_urgent_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join — existence check without duplicating left rows.

    Scale: the filtered orders side reduces to distinct keys during the
    semi-join build; with AQE this usually becomes a broadcast of the
    distinct key set rather than a full shuffle.
    """
    customer = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return customer.join(
        urgent, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "join_anti_customers_without_urgent",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
    )
    """,
)
def join_anti_customers_without_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join — customers with no urgent orders."""
    customer = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return customer.join(
        urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name", "c_acctbal")


@query(
    "join_left_order_counts",
    oracle="""
    SELECT c_custkey, c_name,
           COUNT(o_orderkey) AS order_count,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_spend
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
)
def join_left_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving customers with zero orders (NULL-safe
    count/sum semantics: count skips NULLs, sum of none is NULL)."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("order_count"),
            dsum("o_totalprice").alias("total_spend"),
        )
    )


@query(
    "join_range_ship_latency",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS fast_ship_value
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
               AND l_shipdate >= o_orderdate
               AND l_shipdate < o_orderdate + INTERVAL 90 DAY
    GROUP BY o_orderpriority
    """,
)
def join_range_ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join with a range (band) predicate: items shipped within 90 days
    of their order date.

    Scale: the equi key carries the shuffle; the band predicate evaluates
    post-probe inside codegen, so this costs the same as a plain equi-join
    (no cartesian blow-up, unlike a pure theta join).
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cond = (
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") >= F.col("o_orderdate"))
        & (F.col("l_shipdate") < F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
    )
    return (
        li.join(orders, cond)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_extendedprice").alias("fast_ship_value"),
        )
    )


@query(
    "join_shuffle_supplier_part",
    oracle="""
    SELECT s_name, p_brand,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN part ON l_partkey = p_partkey
    WHERE p_type = 'PROMO'
    GROUP BY s_name, p_brand
    """,
)
def join_shuffle_supplier_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ two dims with a dim-side filter that prunes before the join."""
    li = _t(spark, sf_dir, "lineitem")
    supplier = _t(spark, sf_dir, "supplier")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    return (
        li.join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("s_name", "p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_quantity").alias("total_qty"),
        )
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------

@query(
    "win_topk_orders_per_priority",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice, rn
    FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey
               ) AS INTEGER) AS rn
        FROM orders
    )
    WHERE rn <= 3
    """,
)
def win_topk_orders_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group via ROW_NUMBER — the scalable top-k idiom (no global
    sort; Spark ≥3.5 adds a window-group-limit pushdown so each partition
    keeps only K rows before the shuffle)."""
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        _t(spark, sf_dir, "orders")
        .select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "win_lag_order_gap",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(date_diff('day',
                CAST(LAG(o_orderdate) OVER (
                    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ) AS DATE),
                CAST(o_orderdate AS DATE)) AS INTEGER) AS gap_days
    FROM orders
    """,
)
def win_lag_order_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG analytic: days since the customer's previous order (NULL first)."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    orders = _t(spark, sf_dir, "orders")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias("gap_days"),
    )


@query(
    "win_running_customer_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_spend
    FROM orders
    """,
)
def win_running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer (frame aggregate). Decimal accumulation
    keeps every prefix sum exact → engine-independent."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).over(w).cast("double").alias("running_spend"),
    )


@query(
    "win_rank_dense_ntile",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(RANK() OVER w AS INTEGER) AS bal_rank,
           CAST(DENSE_RANK() OVER w AS INTEGER) AS bal_dense_rank,
           CAST(NTILE(4) OVER w AS INTEGER) AS bal_quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def win_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANK / DENSE_RANK / NTILE ranking family in one window."""
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.rank().over(w).alias("bal_rank"),
        F.dense_rank().over(w).alias("bal_dense_rank"),
        F.ntile(4).over(w).alias("bal_quartile"),
    )


# ---------------------------------------------------------------------------
# Sort / limit
# ---------------------------------------------------------------------------

@query(
    "sort_top20_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def sort_top20_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-N: ORDER BY + LIMIT compiles to TakeOrderedAndProject
    (per-partition heap of 20 + driver merge — no full sort, no shuffle)."""
    return (
        _t(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------

@query(
    "set_union_target_customers",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT c_custkey FROM customer WHERE c_acctbal > 9000
    """,
)
def set_union_target_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two key sets."""
    customer = _t(spark, sf_dir, "customer")
    a = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = customer.filter(F.col("c_acctbal") > 9000).select("c_custkey")
    return a.union(b).distinct()


@query(
    "set_intersect_customers",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    """,
)
def set_intersect_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    a = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = customer.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return a.intersect(b)


@query(
    "set_except_customers",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
    EXCEPT
    SELECT c_custkey FROM customer WHERE c_acctbal < 0
    """,
)
def set_except_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    a = customer.filter(F.col("c_mktsegment") == "MACHINERY").select("c_custkey")
    b = customer.filter(F.col("c_acctbal") < 0).select("c_custkey")
    return a.exceptAll(b).distinct()


# ---------------------------------------------------------------------------
# Scalar function library
# ---------------------------------------------------------------------------

@query(
    "scalar_string_part",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name) AS name_upper,
           CAST(LENGTH(p_name) AS INTEGER) AS name_len,
           SUBSTRING(p_name, 1, 10) AS name_prefix,
           p_brand || ':' || p_type AS brand_type,
           REGEXP_REPLACE(p_name, '[aeiou]', '', 'g') AS name_devowel,
           CAST(LEN(STRING_SPLIT(p_name, ' ')) AS INTEGER) AS n_words,
           TRIM(LPAD(p_brand, 12, ' ')) AS brand_trim
    FROM part
    """,
)
def scalar_string_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function battery: case, length, substring, concat, regexp
    replace, split/size, pad/trim. All JVM-side (whole-stage codegen)."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 10).alias("name_prefix"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("name_devowel"),
        F.size(F.split("p_name", " ")).alias("n_words"),
        F.trim(F.lpad("p_brand", 12, " ")).alias("brand_trim"),
    )


@query(
    "scalar_date_orders",
    oracle="""
    SELECT o_orderkey,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS o_month,
           CAST(EXTRACT(QUARTER FROM o_orderdate) AS INTEGER) AS o_quarter,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INTEGER) AS days_to_2002,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start
    FROM orders
    """,
)
def scalar_date_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function battery: extract parts, datediff, date_trunc."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.quarter("o_orderdate").alias("o_quarter"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias("days_to_2002"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
    )


@query(
    "scalar_json_events",
    oracle="""
    SELECT event_id, event_type,
           TRY_CAST(regexp_extract(props, '"k": (-?\\d+)', 1) AS INTEGER) AS k_val
    FROM events
    """,
)
def scalar_json_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events ``props`` column.

    Spark side uses the real JSON path operator (``get_json_object``); the
    oracle extracts the same scalar with a regex — same values either way.
    """
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
    )


@query(
    "scalar_math_lineitem",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_orderkey % 7 AS key_mod,
           CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(CEIL(l_extendedprice) AS BIGINT) AS price_ceil,
           ABS(l_discount - 0.05) AS disc_dev,
           SQRT(l_quantity) AS qty_sqrt,
           GREATEST(l_tax, l_discount) AS max_rate,
           LEAST(l_tax, l_discount) AS min_rate
    FROM lineitem
    """,
)
def scalar_math_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function battery, restricted to IEEE-exact ops (floor/ceil/abs/
    sqrt/greatest/least/modulo) so both engines agree bit-for-bit."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
    )


@query(
    "scalar_case_when_customer",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'overdrawn'
                WHEN c_acctbal < 1000 THEN 'low'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS bal_tier,
           COALESCE(NULLIF(c_mktsegment, 'HOUSEHOLD'), 'OTHER') AS segment_or_other
    FROM customer
    """,
)
def scalar_case_when_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional expressions: CASE WHEN tiering, NULLIF/COALESCE."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "overdrawn")
        .when(F.col("c_acctbal") < 1000, "low")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("bal_tier"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("HOUSEHOLD")), F.lit("OTHER")).alias(
            "segment_or_other"
        ),
    )


# ---------------------------------------------------------------------------
# Array ops (embeddings) & events time-series (batch analog)
# ---------------------------------------------------------------------------

@query(
    "array_norm_embeddings",
    oracle="""
    SELECT vec_id,
           CAST(COUNT(*) AS INTEGER) AS dim,
           CAST(SUM(CAST(v * v AS DECIMAL(18,9))) AS DOUBLE) AS norm_sq,
           SQRT(CAST(SUM(CAST(v * v AS DECIMAL(18,9))) AS DOUBLE)) AS norm
    FROM (
        SELECT vec_id, CAST(UNNEST(embedding) AS DOUBLE) AS v
        FROM embeddings
    )
    GROUP BY vec_id
    """,
)
def array_norm_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array math on the embedding column: explode → exact decimal sum of
    squares → L2 norm. Demonstrates ArrayType handling; the similarity
    operators (operators/similarity.py) build on the same vector column."""
    emb = _t(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "vec_id", F.explode("embedding").alias("v")
    ).withColumn("v", F.col("v").cast("double"))
    agg = exploded.groupBy("vec_id").agg(
        F.count(F.lit(1)).cast("int").alias("dim"),
        dsum(F.col("v") * F.col("v"), scale=9).alias("norm_sq"),
    )
    return agg.select("vec_id", "dim", "norm_sq", F.sqrt("norm_sq").alias("norm"))


@query(
    "events_hourly_rollup",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_ts,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch analog of a tumbling event-time window (1 hour) — the streaming
    twin lives in streaming/event_windows.py and shares this aggregation."""
    e = _t(spark, sf_dir, "events")
    return (
        e.withColumn(
            "hour_ts", F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss")
        )
        .groupBy("hour_ts", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("total_value"),
        )
    )


@query(
    "events_user_stats",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value) AS avg_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
    FROM events
    GROUP BY user_id
    """,
)
def events_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event profile: count/sum/avg/min/max/distinct in one pass."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value").alias("sum_value"),
        davg("value").alias("avg_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.countDistinct("event_type").alias("n_types"),
    )
