"""Advanced relational surface: grouping sets, subqueries (scalar / IN /
correlated), pivot, exact statistics (variance/stddev via decimal moments),
manual median, union-all, and an as-of join (custom operator Spark lacks).

Statistics note: built-in ``stddev``/``variance`` stream Welford-style and are
order-dependent in the last ULPs — instead moments (n, Σx, Σx²) are taken
with exact decimal sums and the closed-form variance is one identical double
expression in both engines, so even these hash-match exactly — with the
measure pre-scaled to keep every decimal cast inside the 2^53 exactness
bound (see registry.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from oe_batch_processing_spark.registry import dsum, query
from oe_batch_processing_spark.tables import load_table, register_views


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_prio,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with GROUPING() disambiguation — via the SQL
    entry point over registered views (the engine's SQL surface)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "subquery_scalar_above_avg",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 1.5 * (
        SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
        FROM orders
    )
    """,
)
def subquery_scalar_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: orders above 1.5x the (exact-decimal) average price.
    (The original 2x threshold returned ZERO rows at sf>=0.01 — the oracle
    check was vacuous, caught by the round-7 0-row tripwire; 1.5x selects a
    real tail at every SF: 380 / 3,717 / 37,430 rows.)"""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > 1.5 * (
            SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
            FROM orders
        )
        """
    )


@query(
    "subquery_correlated_max",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE o_totalprice = (
        SELECT MAX(o2.o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey
    )
    """,
)
def subquery_correlated_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated subquery: each customer's most expensive order(s).
    (Catalyst rewrites this into an aggregate + join — no per-row execution.)"""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders o
        WHERE o_totalprice = (
            SELECT MAX(o2.o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey
        )
        """
    )


@query(
    "pivot_status_counts",
    oracle="""
    SELECT n_name,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def pivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts per nation x order status (explicit value list so
    the plan needs no extra distinct-values job)."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    joined = orders.join(
        F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey")
    ).join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    return (
        joined.groupBy("n_name")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )


@query(
    "stats_exact_moments",
    oracle="""
    WITH m AS (
      SELECT o_orderpriority,
             COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice * 1e-5 AS DECIMAL(18,8))) AS DOUBLE) AS s1,
             CAST(SUM(CAST((o_totalprice * 1e-5) * (o_totalprice * 1e-5)
                  AS DECIMAL(20,8))) AS DOUBLE) AS s2
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, n,
           (s1 / n) * 1e5 AS mean_price,
           ((s2 - s1 * s1 / n) / n) * 1e10 AS var_pop,
           SQRT(((s2 - s1 * s1 / n) / n) * 1e10) AS stddev_pop,
           ((s2 - s1 * s1 / n) / (n - 1)) * 1e10 AS var_samp
    FROM m
    """,
)
def stats_exact_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance / stddev from exact decimal moments (see module docstring).

    The measure is pre-scaled by 1e-5 so both the squared terms AND the
    group sums stay far below the 2^53 exactness bound for the decimal ->
    double cast (the cast itself double-rounds in one engine beyond that),
    then moments are rescaled with identical double multiplications."""
    orders = _t(spark, sf_dir, "orders")
    px = F.col("o_totalprice") * 1e-5
    m = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(px.cast("decimal(18,8)")).cast("double").alias("s1"),
        F.sum((px * px).cast("decimal(20,8)")).cast("double").alias("s2"),
    )
    var_pop = ((F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / F.col("n")) * 1e10
    var_samp = (
        (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)
    ) * 1e10
    return m.select(
        "o_orderpriority",
        "n",
        ((F.col("s1") / F.col("n")) * 1e5).alias("mean_price"),
        var_pop.alias("var_pop"),
        F.sqrt(var_pop).alias("stddev_pop"),
        var_samp.alias("var_samp"),
    )


@query(
    "median_acctbal_by_segment",
    oracle="""
    WITH ranked AS (
      SELECT c_mktsegment, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal, c_custkey) AS rn,
             COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
      FROM customer
    )
    SELECT c_mktsegment,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS median_bal
    FROM ranked
    WHERE rn IN ((n + 1) / 2, (n + 2) / 2)
    GROUP BY c_mktsegment
    """,
)
def median_acctbal_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median via ranking (avg of the middle one/two values) — the
    deterministic alternative to interpolated percentile built-ins whose
    rounding differs between engines."""
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    wc = Window.partitionBy("c_mktsegment")
    ranked = c.select(
        "c_mktsegment",
        "c_acctbal",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    mid = ranked.filter(
        (F.col("rn") == (F.col("n") + 1) / 2) | (F.col("rn") == (F.col("n") + 2) / 2)
    )
    return mid.groupBy("c_mktsegment").agg(
        (dsum("c_acctbal") / F.count(F.lit(1))).alias("median_bal")
    )


@query(
    "stats_percentile_approx",
    # Spark's Greenwald-Khanna sketch is EXACT while the per-group row count
    # stays <= accuracy (10000), and in that regime it returns the same
    # discrete order statistic as DuckDB's quantile_disc (verified
    # empirically at sf0.01, n~3000/group). The oracle is therefore valid at
    # the driver's check SFs; at sf>=0.1 (n>accuracy) the sketch becomes
    # approximate by design and only rows-only comparison would hold.
    oracle="""
    SELECT o_orderpriority,
           quantile_disc(o_totalprice, 0.25) AS p25,
           quantile_disc(o_totalprice, 0.50) AS p50,
           quantile_disc(o_totalprice, 0.75) AS p75,
           COUNT(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
)
def stats_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile — the sketch-based scale path for quantiles
    (mergeable, single pass), alongside the exact median above. Flat scalar
    output columns (p25/p50/p75) so downstream comparators never see arrays."""
    q = F.percentile_approx("o_totalprice", [0.25, 0.5, 0.75], 10000)
    return _t(spark, sf_dir, "orders").groupBy("o_orderpriority").agg(
        q.getItem(0).alias("p25"),
        q.getItem(1).alias("p50"),
        q.getItem(2).alias("p75"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "set_union_all_measures",
    oracle="""
    SELECT kind, k, CAST(v AS DOUBLE) AS v FROM (
      SELECT 'order' AS kind, o_orderkey AS k, o_totalprice AS v FROM orders
      WHERE o_totalprice > 400000
      UNION ALL
      SELECT 'lineitem' AS kind, l_orderkey AS k, l_extendedprice AS v FROM lineitem
      WHERE l_extendedprice > 99000
    )
    """,
)
def set_union_all_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag semantics) of two heterogeneous sources via unionByName."""
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select(
            F.lit("order").alias("kind"),
            F.col("o_orderkey").alias("k"),
            F.col("o_totalprice").alias("v"),
        )
    )
    items = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_extendedprice") > 99000)
        .select(
            F.lit("lineitem").alias("kind"),
            F.col("l_orderkey").alias("k"),
            F.col("l_extendedprice").alias("v"),
        )
    )
    return orders.unionByName(items)


@query(
    "asof_purchase_last_click",
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id, event_type,
             CAST(epoch_ns(ts) // 1000 AS BIGINT) AS ts_us
      FROM events
    ),
    purchases AS (SELECT * FROM ev WHERE event_type = 'purchase'),
    clicks AS (SELECT * FROM ev WHERE event_type = 'click')
    SELECT p.event_id AS purchase_id,
           p.user_id,
           p.ts_us AS purchase_us,
           c.ts_us AS click_us
    FROM purchases p
    ASOF JOIN clicks c
      ON p.user_id = c.user_id AND p.ts_us >= c.ts_us
    """,
)
def asof_purchase_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join (operator Spark lacks natively): for each purchase, the
    same user's most recent click at-or-before it.

    Implementation: union both event streams with a type tag, one window pass
    per user ordered by (time, tag) carrying the last click forward
    (``last_value IGNORE NULLS``), keep purchase rows. One shuffle on
    user_id — the scalable form (no per-row subquery, no range join blowup).
    Times compared as integer microseconds so both engines order identically.
    """
    e = _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
    )
    tagged = e.filter(F.col("event_type").isin("purchase", "click")).withColumn(
        "is_click", (F.col("event_type") == "click").cast("int")
    )
    # order clicks before purchases at identical timestamps (>= semantics)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", F.col("is_click").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.withColumn(
        "click_us",
        F.last(F.when(F.col("is_click") == 1, F.col("ts_us")), ignorenulls=True).over(w),
    )
    return (
        carried.filter((F.col("event_type") == "purchase") & F.col("click_us").isNotNull())
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts_us").alias("purchase_us"),
            "click_us",
        )
    )


@query(
    "win_range_frame_30d_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
               PARTITION BY o_custkey
               ORDER BY CAST(date_diff('day', DATE '1995-01-01',
                                        CAST(o_orderdate AS DATE)) AS BIGINT)
               RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS spend_30d
    FROM orders
    """,
)
def win_range_frame_30d_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: each order's trailing-30-day spend for its
    customer (value-based frame over day offsets, vs the ROWS frames
    elsewhere). Decimal accumulation keeps every frame sum engine-exact.

    Note: RANGE frames sum ALL peers at the same ORDER BY value, so a
    same-day tie-break column must not be added — both engines include the
    full day's orders in the frame."""
    o = _t(spark, sf_dir, "orders")
    days = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(days.cast("long"))
        .rangeBetween(-30, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).over(w).cast("double").alias("spend_30d"),
    )


@query(
    "join_theta_region_pairs",
    oracle="""
    SELECT n.n_name, r.r_name
    FROM nation n
    JOIN region r ON n.n_regionkey < r.r_regionkey
    """,
)
def join_theta_region_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure theta (non-equi) join — compiles to a broadcast nested-loop
    join. Fine when one side is tiny (here: region); at scale a theta join
    needs banding/bucketing to avoid the cartesian, which join_range_ship_
    latency demonstrates via its equi+band form."""
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return nation.join(
        F.broadcast(region), F.col("n_regionkey") < F.col("r_regionkey")
    ).select("n_name", "r_name")


@query(
    "array_ops_advanced",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_v,
           CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS max_v,
           CAST(list_aggregate(embedding, 'min') AS DOUBLE) AS min_v,
           CAST(embedding[5] AS DOUBLE) AS fifth_v
    FROM embeddings
    """,
)
def array_ops_advanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array accessor/aggregate battery on the embedding column (element_at,
    size, array_max/min) — float widened to double (exact) for comparison."""
    emb = _t(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_v"),
        F.array_max("embedding").cast("double").alias("max_v"),
        F.array_min("embedding").cast("double").alias("min_v"),
        F.element_at("embedding", 5).cast("double").alias("fifth_v"),
    )


@query(
    "array_hof_ops",
    oracle="""
    SELECT vec_id,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_positive,
           CAST(len(list_filter(embedding, x -> abs(x) > 0.2)) AS INTEGER) AS n_large,
           CAST(embedding[len(embedding)] AS DOUBLE) AS last_v
    FROM embeddings
    """,
)
def array_hof_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions: lambda filter counts + last element
    (both engines evaluate identical float comparisons — exact)."""
    emb = _t(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.size(F.expr("filter(embedding, x -> x > 0)")).alias("n_positive"),
        F.size(F.expr("filter(embedding, x -> abs(x) > 0.2)")).alias("n_large"),
        F.element_at("embedding", -1).cast("double").alias("last_v"),
    )


@query(
    "agg_minby_maxby",
    oracle="""
    SELECT user_id,
           arg_max(event_id, CAST(ROUND(value * 100) AS BIGINT) * 10000000 + event_id)
             AS top_event_id,
           arg_min(event_id, CAST(ROUND(value * 100) AS BIGINT) * 10000000 + event_id)
             AS bottom_event_id,
           MAX(value) AS max_value,
           MIN(value) AS min_value
    FROM events
    GROUP BY user_id
    """,
)
def agg_minby_maxby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by / max_by (arg-extremum) aggregates: the event carrying each
    user's highest/lowest value. The comparator is a composite integer
    (value cents * 1e7 + event_id) because the raw values carry ties —
    arg-extremum over a tie-prone comparator is engine-nondeterministic."""
    e = _t(spark, sf_dir, "events")
    key = F.round(F.col("value") * 100).cast("long") * 10000000 + F.col("event_id")
    return e.groupBy("user_id").agg(
        F.max_by("event_id", key).alias("top_event_id"),
        F.min_by("event_id", key).alias("bottom_event_id"),
        F.max("value").alias("max_value"),
        F.min("value").alias("min_value"),
    )


@query(
    "agg_collect_sorted",
    oracle="""
    SELECT o_orderpriority,
           array_to_string(list_sort(list_distinct(list(o_orderstatus))), ',')
             AS statuses,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection aggregate with deterministic output: sorted distinct set
    of statuses per priority (raw collect_list order is partition-dependent,
    so deterministic pipelines always sort or set-ify collected arrays)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.array_join(F.sort_array(F.collect_set("o_orderstatus")), ",").alias(
            "statuses"
        ),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "events_funnel",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view'
                 THEN CAST(epoch_ns(ts) // 1000 AS BIGINT) END) AS t_view,
             MIN(CASE WHEN event_type = 'click'
                 THEN CAST(epoch_ns(ts) // 1000 AS BIGINT) END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase'
                 THEN CAST(epoch_ns(ts) // 1000 AS BIGINT) END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT COUNT(*) AS n_users,
           COUNT(t_view) AS stage_view,
           COUNT(CASE WHEN t_click > t_view THEN 1 END) AS stage_click,
           COUNT(CASE WHEN t_purchase > t_click AND t_click > t_view
                 THEN 1 END) AS stage_purchase
    FROM firsts
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis: users progressing view -> first click after their
    first view -> first purchase after that click. One conditional-min
    aggregation pass + one tiny rollup — the standard scalable funnel shape
    (no self-joins). Times as integer micros for engine-exact ordering."""
    e = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    first_of = lambda t: F.min(  # noqa: E731
        F.when(F.col("event_type") == t, F.col("ts_us"))
    )
    firsts = e.groupBy("user_id").agg(
        first_of("view").alias("t_view"),
        first_of("click").alias("t_click"),
        first_of("purchase").alias("t_purchase"),
    )
    return firsts.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_view").alias("stage_view"),
        F.count(F.when(F.col("t_click") > F.col("t_view"), 1)).alias("stage_click"),
        F.count(
            F.when(
                (F.col("t_purchase") > F.col("t_click"))
                & (F.col("t_click") > F.col("t_view")),
                1,
            )
        ).alias("stage_purchase"),
    )


@query(
    "udtf_explode_words",
    oracle="""
    SELECT doc_id,
           CAST(i - 1 AS INTEGER) AS pos,
           words[i] AS word
    FROM (
      SELECT doc_id, string_split(text, ' ') AS words,
             generate_subscripts(string_split(text, ' '), 1) AS i
      FROM documents
    )
    WHERE doc_id % 50 = 0 AND words[i] LIKE 's%'
    """,
)
def udtf_explode_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-generating (UDTF-style) surface: posexplode of the word array —
    one input row fans out to N output rows with ordinal positions."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 50 == 0)
    return (
        d.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word"))
        .filter(F.col("word").startswith("s"))
    )


@query(
    "unpivot_status_counts",
    oracle="""
    SELECT n_name, o_orderstatus AS status, COUNT(*) AS n
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name, o_orderstatus
    """,
)
def unpivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): widen with pivot then melt back to long form —
    the inverse-pivot surface; result equals the plain group-by."""
    wide = pivot_status_counts(spark, sf_dir)  # n_name, F, O, P
    return (
        wide.unpivot("n_name", ["F", "O", "P"], "status", "n")
        .filter(F.col("n").isNotNull() & (F.col("n") > 0))
        .select("n_name", "status", F.col("n").cast("long").alias("n"))
    )


@query(
    "scalar_string_extended",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '([a-z]+) ([a-z]+)', 1) AS first_word,
           CAST(strpos(p_name, 'a') AS INTEGER) AS a_pos,
           left(p_name, 5) AS l5,
           right(p_name, 5) AS r5,
           reverse(p_brand) AS brand_rev,
           repeat(p_type, 2) AS type2,
           translate(p_type, 'AEO', 'aeo') AS type_tr,
           CAST(ascii(p_brand) AS INTEGER) AS first_ascii,
           chr(65 + CAST(p_partkey % 26 AS INTEGER)) AS key_chr
    FROM part
    """,
)
def scalar_string_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended string battery: regexp capture groups, position, left/right,
    reverse, repeat, translate, ascii/chr."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", "([a-z]+) ([a-z]+)", 1).alias("first_word"),
        F.instr("p_name", "a").alias("a_pos"),
        F.expr("left(p_name, 5)").alias("l5"),
        F.expr("right(p_name, 5)").alias("r5"),
        F.reverse("p_brand").alias("brand_rev"),
        F.repeat("p_type", 2).alias("type2"),
        F.translate("p_type", "AEO", "aeo").alias("type_tr"),
        F.ascii("p_brand").alias("first_ascii"),
        F.chr(F.lit(65) + (F.col("p_partkey") % 26).cast("int")).alias("key_chr"),
    )


@query(
    "scalar_date_extended",
    oracle="""
    SELECT o_orderkey,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
           CAST(EXTRACT(DOY FROM o_orderdate) AS INTEGER) AS day_of_year,
           CAST(EXTRACT(DOW FROM o_orderdate) + 1 AS INTEGER) AS dow_sunday1,
           CAST(EXTRACT(DAY FROM o_orderdate) AS INTEGER) AS day_of_month,
           strftime(CAST(o_orderdate AS DATE) + INTERVAL 10 DAY, '%Y-%m-%d') AS plus_10d
    FROM orders
    """,
)
def scalar_date_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended date battery: last_day, day-of-year, day-of-week (normalized
    to Spark's Sunday=1 convention), day-of-month, date_add."""
    o = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.dayofyear(d).alias("day_of_year"),
        F.dayofweek(d).alias("dow_sunday1"),
        F.dayofmonth(d).alias("day_of_month"),
        F.date_format(F.date_add(d, 10), "yyyy-MM-dd").alias("plus_10d"),
    )


@query(
    "scalar_bitwise",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_orderkey & 255 AS and_low,
           l_orderkey | 4096 AS or_bit,
           xor(l_orderkey, l_partkey) AS xor_keys,
           CAST(l_orderkey << 2 AS BIGINT) AS shl2,
           CAST(l_orderkey >> 3 AS BIGINT) AS shr3
    FROM lineitem
    """,
)
def scalar_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise battery on integer keys (AND/OR/XOR/shifts)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_orderkey").bitwiseAND(F.lit(255))).alias("and_low"),
        (F.col("l_orderkey").bitwiseOR(F.lit(4096))).alias("or_bit"),
        (F.col("l_orderkey").bitwiseXOR(F.col("l_partkey"))).alias("xor_keys"),
        F.expr("shiftleft(l_orderkey, 2)").alias("shl2"),
        F.expr("shiftright(l_orderkey, 3)").alias("shr3"),
    )


@query(
    "win_analytic_battery",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           PERCENT_RANK() OVER w AS bal_pct_rank,
           CUME_DIST() OVER w AS bal_cume_dist,
           NTH_VALUE(c_custkey, 3) OVER
             (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS third_key,
           FIRST_VALUE(c_custkey) OVER w AS richest_key,
           LAST_VALUE(c_custkey) OVER
             (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS poorest_key
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def win_analytic_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The analytic window family not covered by the ranking battery:
    PERCENT_RANK / CUME_DIST (distribution), NTH_VALUE over a running frame,
    FIRST_VALUE, and LAST_VALUE over the full-partition frame (the default
    frame ends at CURRENT ROW — the classic LAST_VALUE trap, made explicit
    in both engines). Tie-free ordering (balance, then key) keeps the
    distribution functions engine-exact.
    """
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.percent_rank().over(w).alias("bal_pct_rank"),
        F.cume_dist().over(w).alias("bal_cume_dist"),
        F.nth_value("c_custkey", 3).over(w_run).alias("third_key"),
        F.first("c_custkey").over(w).alias("richest_key"),
        F.last("c_custkey").over(w_full).alias("poorest_key"),
    )


@query(
    "scalar_null_semantics",
    oracle="""
    WITH t AS (
      SELECT NULLIF(o_orderstatus, 'P') AS maybe_status
      FROM orders
    )
    SELECT COALESCE(maybe_status, '<none>') AS status_or_default,
           COUNT(*) AS n_rows,
           COUNT(maybe_status) AS n_nonnull,
           COUNT(*) - COUNT(maybe_status) AS n_null,
           CAST(SUM(CASE WHEN maybe_status IS NOT DISTINCT FROM 'F'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe_f
    FROM t
    GROUP BY 1
    ORDER BY status_or_default NULLS LAST
    """,
)
def scalar_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-semantics battery: NULLIF manufacture, COALESCE defaulting,
    COUNT(col) vs COUNT(*) null skipping, null-safe equality (Spark `<=>`
    == SQL IS NOT DISTINCT FROM), and EXPLICIT null ordering — the engines
    disagree on default null placement (Spark sorts nulls first ASC, DuckDB
    last), so portable queries must say NULLS FIRST/LAST out loud.
    """
    o = _t(spark, sf_dir, "orders")
    t = o.select(
        F.nullif("o_orderstatus", F.lit("P")).alias("maybe_status"),
    )
    return (
        t.groupBy(F.coalesce("maybe_status", F.lit("<none>")).alias("status_or_default"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("maybe_status").alias("n_nonnull"),
            (F.count(F.lit(1)) - F.count("maybe_status")).alias("n_null"),
            F.sum(
                F.when(F.col("maybe_status").eqNullSafe(F.lit("F")), 1).otherwise(0)
            ).alias("n_nullsafe_f"),
        )
        .orderBy(F.col("status_or_default").asc_nulls_last())
    )
