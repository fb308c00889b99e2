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
from pyspark.sql.window import Window

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


@query(
    "stats_corr_regression",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity * 1e-2 AS DECIMAL(18,8))) AS DOUBLE)
               AS sx,
             CAST(SUM(CAST(l_extendedprice * 1e-5 AS DECIMAL(18,8)))
                  AS DOUBLE) AS sy,
             CAST(SUM(CAST((l_quantity * 1e-2) * (l_quantity * 1e-2)
                  AS DECIMAL(20,10))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST((l_extendedprice * 1e-5) * (l_extendedprice * 1e-5)
                  AS DECIMAL(20,10))) AS DOUBLE) AS syy,
             CAST(SUM(CAST((l_quantity * 1e-2) * (l_extendedprice * 1e-5)
                  AS DECIMAL(20,10))) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           ((sxy - sx * sy / n) / n) * 1e7 AS covar_pop,
           ((sxy - sx * sy / n) / (n - 1)) * 1e7 AS covar_samp,
           (n * sxy - sx * sy)
             / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)) AS corr_qty_price,
           ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * 1e3 AS regr_slope,
           ((sy / n) * 1e5)
             - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * 1e3 * ((sx / n) * 1e2)
             AS regr_intercept
    FROM m
    """,
)
def stats_corr_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlation / covariance / OLS regression per return flag, computed
    from EXACT decimal co-moments rather than the built-in ``corr``/
    ``covar_samp``/``regr_*`` (whose float accumulation order differs
    between engines — same statistics, last-ULP drift). Measures are
    pre-scaled (1e-2 / 1e-5) so sums and squared terms stay far below the
    2^53 decimal->double exactness bound — the ``stats_exact_moments``
    convention extended to co-moments; correlation is scale-invariant so
    it needs no rescale, covariance/slope/intercept rescale with identical
    double multiplications in both engines.

    One map-side-combined groupBy — the five co-moments ride in the same
    partial aggregate, so this costs exactly one shuffle of 6 numbers per
    group at any data size.
    """
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity") * 1e-2
    y = F.col("l_extendedprice") * 1e-5
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x.cast("decimal(18,8)")).cast("double").alias("sx"),
        F.sum(y.cast("decimal(18,8)")).cast("double").alias("sy"),
        F.sum((x * x).cast("decimal(20,10)")).cast("double").alias("sxx"),
        F.sum((y * y).cast("decimal(20,10)")).cast("double").alias("syy"),
        F.sum((x * y).cast("decimal(20,10)")).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    slope_scaled = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return m.select(
        "l_returnflag",
        "n",
        (((sxy - sx * sy / n) / n) * 1e7).alias("covar_pop"),
        (((sxy - sx * sy / n) / (n - 1)) * 1e7).alias("covar_samp"),
        (
            (n * sxy - sx * sy)
            / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        ).alias("corr_qty_price"),
        (slope_scaled * 1e3).alias("regr_slope"),
        (
            ((sy / n) * 1e5) - slope_scaled * 1e3 * ((sx / n) * 1e2)
        ).alias("regr_intercept"),
    )


@query(
    "join_full_outer_nation_presence",
    oracle="""
    WITH c AS (
      SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
      FROM customer WHERE c_nationkey < 15 GROUP BY 1
    ),
    s AS (
      SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
      FROM supplier WHERE s_nationkey >= 10 GROUP BY 1
    )
    SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
           COALESCE(n_customers, 0) AS n_customers,
           COALESCE(n_suppliers, 0) AS n_suppliers,
           CASE WHEN c.nationkey IS NULL THEN 'suppliers_only'
                WHEN s.nationkey IS NULL THEN 'customers_only'
                ELSE 'both' END AS presence
    FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
    """,
)
def join_full_outer_nation_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join — the join type the suite didn't yet pin down
    (inner/left/semi/anti/range/theta/asof/fuzzy are covered elsewhere):
    per-nation customer vs supplier counts, keeping nations present on
    either side only, with the null-coalescing bookkeeping full outer
    requires. Shuffle-on-key both sides; at scale this is the standard
    reconciliation shape (two aggregates full-outer-joined to diff them).
    """
    # Each side keeps a different nation range (overlap 10-14) so all
    # three presence cases genuinely occur at every test SF.
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey") < 15)
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") >= 10)
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    c, s = cust.alias("c"), supp.alias("s")
    return c.join(
        s, F.col("c.nationkey") == F.col("s.nationkey"), "full_outer"
    ).select(
        F.coalesce(F.col("c.nationkey"), F.col("s.nationkey")).alias("nationkey"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        F.when(F.col("c.nationkey").isNull(), "suppliers_only")
        .when(F.col("s.nationkey").isNull(), "customers_only")
        .otherwise("both")
        .alias("presence"),
    )


@query(
    "win_rolling_distinct_users",
    oracle="""
    WITH hourly AS (
      SELECT DISTINCT event_type,
             CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_bucket,
             user_id
      FROM events
    ),
    win AS (
      SELECT event_type, hour_bucket,
             COUNT(*) OVER (PARTITION BY event_type, hour_bucket)
               AS n_users_this_hour,
             COUNT(DISTINCT user_id) OVER (
               PARTITION BY event_type ORDER BY hour_bucket
               RANGE BETWEEN 23 PRECEDING AND CURRENT ROW
             ) AS n_users_24h
      FROM hourly
    )
    SELECT DISTINCT event_type, hour_bucket,
           CAST(n_users_this_hour AS BIGINT) AS n_users_this_hour,
           CAST(n_users_24h AS BIGINT) AS n_users_24h
    FROM win
    """,
)
def win_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling DISTINCT count — the window shape Spark has no native
    aggregate for: distinct users per (event_type, hour) plus distinct
    users over the trailing 24 hours. Spark side builds it from
    ``collect_set`` over a RANGE frame of hour buckets, then takes
    ``array_distinct``+``flatten`` sizes — set semantics in JVM expressions,
    no Python. The oracle uses DuckDB's native COUNT(DISTINCT) OVER RANGE.

    Scale: state per window position is the distinct-user set of 24 hourly
    groups — bounded by true cardinality, and the heavy dedup happened in
    the hourly pre-aggregation, which is an ordinary map-side-combined
    groupBy. (The exact-sets approach is for when correctness is the gate;
    the HLL-sketch rollup twin in sketches.py is the approximate path.)
    """
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.select(
            "event_type",
            F.floor(F.unix_micros("ts") / F.lit(3_600_000_000)).alias(
                "hour_bucket"
            ),
            "user_id",
        )
        .groupBy("event_type", "hour_bucket")
        .agg(F.collect_set("user_id").alias("users"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_bucket")
        .rangeBetween(-23, 0)
    )
    return hourly.select(
        "event_type",
        "hour_bucket",
        F.size("users").cast("long").alias("n_users_this_hour"),
        F.size(
            F.array_distinct(F.flatten(F.collect_list("users").over(w)))
        )
        .cast("long")
        .alias("n_users_24h"),
    )


@query(
    "stats_equidepth_bins",
    oracle="""
    SELECT bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(o_totalprice) AS lo,
           MAX(o_totalprice) AS hi
    FROM (
      SELECT o_totalprice,
             CAST(NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey)
                  AS INTEGER) AS bin
      FROM orders
    )
    GROUP BY 1 ORDER BY 1
    """,
)
def stats_equidepth_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile) binning — the feature-discretization primitive:
    10 equal-population buckets over order value with each bucket's count
    and [lo, hi] edges. NTILE over the total order (o_totalprice,
    o_orderkey) makes tie-breaks deterministic, so both engines produce
    identical buckets.

    Scale: a global NTILE is a global sort — Spark range-partitions the
    sort (sampled boundaries), so this is the one operator family where a
    single ordered pass is inherent, not a plan defect. For 100 TB you'd
    swap NTILE for approx_percentile edges (events_approx_quantile_stats
    covers that shape) unless exact equal population is contractual.
    """
    o = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        o.select("o_totalprice", F.ntile(10).over(w).alias("bin"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
        .orderBy("bin")
    )


@query(
    "pareto_frontier_parts",
    oracle="""
    SELECT p_partkey, p_retailprice, p_size
    FROM part b
    WHERE NOT EXISTS (
      SELECT 1 FROM part a
      WHERE a.p_retailprice <= b.p_retailprice AND a.p_size >= b.p_size
        AND (a.p_retailprice < b.p_retailprice OR a.p_size > b.p_size)
    )
    ORDER BY p_retailprice, p_partkey
    """,
)
def pareto_frontier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier): parts minimizing retail price while
    maximizing size — no other part is at-least-as-good on both axes and
    strictly better on one. Equal (price, size) points do not dominate
    each other, so whole duplicate groups survive together.

    Spark plan is the SORT-based skyline, not the O(N^2) NOT-EXISTS
    self-join the oracle uses: (1) per distinct price keep only max-size
    rows (a grouped agg — anything smaller at the same price is dominated
    by them); (2) over the DISTINCT price axis, a point survives iff its
    size strictly exceeds the running max over all cheaper prices (one
    ordered window whose input is |distinct prices| rows, orders of
    magnitude smaller than the table); (3) semi-join survivors back to
    recover duplicates. Every step is a hash shuffle except the bounded
    window.
    """
    p = load_table(spark, sf_dir, "part")
    per_price = p.groupBy("p_retailprice").agg(F.max("p_size").alias("msize"))
    w = Window.orderBy("p_retailprice").rowsBetween(
        Window.unboundedPreceding, -1
    )
    frontier = (
        per_price.withColumn("best_cheaper", F.max("msize").over(w))
        .filter(
            F.col("best_cheaper").isNull()
            | (F.col("msize") > F.col("best_cheaper"))
        )
        .select("p_retailprice", F.col("msize").alias("p_size"))
    )
    return (
        p.join(F.broadcast(frontier), ["p_retailprice", "p_size"], "leftsemi")
        .select("p_partkey", "p_retailprice", "p_size")
        .orderBy("p_retailprice", "p_partkey")
    )


@query(
    "asof_nearest_click",
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
           (SELECT c.ts_us FROM clicks c WHERE c.user_id = p.user_id
            ORDER BY ABS(c.ts_us - p.ts_us), c.ts_us LIMIT 1) AS click_us
    FROM purchases p
    WHERE EXISTS (SELECT 1 FROM clicks c WHERE c.user_id = p.user_id)
    ORDER BY 1
    """,
)
def asof_nearest_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-neighbor as-of join (both directions): for each purchase,
    the same user's click closest in time — before OR after — ties going
    to the earlier click. Complements ``asof_purchase_last_click``
    (backward-only ASOF).

    Implementation: the union-window trick, twice — one ordered pass per
    user carries the latest click at-or-before each purchase, a reverse
    pass carries the earliest click after it; a row-local comparison
    picks the nearer (tie -> earlier, which is always the backward one
    since a tie means equal |delta|). One shuffle on user_id total; no
    range-join blowup, no per-row subquery — that O(P x C) formulation is
    what the ORACLE runs. Integer-microsecond times keep ordering
    engine-exact.
    """
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    tagged = e.filter(
        F.col("event_type").isin("purchase", "click")
    ).withColumn("is_click", (F.col("event_type") == "click").cast("int"))
    # clicks sort before purchases at identical ts: '>=' / '<=' semantics
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", F.col("is_click").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", F.col("is_click").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    click_ts = F.when(F.col("is_click") == 1, F.col("ts_us"))
    carried = tagged.withColumn(
        "prev_click", F.last(click_ts, ignorenulls=True).over(wb)
    ).withColumn("next_click", F.first(click_ts, ignorenulls=True).over(wf))
    best = F.when(
        F.col("prev_click").isNull(), F.col("next_click")
    ).when(
        F.col("next_click").isNull(), F.col("prev_click")
    ).when(
        # tie -> earlier click, i.e. prev (equal distance both sides)
        (F.col("ts_us") - F.col("prev_click"))
        <= (F.col("next_click") - F.col("ts_us")),
        F.col("prev_click"),
    ).otherwise(F.col("next_click"))
    return (
        carried.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts_us").alias("purchase_us"),
            best.alias("click_us"),
        )
        .filter(F.col("click_us").isNotNull())
        .orderBy("purchase_id")
    )


@query(
    "mv_incremental_hourly",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def mv_incremental_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: the hourly rollup is
    computed as BASE (events before the cutoff — "the MV we built
    yesterday") merged with DELTA (the new partition), by RE-AGGREGATING
    the partial states — counts add, exact decimal sums add. The oracle is
    the direct one-shot rollup: hash-equality proves the merge is lossless,
    which is the whole point of re-aggregatable MV state (and exactly why
    the engine's money-sums use decimal, not double: double partial sums
    would NOT merge associatively bit-for-bit).

    100 TB shape: each refresh aggregates ONLY the delta partition, then
    merges |hours x types|-sized states — never re-reads history. Same
    partial-agg contract Spark's own map-side combine relies on.
    """
    e = load_table(spark, sf_dir, "events").select(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00:00").alias(
            "hour"
        ),
        "event_type",
        F.col("value").cast("decimal(18,6)").alias("v"),
        F.col("ts"),
    )
    cutoff = e.agg(
        F.date_trunc("day", F.max("ts")).alias("c")
    )  # last full day boundary = the "new partition" split
    with_cut = e.crossJoin(F.broadcast(cutoff))
    partial = lambda df: df.groupBy("hour", "event_type").agg(  # noqa: E731
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
    )
    base = partial(with_cut.filter(F.col("ts") < F.col("c")))
    delta = partial(with_cut.filter(F.col("ts") >= F.col("c")))
    merged = (
        base.unionAll(delta)
        .groupBy("hour", "event_type")
        .agg(F.sum("n").alias("n"), F.sum("sv").alias("sv"))
    )
    return merged.select(
        "hour", "event_type", "n", F.col("sv").cast("double").alias("total_value")
    ).orderBy("hour", "event_type")


@query(
    "win_percent_of_total",
    oracle="""
    WITH c AS (
      SELECT n.n_name, o.o_orderpriority, COUNT(*) AS n
      FROM orders o
      JOIN customer cu ON o.o_custkey = cu.c_custkey
      JOIN nation n ON cu.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
    )
    SELECT n_name, o_orderpriority, CAST(n AS BIGINT) AS n,
           CAST((1000000 * n) // SUM(n) OVER (PARTITION BY n_name) AS BIGINT)
             AS share_ppm,
           CAST((1000000 * n) // SUM(n) OVER () AS BIGINT) AS overall_ppm
    FROM c
    ORDER BY 1, 2
    """,
)
def win_percent_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each (nation, priority) cell's share of its nation
    and of the grand total, as ppm integers (floor division — engine-
    exact). The OLAP percent-of-total shape: one grouped aggregate, then
    two window sums over the already-tiny cell grid (|nations x
    priorities|), so the windows cost nothing at any scale.
    """
    o = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    cells = (
        o.join(cu, o["o_custkey"] == cu["c_custkey"])
        .join(F.broadcast(n), cu["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_nat = Window.partitionBy("n_name")
    w_all = Window.partitionBy()
    return cells.select(
        "n_name",
        "o_orderpriority",
        "n",
        F.expr("1000000L * n").alias("_num"),
        F.sum("n").over(w_nat).alias("_nat"),
        F.sum("n").over(w_all).alias("_tot"),
    ).select(
        "n_name",
        "o_orderpriority",
        "n",
        F.expr("_num div _nat").alias("share_ppm"),
        F.expr("_num div _tot").alias("overall_ppm"),
    ).orderBy("n_name", "o_orderpriority")
