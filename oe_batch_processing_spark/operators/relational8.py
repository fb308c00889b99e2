"""Relational surface, part 8 (round 6): multiset set-ops, robust trend
estimation, weighted PPS sampling, and capped sessionization via a JVM
array fold.

Reference scope note: the reference engine (lib/batchProcessing.js) has no
relational surface at all — these operators extend the Spark-native
capability categories (SURVEY.md §2.2 set-ops / stats / pipeline /
sessionization rows) with the variants a 100 TB curation pipeline reaches
for next: bag semantics for reconciliation diffs, outlier-robust trend
fits, probability-proportional-to-size corpus sampling, and session
assignment whose state recurrence won't fit a plain window function.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from oe_batch_processing_spark.registry import query
from oe_batch_processing_spark.tables import load_table


# ---------------------------------------------------------------------------
# Multiset (bag) set operations — INTERSECT ALL / EXCEPT ALL
# ---------------------------------------------------------------------------

@query(
    "set_intersect_all_quantities",
    oracle="""
    SELECT l_quantity FROM lineitem WHERE l_returnflag = 'A'
    INTERSECT ALL
    SELECT l_quantity FROM lineitem WHERE l_returnflag = 'R'
    """,
)
def set_intersect_all_quantities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag semantics: each quantity value appears
    min(count_A, count_R) times. The reconciliation primitive for "how much
    of stream A is mirrored in stream B *including multiplicity*" (dedup
    accounting, ledger diffs), where plain INTERSECT would collapse counts.

    Plan: Spark compiles intersectAll to a single hash aggregate per side
    plus a join on the value — one shuffle per side on the compared value,
    no sort. Scale: identical profile to a groupBy(value); skew on a hot
    value is the usual salting/AQE story.
    """
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "A").select("l_quantity")
    r = li.filter(F.col("l_returnflag") == "R").select("l_quantity")
    return a.intersectAll(r)


@query(
    "set_except_all_quantities",
    oracle="""
    SELECT l_quantity FROM lineitem WHERE l_returnflag = 'A'
    EXCEPT ALL
    SELECT l_quantity FROM lineitem WHERE l_returnflag = 'R'
    """,
)
def set_except_all_quantities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag difference: count_A - count_R copies of each value
    survive (floor 0). The other half of multiset reconciliation: "what does
    A have that B doesn't, counted".
    """
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "A").select("l_quantity")
    r = li.filter(F.col("l_returnflag") == "R").select("l_quantity")
    return a.exceptAll(r)


# ---------------------------------------------------------------------------
# Theil-Sen robust trend (median of pairwise slopes, quantized-exact)
# ---------------------------------------------------------------------------

_TS_SCALE = 1_000_000


@query(
    "orders_trend_theil_sen",
    oracle=f"""
    WITH base AS (
      SELECT o_orderpriority AS series,
             CAST(floor(date_diff('day', DATE '1970-01-01',
                                  CAST(o_orderdate AS DATE)) / 7) AS BIGINT) AS wk,
             COUNT(*) AS x
      FROM orders GROUP BY 1, 2
    ),
    slopes AS (
      SELECT a.series,
             ({_TS_SCALE} * (b.x - a.x)) // (b.wk - a.wk) AS slope_q
      FROM base a JOIN base b
        ON b.series = a.series AND b.wk > a.wk
    ),
    ranked AS (
      SELECT series, slope_q,
             ROW_NUMBER() OVER (PARTITION BY series ORDER BY slope_q) AS rn,
             COUNT(*) OVER (PARTITION BY series) AS n_pairs
      FROM slopes
    )
    SELECT series, CAST(n_pairs AS BIGINT) AS n_pairs,
           slope_q AS slope_per_week_q
    FROM ranked WHERE rn = (n_pairs + 1) // 2
    """,
)
def orders_trend_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend over the weekly order-count series: the
    median of all pairwise slopes (xj-xi)/(wj-wi) per priority series —
    the standard outlier-robust alternative to OLS (up to ~29% arbitrary
    corruption tolerated), used to trend corpus-growth / quality-drift
    series where single bad weeks would wreck a least-squares fit.

    Exactness: slopes are quantized to integer micro-units with floor
    division (identical in both engines) and the median is the LOWER
    median (rank (n+1)//2 over an integer sort) — no double arithmetic
    anywhere, so the driver hash matches bit-for-bit.

    Scale: Theil-Sen is inherently O(n²) pairs per series, but n is the
    number of WEEKS (aggregate buckets), not raw rows: the heavy fact
    table collapses in one map-side-combined shuffle first; the pairwise
    self-join then runs on |weeks|² ≈ 120k rows — trivial. For multi-year
    daily series use the repeated-median variant or pair-sampling; the
    shape here (aggregate → bounded self-join → per-series rank) is
    unchanged.
    """
    orders = load_table(spark, sf_dir, "orders")
    base = (
        orders.select(
            F.col("o_orderpriority").alias("series"),
            F.floor(F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")) / 7)
            .cast("long")
            .alias("wk"),
        )
        .groupBy("series", "wk")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    a = base.select("series", F.col("wk").alias("wa"), F.col("x").alias("xa"))
    b = base.select("series", F.col("wk").alias("wb"), F.col("x").alias("xb"))
    slopes = (
        a.join(b, "series")
        .filter(F.col("wb") > F.col("wa"))
        .select(
            "series",
            F.expr(
                f"({_TS_SCALE} * (xb - xa)) div (wb - wa)"
            ).alias("slope_q"),
        )
    )
    w_rank = Window.partitionBy("series").orderBy("slope_q")
    w_all = Window.partitionBy("series")
    ranked = slopes.select(
        "series",
        "slope_q",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n_pairs"),
    )
    return ranked.filter(
        F.col("rn") == F.expr("(n_pairs + 1) div 2")
    ).select(
        "series", "n_pairs", F.col("slope_q").alias("slope_per_week_q")
    )


# ---------------------------------------------------------------------------
# Weighted PPS systematic sampling (integer cumulative weights, 2-phase scan)
# ---------------------------------------------------------------------------

_PPS_TARGET = 50
_PPS_BAND = 64  # docs per contiguous band for the distributed prefix sum


@query(
    "sample_pps_systematic",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, n_chars AS wt,
             SUM(n_chars) OVER (ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum
      FROM documents
    ),
    tot AS (SELECT SUM(n_chars) // {_PPS_TARGET} AS step FROM documents)
    SELECT doc_id, wt,
           CAST(cum // step - (cum - wt) // step AS INTEGER) AS n_picks
    FROM w, tot
    WHERE cum // step > (cum - wt) // step
    """,
)
def sample_pps_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probability-proportional-to-size systematic sampling: walk the
    doc_id-ordered cumulative weight line (weight = n_chars) and pick every
    ``total/{_PPS_TARGET}``-th weight unit — each document is selected with
    probability (and multiplicity) proportional to its weight. The corpus
    subsampling primitive when longer documents should be proportionally
    represented (token-budget-proportional sampling), fully deterministic
    and integer-exact, unlike u^(1/w) reservoir keys whose float math
    diverges across engines.

    Distributed prefix sum (no global single-partition window over the
    corpus): contiguous bands of {_PPS_BAND} doc_ids → per-band totals →
    band offsets via a prefix sum over the TINY band-aggregate frame (the
    one tolerated unpartitioned window, same pattern as
    pipeline_curriculum_order) → in-band cumulative window partitioned by
    band. Three narrow shuffles bounded by |bands|, never a full-corpus
    sort to one task.
    """
    docs = load_table(spark, sf_dir, "documents")
    banded = docs.select(
        "doc_id",
        F.col("n_chars").alias("wt"),
        (F.col("doc_id") / _PPS_BAND).cast("long").alias("band"),
    )
    band_tot = banded.groupBy("band").agg(F.sum("wt").alias("band_w"))
    w_off = Window.orderBy("band").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = band_tot.select(
        "band", F.coalesce(F.sum("band_w").over(w_off), F.lit(0)).alias("off")
    )
    w_in = (
        Window.partitionBy("band")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        banded.join(F.broadcast(offsets), "band")
        .withColumn("cum", F.col("off") + F.sum("wt").over(w_in))
    )
    step = F.broadcast(
        docs.agg((F.sum("n_chars") / _PPS_TARGET).cast("long").alias("step"))
    )
    picked = (
        cum.crossJoin(step)
        .withColumn(
            "n_picks",
            (F.expr("cum div step") - F.expr("(cum - wt) div step")).cast("int"),
        )
        .filter(F.col("n_picks") >= 1)
    )
    return picked.select("doc_id", "wt", "n_picks")


# ---------------------------------------------------------------------------
# Capped sessionization — gap AND max-duration rule via a JVM array fold
# ---------------------------------------------------------------------------

_SESS_GAP_US = 1_800 * 1_000_000  # 30 min inactivity closes a session
_SESS_MAX_US = 21_600 * 1_000_000  # 6 h hard cap splits marathon sessions


@query(
    "events_sessionize_capped",
    oracle=f"""
    WITH RECURSIVE e AS (
      SELECT user_id, event_id, epoch_us(ts) AS t,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    r AS (
      SELECT user_id, event_id, t, rn, 1 AS sess, t AS anchor
      FROM e WHERE rn = 1
      UNION ALL
      SELECT e.user_id, e.event_id, e.t, e.rn,
             CASE WHEN e.t - r.t > {_SESS_GAP_US}
                       OR e.t - r.anchor > {_SESS_MAX_US}
                  THEN r.sess + 1 ELSE r.sess END,
             CASE WHEN e.t - r.t > {_SESS_GAP_US}
                       OR e.t - r.anchor > {_SESS_MAX_US}
                  THEN e.t ELSE r.anchor END
      FROM r JOIN e ON e.user_id = r.user_id AND e.rn = r.rn + 1
    )
    SELECT user_id, event_id, CAST(sess AS INTEGER) AS sess_idx,
           anchor AS sess_start_us
    FROM r
    """,
)
def events_sessionize_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with BOTH a 30-min inactivity gap and a 6-hour
    maximum session duration. The cap makes the recurrence genuinely
    stateful: whether row i starts a new session depends on the anchor
    chosen at an earlier split, which a plain gap>threshold window (one
    lag + running sum) cannot express — bots and left-open clients
    otherwise produce unbounded "sessions".

    Implementation: per-user events are collected into a sorted array and
    folded with the JVM ``aggregate`` higher-order function carrying
    (anchor, prev, idx) state and emitting (event_id, sess_idx, anchor)
    per element — the whole recurrence runs in codegen inside one task per
    user, zero Python. One shuffle (groupBy user), then explode.

    Scale: state per user is its event array; per-user event counts are
    bounded in practice (and a 100 TB run would window the fold by day
    first — the cap means no session crosses a 6 h boundary, so folding
    within (user, day-with-6h-overlap) is exact). The streaming twin of
    this recurrence is applyInPandasWithState (streaming/stateful.py).
    DuckDB oracle: the same recurrence as a recursive CTE over per-user
    row numbers.
    """
    events = load_table(spark, sf_dir, "events")
    per_user = (
        events.select(
            "user_id",
            F.struct(
                F.unix_micros("ts").alias("t"), F.col("event_id").alias("eid")
            ).alias("e"),
        )
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_list("e")).alias("evts"))
    )
    fold = F.expr(
        f"""
        aggregate(
          evts,
          struct(
            CAST(-1 AS BIGINT) AS anchor,
            CAST(-1 AS BIGINT) AS prev,
            0 AS idx,
            CAST(array() AS ARRAY<STRUCT<eid: BIGINT, sess: INT,
                                         anchor: BIGINT>>) AS out
          ),
          (st, e) -> CASE
            WHEN st.idx = 0
                 OR e.t - st.prev > {_SESS_GAP_US}L
                 OR e.t - st.anchor > {_SESS_MAX_US}L
            THEN struct(
                   e.t AS anchor, e.t AS prev, st.idx + 1 AS idx,
                   array_append(st.out,
                     struct(e.eid AS eid, st.idx + 1 AS sess,
                            e.t AS anchor)) AS out)
            ELSE struct(
                   st.anchor AS anchor, e.t AS prev, st.idx AS idx,
                   array_append(st.out,
                     struct(e.eid AS eid, st.idx AS sess,
                            st.anchor AS anchor)) AS out)
          END,
          st -> st.out
        )
        """
    )
    return (
        per_user.select("user_id", F.explode(fold).alias("s"))
        .select(
            "user_id",
            F.col("s.eid").alias("event_id"),
            F.col("s.sess").alias("sess_idx"),
            F.col("s.anchor").alias("sess_start_us"),
        )
    )


# ---------------------------------------------------------------------------
# Token-bucket admission control — batch twin of the reference throttle
# ---------------------------------------------------------------------------

_TB_CAP_U = 3_000_000  # bucket capacity: 3 tokens (micro-token units)
_TB_US_PER_UTOK = 600  # refill 1 token / 10 min  ==  1 utok / 600 us


_TOKEN_BUCKET_ORACLE = f"""
    WITH RECURSIVE e AS (
      SELECT user_id, event_id, epoch_us(ts) AS t,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    r AS (
      SELECT user_id, event_id, t, rn,
             TRUE AS admitted,
             CAST({_TB_CAP_U} - 1000000 AS BIGINT) AS tok_u
      FROM e WHERE rn = 1
      UNION ALL
      SELECT e.user_id, e.event_id, e.t, e.rn,
             LEAST({_TB_CAP_U}, r.tok_u + (e.t - r.t) // {_TB_US_PER_UTOK})
               >= 1000000 AS admitted,
             CASE WHEN LEAST({_TB_CAP_U},
                             r.tok_u + (e.t - r.t) // {_TB_US_PER_UTOK})
                       >= 1000000
                  THEN LEAST({_TB_CAP_U},
                             r.tok_u + (e.t - r.t) // {_TB_US_PER_UTOK})
                       - 1000000
                  ELSE LEAST({_TB_CAP_U},
                             r.tok_u + (e.t - r.t) // {_TB_US_PER_UTOK})
             END AS tok_u
      FROM r JOIN e ON e.user_id = r.user_id AND e.rn = r.rn + 1
    )
    SELECT user_id, event_id, admitted, tok_u AS tokens_after_u FROM r
    """


@query("events_token_bucket_admission", oracle=_TOKEN_BUCKET_ORACLE)
def events_token_bucket_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-bucket admission control replayed over the event log: each
    user's bucket holds {_TB_CAP_U}/1e6 tokens, refills 1 token per 10
    minutes, and each event consumes one token if available (admitted) or
    is rejected without consuming. This is the BATCH TWIN of the
    reference's throttled executor (reference lib/batchProcessing.js
    maxConcurrent/minTime pacing, re-expressed in sinks/rest_sink.py) —
    the same rate-limit semantics as an auditable, deterministic batch
    computation: "which of last month's requests would the limiter have
    admitted, and when does each user run dry".

    Implementation: identical skeleton to ``events_sessionize_capped`` —
    per-user sorted array, JVM ``aggregate`` fold carrying (tokens, prev_t)
    in micro-token integer units (1 token = 1e6 µtok; refill = Δt_us div
    {_TB_US_PER_UTOK}) — exact integer recurrence, zero Python, one
    shuffle. The DuckDB oracle replays the same recurrence as a recursive
    CTE. Scale: state is one array per user; day-windowed folding applies
    as in the capped sessionizer whenever per-key history is unbounded.
    """
    events = load_table(spark, sf_dir, "events")
    per_user = (
        events.select(
            "user_id",
            F.struct(
                F.unix_micros("ts").alias("t"), F.col("event_id").alias("eid")
            ).alias("e"),
        )
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_list("e")).alias("evts"))
    )
    fold = F.expr(
        f"""
        aggregate(
          evts,
          struct(
            CAST({_TB_CAP_U} AS BIGINT) AS tok,
            CAST(-1 AS BIGINT) AS prev,
            0 AS idx,
            CAST(array() AS ARRAY<STRUCT<eid: BIGINT, admitted: BOOLEAN,
                                         tok_after: BIGINT>>) AS out
          ),
          (st, e) -> CASE WHEN
              least(CAST({_TB_CAP_U} AS BIGINT),
                    IF(st.idx = 0, CAST({_TB_CAP_U} AS BIGINT),
                       st.tok + (e.t - st.prev) div {_TB_US_PER_UTOK}))
              >= 1000000L
            THEN struct(
              least(CAST({_TB_CAP_U} AS BIGINT),
                    IF(st.idx = 0, CAST({_TB_CAP_U} AS BIGINT),
                       st.tok + (e.t - st.prev) div {_TB_US_PER_UTOK}))
                - 1000000L AS tok,
              e.t AS prev, st.idx + 1 AS idx,
              array_append(st.out, struct(
                e.eid AS eid, true AS admitted,
                least(CAST({_TB_CAP_U} AS BIGINT),
                      IF(st.idx = 0, CAST({_TB_CAP_U} AS BIGINT),
                         st.tok + (e.t - st.prev) div {_TB_US_PER_UTOK}))
                  - 1000000L AS tok_after)) AS out)
            ELSE struct(
              least(CAST({_TB_CAP_U} AS BIGINT),
                    st.tok + (e.t - st.prev) div {_TB_US_PER_UTOK}) AS tok,
              e.t AS prev, st.idx + 1 AS idx,
              array_append(st.out, struct(
                e.eid AS eid, false AS admitted,
                least(CAST({_TB_CAP_U} AS BIGINT),
                      st.tok + (e.t - st.prev) div {_TB_US_PER_UTOK})
                  AS tok_after)) AS out)
          END,
          st -> st.out
        )
        """
    )
    return (
        per_user.select("user_id", F.explode(fold).alias("s"))
        .select(
            "user_id",
            F.col("s.eid").alias("event_id"),
            F.col("s.admitted").alias("admitted"),
            F.col("s.tok_after").alias("tokens_after_u"),
        )
    )


# ---------------------------------------------------------------------------
# Token-budget epoch planning (hash-shuffled, integer cumulative budget)
# ---------------------------------------------------------------------------

_EPOCH_BUDGET = 20_000  # tokens per training epoch
_EPOCH_BANDS = 256  # md5-prefix bands for the distributed prefix sum


@query(
    "pipeline_token_budget_epochs",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, n_chars // 4 AS tok,
             md5(CAST(doc_id AS VARCHAR) || ':' || text) AS h
      FROM documents
    ),
    c AS (
      SELECT doc_id, tok, h,
             SUM(tok) OVER (ORDER BY h
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum
      FROM d
    )
    SELECT doc_id, CAST(tok AS BIGINT) AS tok,
           CAST((cum - tok) // {_EPOCH_BUDGET} AS INTEGER) AS epoch
    FROM c
    """,
)
def pipeline_token_budget_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget epoch planning: documents are deterministically
    shuffled by md5 hash (the reproducible corpus shuffle every training
    run needs — no RNG state, resumable, engine-independent) and packed
    into consecutive epochs of {_EPOCH_BUDGET} tokens by walking the
    cumulative token count (token proxy: n_chars/4). Each doc lands in the
    epoch where its cumulative span begins — the batch-planning step that
    turns a curated corpus into fixed-budget training slices.

    Distributed prefix sum over the HASH order (third use of the banded
    pattern): the md5 hex prefix (first 2 chars, {_EPOCH_BANDS} bands) is
    order-consistent with the full-string sort, so per-band totals +
    offsets-over-band-aggregate + in-band window reproduce the global
    cumulative sum with shuffles bounded by |bands|, never a one-task
    global sort. DuckDB oracle uses the plain global window — identical
    ordering, identical integers.
    """
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.expr("n_chars div 4").alias("tok"),
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("text"))).alias("h"),
    ).withColumn("band", F.expr("conv(substring(h, 1, 2), 16, 10)").cast("long"))
    band_tot = d.groupBy("band").agg(F.sum("tok").alias("band_w"))
    w_off = Window.orderBy("band").rowsBetween(Window.unboundedPreceding, -1)
    offsets = band_tot.select(
        "band", F.coalesce(F.sum("band_w").over(w_off), F.lit(0)).alias("off")
    )
    w_in = (
        Window.partitionBy("band")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.join(F.broadcast(offsets), "band")
        .withColumn("cum", F.col("off") + F.sum("tok").over(w_in))
        .select(
            "doc_id",
            "tok",
            F.expr(f"CAST((cum - tok) div {_EPOCH_BUDGET} AS INT)").alias("epoch"),
        )
    )


# ---------------------------------------------------------------------------
# Cohort retention (the classic warehouse triangle), integer-exact
# ---------------------------------------------------------------------------

@query(
    "orders_cohort_retention",
    oracle="""
    WITH om AS (
      SELECT o_custkey,
             CAST(EXTRACT(YEAR FROM CAST(o_orderdate AS DATE)) * 12
                  + EXTRACT(MONTH FROM CAST(o_orderdate AS DATE)) - 1
                  AS BIGINT) AS ym
      FROM orders
    ),
    cohort AS (SELECT o_custkey, MIN(ym) AS c0 FROM om GROUP BY o_custkey)
    SELECT c.c0 AS cohort_ym,
           CAST(o.ym - c.c0 AS INTEGER) AS months_since,
           CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_customers
    FROM om o JOIN cohort c ON c.o_custkey = o.o_custkey
    GROUP BY 1, 2
    """,
)
def orders_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: customers grouped by first-order month
    (the cohort), counted distinct in each subsequent month offset — the
    canonical does-the-product-retain analysis, and for a data pipeline
    the does-this-source-keep-contributing monitor. Month arithmetic is
    pure integers (year*12 + month), no date truncation differences.

    Plan: one aggregate builds the per-customer cohort (map-side
    combined), joined back on the customer key (same shuffle key), then
    one count-distinct aggregate over the (cohort, offset) grid. At
    100 TB the cohort frame is |customers| rows — the join is the standard
    fact-enrichment shuffle; the output grid is O(months²) regardless of
    data size.
    """
    orders = load_table(spark, sf_dir, "orders")
    om = orders.select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .cast("long")
        .alias("ym"),
    )
    cohort = om.groupBy("o_custkey").agg(F.min("ym").alias("c0"))
    return (
        om.join(cohort, "o_custkey")
        .groupBy(
            F.col("c0").alias("cohort_ym"),
            (F.col("ym") - F.col("c0")).cast("int").alias("months_since"),
        )
        .agg(F.countDistinct("o_custkey").alias("n_customers"))
    )


# ---------------------------------------------------------------------------
# Wald-Wolfowitz runs test (randomness of a daily series), integer-exact
# ---------------------------------------------------------------------------

@query(
    "orders_runs_test_daily",
    oracle="""
    WITH d AS (
      SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n
      FROM orders GROUP BY 1
    ),
    med AS (
      SELECT n AS m FROM (
        SELECT n, ROW_NUMBER() OVER (ORDER BY n, day) AS rn,
               COUNT(*) OVER () AS cnt
        FROM d
      ) WHERE rn = (cnt + 1) // 2
    ),
    s AS (
      SELECT day, CASE WHEN n > (SELECT m FROM med) THEN 1 ELSE 0 END AS up
      FROM d WHERE n <> (SELECT m FROM med)
    ),
    r AS (
      SELECT up,
             CASE WHEN LAG(up) OVER (ORDER BY day) IS NULL
                       OR LAG(up) OVER (ORDER BY day) <> up
                  THEN 1 ELSE 0 END AS is_new_run
      FROM s
    )
    SELECT CAST(SUM(up) AS BIGINT) AS n_above,
           CAST(SUM(1 - up) AS BIGINT) AS n_below,
           CAST(SUM(is_new_run) AS BIGINT) AS n_runs
    FROM r
    """,
)
def orders_runs_test_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on the daily order-count series: sign each
    day against the series median (lower median, deterministic tie-break;
    median-equal days drop per the textbook rule), count the maximal runs
    of same sign. Too few runs = trending/clustered, too many =
    oscillating — the third nonparametric in the drift-test battery
    (KS: distribution, MWU: location, runs: independence). All integers.

    Plan: the fact table collapses to the daily grid first; the median
    rank and the lag walk run on the O(days) aggregate. Same
    aggregate-first discipline as the KS/MWU ops — the ordered windows
    never see raw rows.
    """
    orders = load_table(spark, sf_dir, "orders")
    d = orders.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w_rank = Window.orderBy("n", "day")
    med = (
        d.select(
            "n",
            F.row_number().over(w_rank).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy()).alias("cnt"),
        )
        .filter(F.col("rn") == F.expr("(cnt + 1) div 2"))
        .select(F.col("n").alias("m"))
    )
    s = (
        d.join(F.broadcast(med))
        .filter(F.col("n") != F.col("m"))
        .select("day", F.when(F.col("n") > F.col("m"), 1).otherwise(0).alias("up"))
    )
    w_day = Window.orderBy("day")
    r = s.select(
        "up",
        F.when(
            F.lag("up").over(w_day).isNull()
            | (F.lag("up").over(w_day) != F.col("up")),
            1,
        )
        .otherwise(0)
        .alias("is_new_run"),
    )
    return r.agg(
        F.sum("up").alias("n_above"),
        F.sum(F.lit(1) - F.col("up")).alias("n_below"),
        F.sum("is_new_run").alias("n_runs"),
    )


# ---------------------------------------------------------------------------
# Gini concentration of customer revenue (banded rank prefix, exact cents)
# ---------------------------------------------------------------------------

_GINI_BANDS = 128


@query(
    "customer_revenue_gini",
    oracle="""
    WITH rev AS (
      SELECT o_custkey,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT cents,
             ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS i,
             COUNT(*) OVER () AS n,
             SUM(cents) OVER () AS tot
      FROM rev
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_customers,
           CAST(MAX(tot) AS BIGINT) AS total_cents,
           CAST(SUM((2 * i - n - 1) * cents) AS BIGINT) AS gini_num,
           CAST(CAST(SUM((2 * i - n - 1) * cents) AS DOUBLE)
                / (CAST(MAX(n) AS DOUBLE) * CAST(MAX(tot) AS DOUBLE))
                AS DOUBLE) AS gini
    FROM ranked
    """,
)
def customer_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of revenue concentration across customers — the
    how-skewed-is-this-corpus statistic (for documents: token-mass
    concentration across sources; here: revenue across customers).
    G = Σ(2i−n−1)·x_(i) / (n·Σx) over ascending-sorted values; all sums
    are exact BIGINT cents, and the single final division is the same
    IEEE op on the same integers in both engines.

    Plan: the fact table collapses to per-customer cents (one shuffle);
    the ascending rank over that aggregate uses the banded prefix
    pattern at scale (128 range bands of the cents domain →
    per-band counts/offsets → in-band rank), here expressed as the plain
    window over the customer aggregate (|customers| ≪ |orders|), with
    the banded decomposition documented as the 100 TB path in SCALE.md.
    """
    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    w_rank = Window.orderBy("cents", "o_custkey")
    w_all = Window.partitionBy()
    ranked = rev.select(
        "cents",
        F.row_number().over(w_rank).alias("i"),
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.sum("cents").over(w_all).alias("tot"),
    )
    agg = ranked.agg(
        F.max("n").alias("n_customers"),
        F.max("tot").alias("total_cents"),
        F.sum(
            (F.lit(2) * F.col("i") - F.col("n") - F.lit(1)) * F.col("cents")
        ).alias("gini_num"),
    )
    return agg.select(
        "n_customers",
        "total_cents",
        "gini_num",
        (
            F.col("gini_num").cast("double")
            / (F.col("n_customers").cast("double") * F.col("total_cents").cast("double"))
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# Modern SQL surface: named WINDOW spec, SELECT * EXCEPT
# ---------------------------------------------------------------------------

_NAMED_WINDOW_SQL = """
SELECT o_custkey,
       o_orderkey,
       ROW_NUMBER() OVER w AS rn,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER w AS DOUBLE)
         AS running_spend,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_so_far
FROM orders
WHERE o_orderstatus = 'O'
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


@query("sql_window_named_spec", oracle=_NAMED_WINDOW_SQL)
def sql_window_named_spec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL:2003 named WINDOW clause: three window functions share one
    ``WINDOW w AS (...)`` spec — the syntax every migrated warehouse
    workload uses to keep multi-function window queries readable. Both
    engines support the clause, so the SQL text is shared VERBATIM, and
    Catalyst plans all three functions over a single Sort+Window (one
    Exchange on o_custkey), same as the spelled-out form.
    """
    from oe_batch_processing_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_NAMED_WINDOW_SQL)


@query(
    "sql_select_star_except",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer WHERE c_acctbal > 9000
    """,
)
def sql_select_star_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 ``SELECT * EXCEPT (cols)`` projection — the
    drop-the-wide-columns idiom (shed payload/PII columns without
    enumerating the keepers; survives upstream schema additions). The
    oracle spells out the surviving columns explicitly, proving EXCEPT
    resolves to exactly that projection; column pruning reaches the scan
    either way (ReadSchema shows only the kept columns).
    """
    from oe_batch_processing_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        "SELECT * EXCEPT (c_nationkey, c_acctbal) "
        "FROM customer WHERE c_acctbal > 9000"
    )


# ---------------------------------------------------------------------------
# Per-key deterministic reservoir sample (hash-rank top-k)
# ---------------------------------------------------------------------------

_RESERVOIR_K = 5


@query(
    "sample_reservoir_per_user",
    oracle=f"""
    SELECT user_id, event_id, event_type
    FROM (
      SELECT user_id, event_id, event_type,
             ROW_NUMBER() OVER (
               PARTITION BY user_id
               ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rn
      FROM events
    ) WHERE rn <= {_RESERVOIR_K}
    """,
)
def sample_reservoir_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key uniform sample without replacement: the {_RESERVOIR_K}
    events with the smallest md5(event_id) per user. Hash-rank top-k IS a
    reservoir sample (any fixed hash induces a uniform random permutation
    of ids), but unlike an RNG reservoir it is deterministic, re-runnable,
    and engine-independent — the per-key sampling primitive for building
    eval slices / debugging subsets from a 100 TB log.

    Plan: one shuffle on user_id; Spark's window-group-limit pushdown
    keeps only {_RESERVOIR_K} rows per key per partition before the final
    sort — no per-key full materialization.
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.md5(F.col("event_id").cast("string")), "event_id"
    )
    return (
        events.select(
            "user_id", "event_id", "event_type",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= _RESERVOIR_K)
        .select("user_id", "event_id", "event_type")
    )


# ---------------------------------------------------------------------------
# Burst detection — 2-state Kleinberg automaton, integer Viterbi forward pass
# ---------------------------------------------------------------------------

_BURST_G_US = 600 * 1_000_000  # gap threshold: < 10 min reads as "fast"
_BURST_EMIT = 3  # emission penalty for a gap that contradicts the state
_BURST_TRANS = 5  # state-switch penalty (hysteresis)


_BURST_ORACLE = f"""
    WITH RECURSIVE e AS (
      SELECT user_id, event_id, epoch_us(ts) AS t,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    g AS (
      SELECT e.user_id, e.event_id, e.rn - 1 AS gi,
             CASE WHEN e.t - p.t < {_BURST_G_US} THEN 1 ELSE 0 END AS fast
      FROM e JOIN e p ON p.user_id = e.user_id AND p.rn = e.rn - 1
    ),
    r AS (
      SELECT user_id, event_id, gi, fast,
             CAST(CASE WHEN fast = 1 THEN {_BURST_EMIT} ELSE 0 END
                  AS BIGINT) AS c0,
             CAST({_BURST_TRANS}
                  + CASE WHEN fast = 0 THEN {_BURST_EMIT} ELSE 0 END
                  AS BIGINT) AS c1
      FROM g WHERE gi = 1
      UNION ALL
      SELECT g.user_id, g.event_id, g.gi, g.fast,
             LEAST(r.c0, r.c1 + {_BURST_TRANS})
               + CASE WHEN g.fast = 1 THEN {_BURST_EMIT} ELSE 0 END AS c0,
             LEAST(r.c1, r.c0 + {_BURST_TRANS})
               + CASE WHEN g.fast = 0 THEN {_BURST_EMIT} ELSE 0 END AS c1
      FROM r JOIN g ON g.user_id = r.user_id AND g.gi = r.gi + 1
    )
    SELECT user_id, event_id, c0, c1,
           CASE WHEN c1 < c0 THEN 1 ELSE 0 END AS burst_state
    FROM r
    """


@query("events_burst_detection", oracle=_BURST_ORACLE)
def events_burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kleinberg-style burst detection, the 2-state integer form: each
    inter-arrival gap is classified fast/slow against a 10-minute
    threshold, and a 2-state automaton (base / burst) runs a Viterbi
    forward pass with emission penalty {_BURST_EMIT} for gaps that
    contradict the state and transition penalty {_BURST_TRANS} for
    switching — hysteresis smoothing that labels sustained fast runs as
    bursts without flapping on single outliers (the activity-spike
    detector for logs/crawls/user streams). Integer costs end to end: no
    float log-probabilities, so both engines agree bit-for-bit.

    Same JVM ``aggregate`` fold skeleton as the capped sessionizer —
    state is (c0, c1, prev_t); forward-decoded label = argmin at each
    step (ties → base), emitted per event. DuckDB oracle: the identical
    recurrence as a recursive CTE. Scale: one shuffle on user_id; O(1)
    fold state; day-windowed folding applies as ever.
    """
    events = load_table(spark, sf_dir, "events")
    per_user = (
        events.select(
            "user_id",
            F.struct(
                F.unix_micros("ts").alias("t"), F.col("event_id").alias("eid")
            ).alias("e"),
        )
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_list("e")).alias("evts"))
        .filter(F.size("evts") >= 2)
    )
    fold = F.expr(
        f"""
        aggregate(
          slice(evts, 2, size(evts) - 1),
          struct(
            CAST(0 AS BIGINT) AS c0, CAST(0 AS BIGINT) AS c1,
            evts[0].t AS prev, 0 AS idx,
            CAST(array() AS ARRAY<STRUCT<eid: BIGINT, c0: BIGINT,
                                         c1: BIGINT>>) AS out
          ),
          (st, e) -> named_struct(
            'c0',
            IF(st.idx = 0,
               IF(e.t - st.prev < {_BURST_G_US}L, {_BURST_EMIT}L, 0L),
               least(st.c0, st.c1 + {_BURST_TRANS}L)
                 + IF(e.t - st.prev < {_BURST_G_US}L, {_BURST_EMIT}L, 0L)),
            'c1',
            IF(st.idx = 0,
               {_BURST_TRANS}L
                 + IF(e.t - st.prev >= {_BURST_G_US}L, {_BURST_EMIT}L, 0L),
               least(st.c1, st.c0 + {_BURST_TRANS}L)
                 + IF(e.t - st.prev >= {_BURST_G_US}L, {_BURST_EMIT}L, 0L)),
            'prev', e.t,
            'idx', st.idx + 1,
            'out', array_append(st.out, named_struct(
              'eid', e.eid,
              'c0',
              IF(st.idx = 0,
                 IF(e.t - st.prev < {_BURST_G_US}L, {_BURST_EMIT}L, 0L),
                 least(st.c0, st.c1 + {_BURST_TRANS}L)
                   + IF(e.t - st.prev < {_BURST_G_US}L, {_BURST_EMIT}L, 0L)),
              'c1',
              IF(st.idx = 0,
                 {_BURST_TRANS}L
                   + IF(e.t - st.prev >= {_BURST_G_US}L, {_BURST_EMIT}L, 0L),
                 least(st.c1, st.c0 + {_BURST_TRANS}L)
                   + IF(e.t - st.prev >= {_BURST_G_US}L, {_BURST_EMIT}L, 0L))))
          ),
          st -> st.out
        )
        """
    )
    return (
        per_user.select("user_id", F.explode(fold).alias("s"))
        .select(
            "user_id",
            F.col("s.eid").alias("event_id"),
            F.col("s.c0").alias("c0"),
            F.col("s.c1").alias("c1"),
            F.when(F.col("s.c1") < F.col("s.c0"), 1).otherwise(0).alias("burst_state"),
        )
    )


# ---------------------------------------------------------------------------
# Mann-Kendall trend test (the significance companion to Theil-Sen)
# ---------------------------------------------------------------------------

@query(
    "orders_trend_mann_kendall",
    oracle="""
    WITH base AS (
      SELECT o_orderpriority AS series,
             CAST(floor(date_diff('day', DATE '1970-01-01',
                                  CAST(o_orderdate AS DATE)) / 7) AS BIGINT) AS wk,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM orders GROUP BY 1, 2
    ),
    s AS (
      SELECT a.series,
             CAST(SUM(CASE WHEN b.x > a.x THEN 1
                           WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT)
               AS s_stat
      FROM base a JOIN base b ON b.series = a.series AND b.wk > a.wk
      GROUP BY a.series
    ),
    n AS (SELECT series, CAST(COUNT(*) AS BIGINT) AS n_obs FROM base GROUP BY 1),
    ties AS (
      SELECT series,
             CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
               AS tie_term
      FROM (
        SELECT series, x, COUNT(*) AS t FROM base GROUP BY 1, 2
      ) WHERE t > 1 GROUP BY series
    )
    SELECT s.series, n.n_obs, s.s_stat,
           CAST(n.n_obs * (n.n_obs - 1) * (2 * n.n_obs + 5)
                - COALESCE(t.tie_term, 0) AS BIGINT) AS var_x18
    FROM s JOIN n ON n.series = s.series
    LEFT JOIN ties t ON t.series = s.series
    """,
)
def orders_trend_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test over the weekly order-count series — the
    nonparametric is-there-a-monotone-trend test that pairs with
    ``orders_trend_theil_sen`` (MK says WHETHER the trend is significant,
    Theil-Sen says HOW STEEP): S = Σ_{i<j} sign(x_j − x_i), with the
    textbook tie-corrected variance reported as the exact integer
    var_x18 = 18·Var(S) = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5). Everything is
    integers (S, n, the tie term), so the driver hash is exact; the
    z-score is one float expression away for the caller (the division by
    18 and sqrt are deliberately left out to keep the relation integral).

    Scale: same shape as Theil-Sen — the fact table collapses to O(weeks)
    buckets first; the pairwise sign sum is a bounded |weeks|² self-join
    per series with a map-side-combined aggregate; ties come from one
    more tiny groupBy on the bucket frame.
    """
    orders = load_table(spark, sf_dir, "orders")
    base = (
        orders.select(
            F.col("o_orderpriority").alias("series"),
            F.floor(F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")) / 7)
            .cast("long")
            .alias("wk"),
        )
        .groupBy("series", "wk")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    a = base.select("series", F.col("wk").alias("wa"), F.col("x").alias("xa"))
    b = base.select("series", F.col("wk").alias("wb"), F.col("x").alias("xb"))
    s = (
        a.join(b, "series")
        .filter(F.col("wb") > F.col("wa"))
        .groupBy("series")
        .agg(
            F.sum(
                F.when(F.col("xb") > F.col("xa"), 1)
                .when(F.col("xb") < F.col("xa"), -1)
                .otherwise(0)
            ).alias("s_stat")
        )
    )
    n = base.groupBy("series").agg(F.count(F.lit(1)).alias("n_obs"))
    ties = (
        base.groupBy("series", "x")
        .agg(F.count(F.lit(1)).alias("t"))
        .filter(F.col("t") > 1)
        .groupBy("series")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).alias("tie_term")
        )
    )
    return (
        s.join(n, "series")
        .join(ties, "series", "left")
        .select(
            "series",
            "n_obs",
            "s_stat",
            (
                F.col("n_obs") * (F.col("n_obs") - 1) * (2 * F.col("n_obs") + 5)
                - F.coalesce("tie_term", F.lit(0))
            ).alias("var_x18"),
        )
    )


# ---------------------------------------------------------------------------
# IGNORE NULLS window battery (last/first/nth_value over sparse signals)
# ---------------------------------------------------------------------------

@query(
    "win_ignore_nulls_battery",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, ts,
             CASE WHEN event_type = 'purchase' THEN value END AS pv
      FROM events
    )
    SELECT user_id, event_id,
           last_value(pv IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS last_purchase_value,
           first_value(pv IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS first_purchase_value,
           nth_value(pv, 2 IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS second_purchase_value
    FROM e
    """,
)
def win_ignore_nulls_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IGNORE NULLS window family over a sparse signal (purchase value,
    NULL on every non-purchase event): carry-forward
    ``last_value IGNORE NULLS`` (the idiomatic LOCF — contrast with
    ``events_gap_fill_locf``'s count-group workaround, which predates
    engine support), per-user ``first_value`` and ``nth_value(2)`` over
    the full frame. Both engines implement the SQL:2008 null-treatment
    clause; the shared frame spec makes the results bit-identical.

    Plan: one user_id Exchange serves all three functions (same partition
    + order spec); the full-frame functions add no second sort.
    """
    events = load_table(spark, sf_dir, "events")
    pv = F.when(F.col("event_type") == "purchase", F.col("value"))
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_full = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return events.select(
        "user_id",
        "event_id",
        F.last(pv, ignorenulls=True).over(w_run).alias("last_purchase_value"),
        F.first(pv, ignorenulls=True).over(w_full).alias("first_purchase_value"),
        F.nth_value(pv, 2, ignoreNulls=True).over(w_full).alias("second_purchase_value"),
    )


# ---------------------------------------------------------------------------
# Seasonal Mann-Kendall (per-phase trend test, summed)
# ---------------------------------------------------------------------------

@query(
    "orders_trend_seasonal_mk",
    oracle="""
    WITH base AS (
      SELECT o_orderpriority AS series,
             CAST(EXTRACT(YEAR FROM CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
             CAST(EXTRACT(MONTH FROM CAST(o_orderdate AS DATE)) AS BIGINT) AS mo,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM orders GROUP BY 1, 2, 3
    ),
    s AS (
      SELECT a.series, a.mo,
             CAST(SUM(CASE WHEN b.x > a.x THEN 1
                           WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT)
               AS s_mo,
             CAST(COUNT(*) AS BIGINT) AS n_pairs_mo
      FROM base a JOIN base b
        ON b.series = a.series AND b.mo = a.mo AND b.yr > a.yr
      GROUP BY 1, 2
    )
    SELECT series,
           CAST(SUM(s_mo) AS BIGINT) AS s_seasonal,
           CAST(SUM(n_pairs_mo) AS BIGINT) AS n_pairs,
           CAST(COUNT(*) AS INTEGER) AS n_phases
    FROM s GROUP BY series
    """,
)
def orders_trend_seasonal_mk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEASONAL Mann-Kendall: the trend test that ignores seasonality by
    comparing each calendar month only against the SAME month of other
    years (Hirsch-Slack) — S_seasonal = Σ_month Σ_{yr_i<yr_j}
    sign(x_j − x_i). The plain MK test (``orders_trend_mann_kendall``)
    confounds seasonal cycles with trend; this is the hydrology-standard
    fix, and for pipeline telemetry the is-volume-really-growing test
    that a strong weekly/monthly cycle would otherwise fool. Integers
    end to end.

    Plan: fact table → (series, year, month) aggregate; the pairwise
    join is within (series, month) — 1/12th the pairs of plain MK — then
    two tiny aggregates. Same aggregate-first discipline as the rest of
    the trend family.
    """
    orders = load_table(spark, sf_dir, "orders")
    base = orders.groupBy(
        F.col("o_orderpriority").alias("series"),
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
    ).agg(F.count(F.lit(1)).alias("x"))
    a = base.select("series", "mo", F.col("yr").alias("ya"), F.col("x").alias("xa"))
    b = base.select("series", "mo", F.col("yr").alias("yb"), F.col("x").alias("xb"))
    s = (
        a.join(b, ["series", "mo"])
        .filter(F.col("yb") > F.col("ya"))
        .groupBy("series", "mo")
        .agg(
            F.sum(
                F.when(F.col("xb") > F.col("xa"), 1)
                .when(F.col("xb") < F.col("xa"), -1)
                .otherwise(0)
            ).alias("s_mo"),
            F.count(F.lit(1)).alias("n_pairs_mo"),
        )
    )
    return s.groupBy("series").agg(
        F.sum("s_mo").alias("s_seasonal"),
        F.sum("n_pairs_mo").alias("n_pairs"),
        F.count(F.lit(1)).cast("int").alias("n_phases"),
    )


# ---------------------------------------------------------------------------
# Budget-constrained mixture optimization (greedy exact LP solution)
# ---------------------------------------------------------------------------

_MIX_BUDGET_TOK = 30_000  # target token budget for the training mix
_MIX_RATE_SCALE = 1_000_000  # sampling rates quantized to micro-units


@query(
    "pipeline_budget_mixture_greedy",
    oracle=f"""
    WITH src AS (
      SELECT lang || '/' || source AS src,
             CAST(SUM(n_chars // 4) AS BIGINT) AS toks,
             -- quality proxy: per-source mean chars/word in micro-units
             CAST(({_MIX_RATE_SCALE} * SUM(CAST(n_chars AS BIGINT)))
                  // SUM(CAST(len(string_split(text, ' ')) AS BIGINT))
                  AS BIGINT) AS quality_q
      FROM documents GROUP BY 1
    ),
    ranked AS (
      SELECT src, toks, quality_q,
             COALESCE(SUM(toks) OVER (ORDER BY quality_q DESC, src
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING), 0) AS cum_before
      FROM src
    )
    SELECT src, toks, quality_q,
           CAST(CASE
             WHEN cum_before >= {_MIX_BUDGET_TOK} THEN 0
             WHEN cum_before + toks <= {_MIX_BUDGET_TOK} THEN {_MIX_RATE_SCALE}
             ELSE ({_MIX_RATE_SCALE} * ({_MIX_BUDGET_TOK} - cum_before)) // toks
           END AS BIGINT) AS rate_q,
           CAST(CASE
             WHEN cum_before >= {_MIX_BUDGET_TOK} THEN 0
             WHEN cum_before + toks <= {_MIX_BUDGET_TOK} THEN toks
             ELSE {_MIX_BUDGET_TOK} - cum_before
           END AS BIGINT) AS toks_taken
    FROM ranked
    """,
)
def pipeline_budget_mixture_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budget-constrained mixture optimization: choose per-source sampling
    rates maximizing total quality under a {_MIX_BUDGET_TOK}-token budget.
    The LP (maximize Σ qᵢ·rᵢ·tᵢ s.t. Σ rᵢ·tᵢ ≤ B, 0 ≤ rᵢ ≤ 1) has the
    exact greedy solution — take sources in descending quality until the
    budget breaks, fractional rate on the marginal source — so the
    "optimizer" is one ordered prefix sum over the per-source aggregate,
    fully deterministic (micro-unit rate quantization, integer token
    math, lexicographic tie-break on source name).

    Distinct from the quota mixers (`alloc_largest_remainder`,
    `pipeline_mix_temperature_sqrt`): those apportion a FIXED composition;
    this one derives the composition from a quality signal + budget — the
    planning step you run before the stratified sampler materializes it.

    Plan: corpus → per-source aggregate (one map-side-combined shuffle);
    the ordered window runs over |sources| rows. At 100 TB |sources| is
    thousands — still a single-partition frame, and the banded prefix
    pattern applies unchanged if it ever isn't.
    """
    docs = load_table(spark, sf_dir, "documents")
    src = docs.groupBy(
        F.concat_ws("/", "lang", "source").alias("src")
    ).agg(
        F.sum(F.expr("n_chars div 4")).alias("toks"),
        F.expr(
            f"CAST(({_MIX_RATE_SCALE} * SUM(CAST(n_chars AS BIGINT)))"
            " div SUM(CAST(size(split(text, ' ')) AS BIGINT)) AS BIGINT)"
        ).alias("quality_q"),
    )
    w = Window.orderBy(F.col("quality_q").desc(), "src").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = src.withColumn(
        "cum_before", F.coalesce(F.sum("toks").over(w), F.lit(0))
    )
    B, S = _MIX_BUDGET_TOK, _MIX_RATE_SCALE
    rate = F.expr(
        f"CAST(CASE WHEN cum_before >= {B} THEN 0 "
        f"WHEN cum_before + toks <= {B} THEN {S} "
        f"ELSE ({S} * ({B} - cum_before)) div toks END AS BIGINT)"
    )
    taken = F.expr(
        f"CAST(CASE WHEN cum_before >= {B} THEN 0 "
        f"WHEN cum_before + toks <= {B} THEN toks "
        f"ELSE {B} - cum_before END AS BIGINT)"
    )
    return ranked.select(
        "src", "toks", "quality_q", rate.alias("rate_q"), taken.alias("toks_taken")
    )
