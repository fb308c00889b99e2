"""Mergeable-sketch operators (Apache DataSketches, built into Spark 3.5+/4.x).

Why sketches are a first-class 100 TB capability: a sketch computed once per
partition / per day / per segment can be UNIONED later into any rollup
without touching raw data again — the re-aggregatable distinct-count shape
that exact COUNT(DISTINCT) fundamentally lacks (it must re-shuffle raw keys
for every new grouping). Theta sketches additionally support set ALGEBRA
(intersection / difference) between segments, answering "how many distinct
users did BOTH X and Y" from two pre-computed summaries.

Estimates are approximate by nature, so these queries are rows-only for the
driver; their accuracy is pinned by `tests/test_sketches.py` against exact
distinct counts (default lgConfigK=12 => ~1.6% standard error for HLL;
theta similar at default lgNomEntries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oe_batch_processing_spark.registry import query
from oe_batch_processing_spark.tables import load_table


@query("sketch_hll_user_rollup")  # estimates => rows-only (accuracy pytest'd)
def sketch_hll_user_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-user rollup: one HLL sketch per event_type, plus
    an ALL row built by UNIONING the per-type sketches — never re-reading
    events. This is the production telemetry shape: sketch at ingest
    granularity (hour/partition/segment), answer every coarser rollup later
    by union — each union is O(sketch size), not O(data).

    Plan: one shuffle to build per-type sketches (partial sketch merge is
    map-side — sketches combine associatively), then a single-row union of
    the handful of per-type sketch blobs.
    """
    e = load_table(spark, sf_dir, "events")
    per_type = e.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    typed = per_type.select(
        F.col("event_type").alias("scope"),
        F.hll_sketch_estimate("sk").alias("distinct_users_est"),
    )
    overall = per_type.agg(
        F.hll_union_agg("sk").alias("u")
    ).select(
        F.lit("ALL").alias("scope"),
        F.hll_sketch_estimate("u").alias("distinct_users_est"),
    )
    return typed.unionAll(overall).orderBy("scope")


@query("sketch_theta_segment_overlap")  # estimates => rows-only
def sketch_theta_segment_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch set algebra between behavioral segments: from ONE
    sketch per event_type, estimate for every type pair the distinct-user
    INTERSECTION (users who did both) and DIFFERENCE (users who did A but
    never B) — questions exact distinct counts can only answer with a
    re-shuffle of raw user ids per pair, but sketches answer from the
    pre-computed per-segment summaries in O(pairs x sketch size) on the
    driver-side-sized result.

    Plan: one shuffle builds the per-type sketches; the pair matrix is a
    broadcast self-join of a <10-row frame — no second pass over events.
    """
    e = load_table(spark, sf_dir, "events")
    per_type = e.groupBy("event_type").agg(
        F.theta_sketch_agg("user_id").alias("sk")
    )
    a = per_type.select(
        F.col("event_type").alias("type_a"), F.col("sk").alias("sk_a")
    )
    b = per_type.select(
        F.col("event_type").alias("type_b"), F.col("sk").alias("sk_b")
    )
    pairs = a.join(F.broadcast(b), F.col("type_a") < F.col("type_b"))
    return pairs.select(
        "type_a",
        "type_b",
        F.theta_sketch_estimate(
            F.theta_intersection("sk_a", "sk_b")
        ).alias("overlap_est"),
        F.theta_sketch_estimate(
            F.theta_difference("sk_a", "sk_b")
        ).alias("only_a_est"),
    ).orderBy("type_a", "type_b")


@query(
    "agg_bitmap_exact_distinct",
    oracle="""
    SELECT scope, distinct_users FROM (
      SELECT event_type AS scope, CAST(COUNT(DISTINCT user_id) AS BIGINT)
               AS distinct_users
      FROM events GROUP BY 1
      UNION ALL
      SELECT 'ALL', CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events
    ) ORDER BY scope
    """,
)
def agg_bitmap_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT mergeable distinct counts via Spark's bitmap functions — the
    precision counterpart to ``sketch_hll_user_rollup``. Each (event_type,
    bucket) group folds its user ids into a fixed 4 KB bitmap
    (``bitmap_bucket_number`` / ``bitmap_bit_position`` shard the 32768-bit
    id space); bitmaps OR together associatively, so coarser scopes (the
    ALL row) come from unioning the already-built bitmaps — never
    re-reading events — and, unlike HLL, the merged counts are exact.

    100 TB shape: the first groupBy is the only pass over raw events
    (partial bitmap construction is map-side — each task emits one 4 KB
    blob per group, not its raw ids); the ALL rollup shuffles only
    |types| x |buckets| bitmap blobs. Dense-id domains (users, items) fit
    ~32k ids per 4 KB bucket; the bucket count scales linearly with the id
    space, independent of row count. Oracle: plain COUNT(DISTINCT) per
    scope — exactness is the whole claim, so this is fully hash-checked.
    """
    e = load_table(spark, sf_dir, "events")
    base = e.select(
        "event_type",
        F.expr("bitmap_bucket_number(user_id)").alias("bkt"),
        F.expr("bitmap_bit_position(user_id)").alias("pos"),
    )
    per_bucket = base.groupBy("event_type", "bkt").agg(
        F.expr("bitmap_construct_agg(pos)").alias("bm")
    )
    typed = per_bucket.groupBy("event_type").agg(
        F.sum(F.expr("bitmap_count(bm)")).alias("distinct_users")
    ).select(F.col("event_type").alias("scope"), "distinct_users")
    overall = (
        per_bucket.groupBy("bkt")
        .agg(F.expr("bitmap_or_agg(bm)").alias("bm"))
        .agg(F.sum(F.expr("bitmap_count(bm)")).alias("distinct_users"))
        .select(F.lit("ALL").alias("scope"), "distinct_users")
    )
    return typed.unionAll(overall).orderBy("scope")


@query(
    "sketch_countmin_user_counts",
    oracle="""
    WITH cells AS (
      SELECT r.r AS r,
             CAST(CAST('0x' || substr(md5('cms' || CAST(r.r AS VARCHAR)
                        || ':' || CAST(user_id AS VARCHAR)), 1, 8)
                  AS INT64) % 64 AS INT) AS c,
             COUNT(*) AS n
      FROM events, (SELECT UNNEST(range(4)) AS r) r
      GROUP BY 1, 2
    ),
    truth AS (
      SELECT user_id, COUNT(*) AS true_n FROM events GROUP BY user_id
    ),
    top AS (
      SELECT user_id, true_n FROM truth
      ORDER BY true_n DESC, user_id LIMIT 10
    ),
    est AS (
      SELECT t.user_id, t.true_n, MIN(cells.n) AS est_n
      FROM top t
      JOIN cells
        ON cells.c = CAST(CAST('0x' || substr(md5('cms'
                 || CAST(cells.r AS VARCHAR) || ':'
                 || CAST(t.user_id AS VARCHAR)), 1, 8) AS INT64) % 64 AS INT)
      GROUP BY t.user_id, t.true_n
    )
    SELECT user_id, true_n, est_n, est_n - true_n AS overestimate
    FROM est
    """,
)
def sketch_countmin_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch built from relational primitives — the mergeable
    FREQUENCY sketch (HLL answers "how many distinct", CMS answers "how
    often is key X") — with its one-sided error surfaced: point estimates
    for the 10 heaviest users alongside true counts.

    Construction is pure integer arithmetic on md5-derived cell indexes
    (d=4 rows × w=64 cols), so unlike a native noisy sketch the whole
    thing is engine-reproducible and the ORACLE verifies the full build +
    query path by value hash — estimate >= truth always (CMS never
    undercounts), with collisions inflating small counters first.

    Scale: the sketch build is ONE groupBy over (row, cell) — 256 counter
    cells total regardless of event volume, map-side combinable, and two
    sketches merge by cell-wise ADD (the same partial-agg contract as
    ``mv_incremental_hourly``). Width trades collision error (ε ≈ e/w)
    for fixed memory; at 100 TB you'd size w to the heavy-hitter gap and
    keep d at 4-6.
    """
    e = load_table(spark, sf_dir, "events")
    # cell index for row r: first 4 md5 bytes of 'cms{r}:{user}' mod 64 —
    # spelled identically (modulo hex-decode syntax) in both engines.
    def cell(r_col, user_col):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("cms"),
                            r_col.cast("string"),
                            F.lit(":"),
                            user_col.cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            )
            .cast("long")
            % 64
        ).cast("int")

    rows = spark.range(4).select(F.col("id").cast("int").alias("r"))
    cells = (
        e.crossJoin(F.broadcast(rows))
        .groupBy("r", cell(F.col("r"), F.col("user_id")).alias("c"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    truth = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_n"))
    top = truth.orderBy(F.col("true_n").desc(), "user_id").limit(10)
    est = (
        top.crossJoin(F.broadcast(rows))
        .withColumn("c", cell(F.col("r"), F.col("user_id")))
        .join(cells, ["r", "c"])
        .groupBy("user_id", "true_n")
        .agg(F.min("n").alias("est_n"))
    )
    return est.select(
        "user_id",
        "true_n",
        "est_n",
        (F.col("est_n") - F.col("true_n")).alias("overestimate"),
    )
