"""Grouped-map UDAF surface (``applyInPandas``) — the engine's custom-
aggregate extension point (SURVEY.md §2.2 "UDAF via applyInPandas"; the
reference's only extension point is the scalar per-record hook O5).

Example operator: per-user trend (least-squares slope) of event value over
time. Exactness discipline: all moments are accumulated as Python integers
(exact, order-independent — group rows arrive in arbitrary order) from
integer-scaled inputs, and the closed-form slope is a fixed sequence of
double ops — so even this Python UDAF hash-matches its SQL oracle.

Scale: applyInPandas shuffles once on the group key and streams each group
as Arrow batches; group size bounds executor memory (events per user here).
For unbounded groups, pre-aggregate partial moments with a groupBy first and
finish the closed form driver-side or in a second tiny aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from oe_batch_processing_spark.registry import query
from oe_batch_processing_spark.tables import load_table

SLOPE_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n", IntegerType(), False),
        StructField("slope_per_min", DoubleType(), True),
    ]
)


def _slope_from_arrays(ts, yv):
    """(n, slope) from a single user's int64 ts_us / y_cents arrays —
    exact, order-independent moments. The four sums run as vectorized
    int64 reductions when a per-group bound PROVES no int64 overflow is
    possible (n * max|term| < 2^62); the sums convert back to Python
    ints so the closed form is arbitrary-precision either way. Groups
    that could overflow (astronomical spans) fall back to the Python-int
    loop — bit-identical results (r16, guide §4.2)."""
    xv = (ts - ts.min()) // 60_000_000
    n = len(xv)
    xm = int(xv.max(initial=0))
    ym = max(int(yv.max(initial=0)), -int(yv.min(initial=0)))
    if n * max(xm * xm, xm * ym, xm, ym) < (1 << 62):
        sx, sy = int(xv.sum()), int(yv.sum())
        sxx = int((xv * xv).sum())
        sxy = int((xv * yv).sum())
    else:
        x, y = xv.tolist(), yv.tolist()
        sx, sy = sum(x), sum(y)
        sxx = sum(v * v for v in x)
        sxy = sum(a * b for a, b in zip(x, y))
    denom = n * sxx - sx * sx
    if denom == 0:
        slope = None
    else:
        # fixed op order: int->double conversions then one expression,
        # mirrored exactly in the SQL oracle
        slope = (float(n * sxy) - float(sx * sy)) / float(denom)
    return n, slope


def _slope_group(pdf):
    """Grouped-map form of the slope kernel (the applyInPandas template;
    kept for the extension-point doc and tests — the query itself uses
    the partition-level form below, see udaf_user_value_trend)."""
    import pandas as pd

    n, slope = _slope_from_arrays(
        pdf["ts_us"].to_numpy(dtype="int64", copy=False),
        pdf["y_cents"].to_numpy(dtype="int64", copy=False),
    )
    return pd.DataFrame(
        {"user_id": [int(pdf["user_id"].iloc[0])], "n": [n], "slope_per_min": [slope]}
    )


def _slope_partition(batches):
    """Partition-level slope kernel: one pandas groupby per shuffled
    partition instead of one Python invocation + Arrow->pandas conversion
    PER GROUP. Measured at sf0.1 (1,500 users x ~67 events): the
    applyInPandas dispatch alone (trivial kernel) cost 3.8 s while this
    shape runs the FULL exact kernel in 0.6 s — the per-group conversion
    overhead, not the moment math, was the row's entire cost. Batches of
    one partition are concatenated (a user's rows may span Arrow batches);
    memory is one partition of 3-column rows, the same order as what the
    grouped form holds for its largest group."""
    import pandas as pd

    parts = list(batches)
    if not parts:  # empty partition (more partitions than groups at tiny SF)
        return
    pdf = pd.concat(parts, ignore_index=True)
    if len(pdf) == 0:
        return
    users, ns, slopes = [], [], []
    for uid, sub in pdf.groupby("user_id", sort=False):
        n, slope = _slope_from_arrays(
            sub["ts_us"].to_numpy(dtype="int64", copy=False),
            sub["y_cents"].to_numpy(dtype="int64", copy=False),
        )
        users.append(int(uid))
        ns.append(n)
        slopes.append(slope)
    out = pd.DataFrame(
        {"user_id": users, "n": ns, "slope_per_min": slopes}
    )
    out["n"] = out["n"].astype("int32")
    out["slope_per_min"] = out["slope_per_min"].astype("float64")
    yield out


@query(
    "udaf_user_value_trend",
    oracle="""
    WITH e AS (
      SELECT user_id,
             CAST(epoch_ns(ts) // 1000 AS BIGINT) AS ts_us,
             CAST(ROUND(value * 100) AS BIGINT) AS y_cents
      FROM events
    ),
    base AS (
      SELECT user_id, ts_us, y_cents,
             (ts_us - MIN(ts_us) OVER (PARTITION BY user_id)) // 60000000 AS x
      FROM e
    ),
    m AS (
      SELECT user_id,
             COUNT(*) AS n,
             SUM(x) AS sx, SUM(y_cents) AS sy,
             SUM(x * x) AS sxx, SUM(x * y_cents) AS sxy
      FROM base GROUP BY user_id
    )
    SELECT user_id,
           CAST(n AS INTEGER) AS n,
           CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                ELSE (CAST(n * sxy AS DOUBLE) - CAST(sx * sy AS DOUBLE))
                     / CAST(n * sxx - sx * sx AS DOUBLE)
           END AS slope_per_min
    FROM m
    """,
)
def udaf_user_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user least-squares slope of event value (cents) per minute — a
    custom Python aggregate with exact integer moments.

    Execution shape (r16 optimization, guide §4.1/§4.2): an explicit
    hash repartition on the group key followed by ``mapInPandas`` running
    ONE pandas groupby per partition. The original
    ``groupBy().applyInPandas`` form pays one Python call + one
    Arrow->pandas conversion PER GROUP, which on many-small-groups data
    is the whole cost (measured at sf0.1: 3.8 s for a trivial per-group
    kernel vs 0.6 s for this shape running the full exact kernel — the
    shuffle itself is 0.25 s). Same exchange on user_id, same exact
    moments, identical output relation; the grouped-map template lives on
    in ``_slope_group`` and the applyInPandas surface in the
    timeseries/multimodal operators, where groups are few and large."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.round(F.col("value") * 100).cast("long").alias("y_cents"),
    )
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    return e.repartition(n_part, "user_id").mapInPandas(
        _slope_partition, schema=SLOPE_SCHEMA
    )


@query(
    "user_value_trend_native",
    oracle="""
    WITH e AS (
      SELECT user_id,
             CAST(epoch_ns(ts) // 1000 AS BIGINT) AS ts_us,
             CAST(ROUND(value * 100) AS BIGINT) AS y_cents
      FROM events
    ),
    base AS (
      SELECT user_id, ts_us, y_cents,
             (ts_us - MIN(ts_us) OVER (PARTITION BY user_id)) // 60000000 AS x
      FROM e
    ),
    m AS (
      SELECT user_id,
             COUNT(*) AS n,
             SUM(x) AS sx, SUM(y_cents) AS sy,
             SUM(x * x) AS sxx, SUM(x * y_cents) AS sxy
      FROM base GROUP BY user_id
    )
    SELECT user_id,
           CAST(n AS INTEGER) AS n,
           CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                ELSE (CAST(n * sxy AS DOUBLE) - CAST(sx * sy AS DOUBLE))
                     / CAST(n * sxx - sx * sx AS DOUBLE)
           END AS slope_per_min
    FROM m
    """,
)
def user_value_trend_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JVM-native twin of ``udaf_user_value_trend`` — identical semantics and
    oracle, expressed as window + integer aggregates inside whole-stage
    codegen. Exists to quantify the brief's "UDFs are the slow path" rule:
    same answer, ~5-10x cheaper than the Python grouped-map (see bench).
    Prefer this shape in production; the UDAF form is the extension template
    for logic SQL genuinely can't express."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.round(F.col("value") * 100).cast("long").alias("y_cents"),
    )
    w = Window.partitionBy("user_id")
    base = e.withColumn(
        "x",
        ((F.col("ts_us") - F.min("ts_us").over(w)) / F.lit(60_000_000)).cast("long"),
    )
    m = base.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y_cents").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y_cents")).alias("sxy"),
    )
    denom = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = (
        (F.col("n") * F.col("sxy")).cast("double")
        - (F.col("sx") * F.col("sy")).cast("double")
    ) / denom.cast("double")
    return m.select(
        "user_id",
        F.col("n").cast("int").alias("n"),
        F.when(denom == 0, F.lit(None).cast("double")).otherwise(slope).alias(
            "slope_per_min"
        ),
    )


ARROW_STATS_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n", LongType(), False),
        StructField("total_cents", LongType(), True),
        StructField("min_cents", LongType(), True),
        StructField("max_cents", LongType(), True),
        StructField("n_distinct_types", LongType(), True),
    ]
)


@query(
    "arrow_user_value_stats",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS total_cents,
           MIN(CAST(round(value * 100) AS BIGINT)) AS min_cents,
           MAX(CAST(round(value * 100) AS BIGINT)) AS max_cents,
           COUNT(DISTINCT event_type) AS n_distinct_types
    FROM events GROUP BY user_id
    """,
)
def arrow_user_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``applyInArrow`` grouped map: per-user stats computed directly on
    pyarrow Tables — Spark 4's zero-pandas grouped extension point (one
    deserialization layer less than ``applyInPandas``: no
    Arrow→pandas→Arrow bounce, no dtype coercion surprises for large
    ints). The kernel runs pyarrow.compute aggregations over
    integer-cents columns, so the result is exact and the plain-SQL
    oracle hash-matches — same contract as the pandas UDAF twin
    (``udaf_user_value_trend``), one runtime dependency fewer.

    Scale: identical shuffle shape to applyInPandas (one exchange on the
    group key, Arrow-batched groups); pyarrow.compute stays in C++ with
    zero-copy views of the batch buffers.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def stats(table: pa.Table) -> pa.Table:
        cents = table.column("cents")
        return pa.table(
            {
                "user_id": [table.column("user_id")[0].as_py()],
                "n": [table.num_rows],
                "total_cents": [pc.sum(cents).as_py()],
                "min_cents": [pc.min(cents).as_py()],
                "max_cents": [pc.max(cents).as_py()],
                "n_distinct_types": [
                    pc.count_distinct(table.column("event_type")).as_py()
                ],
            },
            schema=pa.schema(
                [
                    ("user_id", pa.int64()),
                    ("n", pa.int64()),
                    ("total_cents", pa.int64()),
                    ("min_cents", pa.int64()),
                    ("max_cents", pa.int64()),
                    ("n_distinct_types", pa.int64()),
                ]
            ),
        )

    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return e.groupBy("user_id").applyInArrow(stats, schema=ARROW_STATS_SCHEMA)
