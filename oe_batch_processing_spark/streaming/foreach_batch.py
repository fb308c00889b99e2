"""foreachBatch incremental-upsert sink — the production streaming-write
pattern Structured Streaming itself doesn't provide as a one-liner: each
micro-batch is aggregated and MERGED into a keyed target table, so the
target always holds the running per-key state (count, exact decimal sum,
latest event by event time).

The reference's closest shape is the BatchRun counts ledger finalized per
run (lib/batchProcessing.js:600-700); here the ledger is keyed, versioned,
and maintained incrementally under streaming semantics.

Honest multi-batch execution: the source table is pre-split into four
files and streamed with ``maxFilesPerTrigger=1``, so the upsert genuinely
runs four times and the final state is the four-way MERGE of partial
aggregates — order-independent because every merged quantity is
associative-commutative (counts add, decimal sums add, "latest" is a max
over a (ts, event_id) struct). The DuckDB oracle computes the same state
in one batch pass; a hash match proves the incremental path is lossless —
the same partial-state contract as ``mv_incremental_hourly``, but driven
through the real streaming engine with a real sink callback.

Scale: each micro-batch shuffles only its own rows into |users|-sized
partial aggregates; the target merge is a keyed full-outer join of
|users| rows. On a cluster the target would be Delta/Iceberg ``MERGE
INTO`` (same frame, same keys — see ``merge_upsert_customer_balance``);
the versioned-directory swap here is the dependency-free equivalent.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oe_batch_processing_spark.registry import query
from oe_batch_processing_spark.tables import load_table


@query(
    "stream_foreachbatch_upsert",
    oracle="""
    WITH ranked AS (
      SELECT user_id, value,
             CAST(round(value * 100) AS BIGINT) AS cents,
             event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rk
      FROM events
    )
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
           MIN(CASE WHEN rk = 1 THEN event_id END) AS last_event_id,
           MIN(CASE WHEN rk = 1 THEN cents END) AS last_cents
    FROM ranked GROUP BY user_id
    """,
)
def stream_foreachbatch_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running state maintained by a foreachBatch MERGE across
    four real micro-batches (see module docstring)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "value",
        F.unix_micros("ts").alias("ts_us"),
    )
    root = tempfile.mkdtemp(prefix="oebp-feb-")
    src = os.path.join(root, "src")
    # four files => four micro-batches at maxFilesPerTrigger=1
    ev.repartitionByRange(4, "event_id").write.mode("overwrite").parquet(src)

    state = {"path": None, "version": 0}

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        # "latest event" merges as a max over a lexicographic struct —
        # associative, so batch arrival order cannot matter.
        agg = batch_df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("sum_dec"),
            F.max(
                F.struct(
                    "ts_us",
                    "event_id",
                    F.round(F.col("value") * 100).cast("long").alias("cents"),
                )
            ).alias("last"),
        )
        if state["path"] is None:
            merged = agg
        else:
            tgt = batch_df.sparkSession.read.parquet(state["path"])
            a, t = agg.alias("a"), tgt.alias("t")
            merged = (
                a.join(t, "user_id", "full_outer")
                .select(
                    "user_id",
                    (
                        F.coalesce(F.col("a.n_events"), F.lit(0))
                        + F.coalesce(F.col("t.n_events"), F.lit(0))
                    ).alias("n_events"),
                    (
                        F.coalesce(
                            F.col("a.sum_dec"), F.lit(0).cast("decimal(18,6)")
                        )
                        + F.coalesce(
                            F.col("t.sum_dec"), F.lit(0).cast("decimal(18,6)")
                        )
                    ).cast("decimal(18,6)").alias("sum_dec"),
                    F.greatest(
                        F.col("a.last"),
                        F.col("t.last"),
                    ).alias("last"),
                )
            )
        state["version"] += 1
        new_path = os.path.join(root, f"target_v{state['version']}")
        merged.write.mode("overwrite").parquet(new_path)
        state["path"] = new_path

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert state["version"] >= 4, "expected at least four micro-batches"

    final = spark.read.parquet(state["path"]).select(
        "user_id",
        "n_events",
        F.col("sum_dec").cast("double").alias("total_value"),
        F.col("last.event_id").alias("last_event_id"),
        F.col("last.cents").alias("last_cents"),
    )
    # materialize before cleanup (the returned frame must not depend on
    # the temp dir once the caller executes it)
    rows = final.collect()
    shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(rows, final.schema)
