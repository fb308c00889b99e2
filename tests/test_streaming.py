"""Streaming tests: unified batch/stream transformations and the streaming
ingestion path (readStream text -> native CSV parse -> foreachBatch ledger).

The four windowing operators are already differential-tested against DuckDB
through the registry (tests/test_differential.py); here we check the unified
API (same transformation on batch input) and the ingest-as-stream path.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from oe_batch_processing_spark.streaming.event_windows import (
    dedup_pairs,
    events_stream,
    run_available_now,
    tumbling_counts,
)
from oe_batch_processing_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_unified_transformation_batch_equals_stream(spark):
    """The same tumbling_counts transformation applied to the batch frame and
    to the bounded stream must agree (Spark's unified API contract)."""
    batch = tumbling_counts(load_table(spark, SF_DIR, "events"))
    stream = run_available_now(tumbling_counts(events_stream(spark, SF_DIR)), "complete")
    b = {tuple(r) for r in batch.collect()}
    s = {tuple(r) for r in stream.collect()}
    assert b == s and len(b) > 0


def test_stream_dedup_emits_each_key_once(spark):
    out = run_available_now(dedup_pairs(events_stream(spark, SF_DIR)), "append")
    rows = out.collect()
    assert len(rows) == len({tuple(r) for r in rows})  # no duplicate keys


def test_streaming_csv_ingest_foreachbatch(spark, tmp_path):
    """Micro-batch file ingestion: text stream -> CSV parse -> per-batch
    ledger append via foreachBatch — the streaming twin of engine.run_ingest."""
    src_dir = tmp_path / "incoming"
    src_dir.mkdir()
    for f in range(3):
        lines = [f"F{f}R{i},v{i}" for i in range(10)]
        (src_dir / f"part{f}.csv").write_text("\n".join(lines) + "\n")

    from oe_batch_processing_spark.sources.csv_source import (
        CsvOptions,
        csv_scan_native,
    )
    from oe_batch_processing_spark.sources.outcome import route_native

    opts = CsvOptions(csv_headers="key, value")
    schema = csv_scan_native(spark, str(src_dir), opts).schema

    stream = (
        spark.readStream.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(str(src_dir))
    )
    sink = str(tmp_path / "sink")
    os.makedirs(sink, exist_ok=True)

    def handle_batch(batch_df, batch_id):
        routed = route_native(batch_df)
        routed.success.drop("statusText", "error", "_corrupt_record").write.mode(
            "append"
        ).parquet(sink)

    q = (
        stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    out = spark.read.parquet(sink)
    assert out.count() == 30
    assert set(out.columns) == {"key", "value"}
    assert out.filter(F.col("key") == "F1R5").count() == 1


def test_stateful_operator_carries_state_across_microbatches(spark, tmp_path):
    """applyInPandasWithState must accumulate across micro-batches: split
    the events into 3 files, force one file per trigger, and the final
    per-user totals must equal the single-pass batch aggregate."""
    from pyspark.sql import functions as F

    from oe_batch_processing_spark.streaming.stateful import stateful_user_totals

    src = tmp_path / "events_parts"
    events = load_table(spark, SF_DIR, "events")
    events.withColumn("part", F.pmod("event_id", F.lit(3))).write.partitionBy(
        "part"
    ).parquet(str(src))

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/part=*")
    )
    out = stateful_user_totals(stream)
    import uuid as _uuid

    name = f"mem_{_uuid.uuid4().hex[:12]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    raw = spark.table(name)
    assert raw.count() > raw.select("user_id").distinct().count()  # >1 batch updated

    latest = raw.groupBy("user_id").agg(
        F.max(F.struct("n_events", "total_cents")).alias("s")
    ).select("user_id", "s.n_events", "s.total_cents")
    expected = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("total_cents"),
    )
    assert {tuple(r) for r in latest.collect()} == {tuple(r) for r in expected.collect()}


def test_stream_stream_join_batch_equals_stream(spark):
    """The interval join applied to batch frames must agree with its bounded
    stream-stream execution (inner joins emit matches immediately)."""
    from oe_batch_processing_spark.streaming.event_windows import (
        click_purchase_join,
    )

    ev = load_table(spark, SF_DIR, "events")
    batch = click_purchase_join(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    )
    stream = run_available_now(
        click_purchase_join(
            events_stream(spark, SF_DIR).filter(F.col("event_type") == "click"),
            events_stream(spark, SF_DIR).filter(F.col("event_type") == "purchase"),
        ),
        "append",
    )
    b = {tuple(r) for r in batch.collect()}
    s = {tuple(r) for r in stream.collect()}
    assert b == s and len(b) > 0


def test_stateful_ewma_carries_ordered_state_across_microbatches(spark, tmp_path):
    """The ORDER-DEPENDENT stateful operator (trailing-window EWMA) must be
    exact across micro-batches when batches arrive in event-time order (its
    documented contract): split events into 3 chronological files, one file
    per trigger, and every emitted row must equal the batch EWMA."""
    import time as _time
    import uuid as _uuid

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from oe_batch_processing_spark.operators.timeseries import events_ewma_user
    from oe_batch_processing_spark.streaming.stateful import stateful_user_ewma

    events = load_table(spark, SF_DIR, "events")
    ranked = events.withColumn(
        "tercile",
        F.ntile(3).over(Window.orderBy("ts", "event_id")),
    )
    src = tmp_path / "events_by_time"
    for t in (1, 2, 3):  # sequential writes => mtime order == time order
        ranked.filter(F.col("tercile") == t).drop("tercile").coalesce(
            1
        ).write.parquet(str(src / f"b{t}"))
        _time.sleep(1.1)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/b*")
    )
    name = f"mem_{_uuid.uuid4().hex[:12]}"
    q = (
        stateful_user_ewma(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.event_id): r.ewma for r in spark.table(name).collect()
    }
    expected = {
        (r.user_id, r.event_id): r.ewma
        for r in events_ewma_user(spark, SF_DIR).collect()
    }
    assert got == expected  # bit-exact, including rows whose window spans batches


def test_tws_plan_constructs_without_protobuf(spark):
    """transformWithStateInPandas plan construction (schema, streaming flag)
    must work even where google.protobuf is absent; execution goes through
    the pbshim wire-format module where the real runtime is missing, so
    registration is unconditional (round 9)."""
    from oe_batch_processing_spark.streaming import stateful

    df = stateful.tws_type_stats(events_stream(spark, SF_DIR))
    assert df.isStreaming
    assert [f.name for f in df.schema.fields] == [
        "event_type", "n_events", "total_cents", "min_cents", "max_cents"
    ]
    from oe_batch_processing_spark import registry

    assert "stream_tws_type_stats" in registry.QUERIES


def test_tws_matches_batch_oracle(spark):
    """Full end-to-end check of the transformWithState operator — on a
    protobuf-less container this exercises the hand-rolled pbshim state
    client end-to-end against the JVM RocksDB state server."""
    from oe_batch_processing_spark.streaming import stateful

    out = stateful.stream_tws_type_stats(spark, SF_DIR).collect()
    batch = (
        load_table(spark, SF_DIR, "events")
        .select("event_type", F.round(F.col("value") * 100).cast("long").alias("c"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("c").alias("total_cents"),
            F.min("c").alias("min_cents"),
            F.max("c").alias("max_cents"),
        )
        .collect()
    )
    assert {tuple(r) for r in out} == {tuple(r) for r in batch}


def test_split_leakage_gate_shares_batch_oracle():
    """The streaming gate must be the batch audit's literal twin: same
    oracle text (one source of truth for the expected report), registered,
    and carrying the in-operator >=4-micro-batch and non-vacuous-bloom
    assertions (grep-level pin so a refactor can't silently drop them)."""
    import inspect

    from oe_batch_processing_spark import registry
    from oe_batch_processing_spark.streaming import foreach_batch

    assert "stream_split_leakage_gate" in registry.QUERIES
    assert (
        registry.ORACLE["stream_split_leakage_gate"]
        == registry.ORACLE["pipeline_split_leakage_report"]
    )
    src = inspect.getsource(foreach_batch.stream_split_leakage_gate)
    assert 'screened["batches"] >= 4' in src
    # round-10 form: the vacuity tripwire is lazily scoped to
    # partially-clean corpora (a fully-leaked corpus legitimately passes
    # every shingle — found by the 10x scale probe)
    assert 'screened["survivors"] >= screened["shingles"]' in src
    assert "n_leaked == n_held" in src
