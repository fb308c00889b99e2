"""Environment-drift canaries.

A Spark upgrade between rounds silently changed how parquet TIMESTAMP(NANOS)
columns are read (int64-nanos under the 3.x legacy conf -> TIMESTAMP_NTZ in
4.1+, which ignores `spark.sql.legacy.parquet.nanosAsLong`), breaking every
`unix_micros(ts)` call and every `withWatermark("ts", ...)` downstream. These
tests pin the loader contract so the NEXT drift fails one obvious test
instead of seventeen opaque ones.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

from oe_batch_processing_spark.tables import load_table


def test_events_ts_is_timestamp_type(spark, sf_dir):
    df = load_table(spark, sf_dir, "events")
    assert df.schema["ts"].dataType == TimestampType(), (
        f"events.ts must normalize to TimestampType, got "
        f"{df.schema['ts'].dataType}; a Spark upgrade likely changed how "
        f"parquet TIMESTAMP(NANOS) is surfaced — fix tables.load_table"
    )


def test_events_ts_unix_micros_resolves(spark, sf_dir):
    df = load_table(spark, sf_dir, "events")
    # resolves at analysis time and yields plausible microsecond epochs
    row = df.select(F.max(F.unix_micros("ts")).alias("us")).first()
    assert row["us"] is not None and row["us"] > 10**15  # past 2001-09-09


def test_events_ts_watermark_resolves(spark, sf_dir):
    # withWatermark requires TimestampType; analysis-time check is enough
    df = load_table(spark, sf_dir, "events")
    df.withWatermark("ts", "1 hour").groupBy(
        F.window("ts", "10 minutes")
    ).count().schema  # noqa: B018 — forces analysis


def test_events_stream_schema_matches_batch(spark, sf_dir):
    from oe_batch_processing_spark.streaming.event_windows import events_stream

    stream = events_stream(spark, sf_dir)  # asserts schema parity internally
    assert stream.schema["ts"].dataType == TimestampType()


def test_runtime_confs_apply_cleanly(spark, capsys):
    """Every conf in _RUNTIME_CONFS must be settable AND read back with the
    value we set — a removed/ignored conf (how nanosAsLong died) must warn."""
    from oe_batch_processing_spark import registry

    registry._CONF_WARNED.clear()
    registry.apply_runtime_confs(spark)
    assert not registry._CONF_WARNED, (
        f"runtime confs failed to apply: {sorted(registry._CONF_WARNED)}"
    )
    for k, v in registry._RUNTIME_CONFS.items():
        assert spark.conf.get(k) == v
