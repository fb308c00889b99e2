"""Custom connector via Spark 4's Python DataSource API.

The reference lets users plug arbitrary record sources/parsers into the
batch loop (custom parser hook, lib/batchProcessing.js:130-200 — a JS
callback per record). Spark 4's `pyspark.sql.datasource` is the
Spark-native form of that extension point: a user-defined source becomes a
real `spark.read.format(...)` with schema, partition planning, and option
handling — so it composes with every downstream operator, gets column
pruning at the boundary, and parallelizes by partitions() instead of a
single driver loop.

``SyntheticEventsDataSource`` is the registered demo connector: a
deterministic MINSTD-LCG record generator (id -> amount = id*48271 mod
2^31-1), split across N input partitions. Deterministic on purpose — the
driver's DuckDB oracle regenerates the identical rows with
generate_series, giving a full value-hash check on a *custom connector*,
not just a row count.

Scale: partitions() is the unit of parallelism — a real connector returns
one InputPartition per file/shard/offset-range; rows stream out of each
partition's read() iterator without materializing the partition in memory.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

MINSTD_MUL = 48271
MINSTD_MOD = 2147483647  # 2^31 - 1
KINDS = ("alpha", "beta", "gamma")


def synth_amount(rid: int) -> int:
    return (rid * MINSTD_MUL) % MINSTD_MOD


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("rows", 1000))
        self.nparts = int(options.get("partitions", 8))

    def partitions(self):  # one task per InputPartition
        return [InputPartition(i) for i in range(self.nparts)]

    def read(self, partition):
        i = partition.value
        lo = self.n * i // self.nparts
        hi = self.n * (i + 1) // self.nparts
        for rid in range(lo, hi):
            amount = synth_amount(rid)
            yield (rid, i, KINDS[amount % 3], amount)


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events").option("rows", N)``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "id BIGINT, part INT, kind STRING, amount BIGINT"

    def reader(self, schema):
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema):
        return SyntheticEventsStreamReader(self.options)


def register(spark) -> None:
    """Idempotently register the connector on this session."""
    spark.dataSource.register(SyntheticEventsDataSource)


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Streaming twin of the batch reader: serves the SAME deterministic
    LCG rows in fixed-size micro-batch slices, offset = next row id.
    A real connector would page a queue/changefeed here; the LCG keeps
    the full stream oracle-regenerable."""

    def __init__(self, options: dict):
        self.n = int(options.get("rows", 1000))
        self.batch = int(options.get("batch_rows", 250))

    def initialOffset(self):
        return {"i": 0}

    def read(self, start):
        i = int(start["i"])
        if i >= self.n:
            return iter([]), {"i": i}
        hi = min(i + self.batch, self.n)
        rows = [
            (rid, 0, KINDS[synth_amount(rid) % 3], synth_amount(rid))
            for rid in range(i, hi)
        ]
        return iter(rows), {"i": hi}

    def readBetweenOffsets(self, start, end):
        return iter(
            (rid, 0, KINDS[synth_amount(rid) % 3], synth_amount(rid))
            for rid in range(int(start["i"]), int(end["i"]))
        )
