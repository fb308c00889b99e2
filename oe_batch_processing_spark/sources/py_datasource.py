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
2^31-1), split across N input partitions, with BOTH a batch reader and a
``simpleStreamReader`` (offset-paged micro-batches). Deterministic on
purpose — the driver's DuckDB oracle regenerates the identical rows with
generate_series, giving a full value-hash check on a *custom connector*,
not just a row count.

Ship-by-value requirement: every class (and every helper its methods
touch) is defined inside ``_build()`` so cloudpickle serializes them BY
VALUE. Module-top-level classes pickle by module reference, which works
for batch tasks (``addPyFile`` puts the package on executor workers) but
BREAKS the streaming source planner — Spark spawns a separate
``python_streaming_source_runner`` worker that does NOT see pyFiles, so a
by-reference pickle dies with ModuleNotFoundError on any session that
didn't inherit the repo's PYTHONPATH (found via the bare-session
driver-fidelity probe; the driver's harness builds exactly such a
session).

Scale: partitions() is the unit of parallelism — a real connector returns
one InputPartition per file/shard/offset-range; rows stream out of each
partition's read() iterator without materializing the partition in memory.
The stream reader's offset contract (initialOffset/read/readBetweenOffsets)
bounds each micro-batch at ``batch_rows`` regardless of backlog — the
reference's paused-stream backpressure as offset-range paging.
"""

from __future__ import annotations

MINSTD_MUL = 48271
MINSTD_MOD = 2147483647  # 2^31 - 1
KINDS = ("alpha", "beta", "gamma")


def synth_amount(rid: int) -> int:
    """Module-level twin for tests/oracles; the classes use the local copy."""
    return (rid * MINSTD_MUL) % MINSTD_MOD


def _build():
    """Define the connector classes in a local scope so cloudpickle ships
    them (and the helpers they close over) by value — see module docstring."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        DataSourceWriter,
        WriterCommitMessage,
        InputPartition,
        SimpleDataSourceStreamReader,
    )

    kinds = ("alpha", "beta", "gamma")
    mul, mod = 48271, 2147483647

    def amount(rid: int) -> int:
        return (rid * mul) % mod

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
                a = amount(rid)
                yield (rid, i, kinds[a % 3], a)

    class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
        """Streaming twin of the batch reader: serves the SAME
        deterministic LCG rows in fixed-size micro-batch slices, offset =
        next row id. A real connector would page a queue/changefeed here;
        the LCG keeps the full stream oracle-regenerable."""

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
                (rid, 0, kinds[amount(rid) % 3], amount(rid))
                for rid in range(i, hi)
            ]
            return iter(rows), {"i": hi}

        def readBetweenOffsets(self, start, end):
            return iter(
                (rid, 0, kinds[amount(rid) % 3], amount(rid))
                for rid in range(int(start["i"]), int(end["i"]))
            )

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

    class JsonlDirWriter(DataSourceWriter):
        """Per-partition JSON-lines file writer: each task streams its
        rows to ``<path>/part-<pid>.jsonl`` and returns (file, row count)
        as its commit message; ``commit`` writes a _MANIFEST.json from
        the collected messages — the classic two-phase commit shape of a
        DSv2 writer (task output + driver-side finalize)."""

        def __init__(self, options: dict):
            self.path = options["path"]

        def write(self, iterator):
            import json as _json
            import os

            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            fname = os.path.join(self.path, f"part-{pid:05d}.jsonl")
            n = 0
            with open(fname, "w") as f:
                for row in iterator:
                    f.write(_json.dumps(row.asDict()) + "\n")
                    n += 1
            return SimpleCommitMessage((fname, n))

        def commit(self, messages):
            import json as _json
            import os

            manifest = {
                "files": sorted(
                    [[os.path.basename(m.value[0]), m.value[1]]
                     for m in messages]
                ),
                "total_rows": sum(m.value[1] for m in messages),
            }
            with open(os.path.join(self.path, "_MANIFEST.json"), "w") as f:
                _json.dump(manifest, f)

        def abort(self, messages):
            pass

    class SimpleCommitMessage(WriterCommitMessage):
        def __init__(self, value):
            self.value = value

    class JsonlDirDataSource(DataSource):
        """``df.write.format("oebp_jsonl").option("path", DIR).save()``."""

        @classmethod
        def name(cls) -> str:
            return "oebp_jsonl"

        def writer(self, schema, overwrite):
            return JsonlDirWriter(self.options)

    return {
        "reader": SyntheticEventsReader,
        "stream_reader": SyntheticEventsStreamReader,
        "datasource": SyntheticEventsDataSource,
        "jsonl_writer_datasource": JsonlDirDataSource,
    }


_CLASSES = _build()
SyntheticEventsReader = _CLASSES["reader"]
SyntheticEventsStreamReader = _CLASSES["stream_reader"]
SyntheticEventsDataSource = _CLASSES["datasource"]
JsonlDirDataSource = _CLASSES["jsonl_writer_datasource"]


def register(spark) -> None:
    """Idempotently register the connectors on this session."""
    spark.dataSource.register(SyntheticEventsDataSource)
    spark.dataSource.register(JsonlDirDataSource)
