"""Python DataSource API connector (sources/py_datasource.py).

The Spark-4-native analog of the reference's custom source/parser hook
(lib/batchProcessing.js:130-200): a user-defined format with schema,
options, and partition planning. These tests pin the contract the
registered query relies on: determinism, partition parallelism, option
handling, and exact coverage of the id range (no dropped/duplicated rows
at partition boundaries).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oe_batch_processing_spark.sources import py_datasource


@pytest.fixture(scope="module")
def synth(spark):
    py_datasource.register(spark)
    return spark.read.format("synthetic_events")


def test_row_count_and_id_coverage(synth):
    df = synth.option("rows", 1000).option("partitions", 7).load()
    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("id").alias("n_ids"),
        F.min("id").alias("lo"),
        F.max("id").alias("hi"),
    ).first()
    # 1000 not divisible by 7: floor-split boundaries must still tile
    # [0, 1000) exactly — every id once, none twice.
    assert (agg.n, agg.n_ids, agg.lo, agg.hi) == (1000, 1000, 0, 999)


def test_partition_planning(synth):
    df = synth.option("rows", 100).option("partitions", 5).load()
    assert df.rdd.getNumPartitions() == 5
    per_part = dict(
        df.groupBy("part").count().collect()[i][0:2] for i in range(5)
    )
    assert per_part == {0: 20, 1: 20, 2: 20, 3: 20, 4: 20}


def test_deterministic_values(synth):
    rows = (
        synth.option("rows", 10)
        .option("partitions", 2)
        .load()
        .orderBy("id")
        .collect()
    )
    for r in rows:
        assert r.amount == py_datasource.synth_amount(r.id)
        assert r.kind == py_datasource.KINDS[r.amount % 3]
    # two reads agree bit-for-bit (connector is pure)
    again = (
        synth.option("rows", 10)
        .option("partitions", 3)  # different split, same data
        .load()
        .orderBy("id")
        .collect()
    )
    assert [(r.id, r.amount, r.kind) for r in rows] == [
        (r.id, r.amount, r.kind) for r in again
    ]


def test_column_pruning_projection(synth):
    # a 2-column projection through the connector stays correct
    df = synth.option("rows", 50).load().select("id", "kind")
    assert df.columns == ["id", "kind"]
    assert df.count() == 50


def test_jsonl_writer_two_phase_commit(spark, tmp_path):
    """Custom DataSourceWriter: per-task files + driver manifest must
    account for every row; file count matches task count."""
    import json
    import os

    from oe_batch_processing_spark.sources import py_datasource

    py_datasource.register(spark)
    out = str(tmp_path / "jsonl_out")
    os.makedirs(out, exist_ok=True)
    df = spark.range(0, 1000, 1, 4).selectExpr(
        "id", "CAST(id % 7 AS STRING) AS k"
    )
    df.write.format("oebp_jsonl").option("path", out).mode("append").save()

    with open(os.path.join(out, "_MANIFEST.json")) as f:
        manifest = json.load(f)
    assert manifest["total_rows"] == 1000
    assert len(manifest["files"]) == 4  # one file per input partition
    assert sum(n for _f, n in manifest["files"]) == 1000

    back = spark.read.schema("id long, k string").json(
        os.path.join(out, "part-*.jsonl")
    )
    assert back.count() == 1000
    assert back.selectExpr("sum(id)").collect()[0][0] == 499500
