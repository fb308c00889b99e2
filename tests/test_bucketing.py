"""Bucketed co-located join: the 100 TB strategy for the fact-fact
(lineitem ⋈ orders) join — bucketing both tables on the join key at write
time removes the per-query shuffle entirely (SCALE.md). This test proves the
plan shape: same join, bucketed inputs => no Exchange on either side."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from oe_batch_processing_spark.plans.progress import formatted_plan
from oe_batch_processing_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    suffix = uuid.uuid4().hex[:8]
    li_name, o_name = f"li_b_{suffix}", f"o_b_{suffix}"
    load_table(spark, SF_DIR, "lineitem").write.bucketBy(8, "l_orderkey").sortBy(
        "l_orderkey"
    ).saveAsTable(li_name)
    load_table(spark, SF_DIR, "orders").write.bucketBy(8, "o_orderkey").sortBy(
        "o_orderkey"
    ).saveAsTable(o_name)
    yield li_name, o_name
    spark.sql(f"DROP TABLE IF EXISTS {li_name}")
    spark.sql(f"DROP TABLE IF EXISTS {o_name}")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    li_name, o_name = bucketed_tables
    li = spark.table(li_name)
    orders = spark.table(o_name)
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = formatted_plan(joined)
    join_section = plan.split("HashAggregate")[0]
    assert "Exchange" not in join_section, f"bucketed join still shuffles:\n{plan}"
    # and it still computes the right thing
    assert joined.count() == 5


def test_bucketed_matches_unbucketed(spark, bucketed_tables):
    li_name, o_name = bucketed_tables
    bucketed = (
        spark.table(li_name)
        .join(spark.table(o_name), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plain = (
        load_table(spark, SF_DIR, "lineitem")
        .join(
            load_table(spark, SF_DIR, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert {tuple(r) for r in bucketed.collect()} == {
        tuple(r) for r in plain.collect()
    }
