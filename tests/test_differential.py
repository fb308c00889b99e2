"""Differential tests: every registered query vs its DuckDB oracle at
sf0.001 — the same check the driver runs at sf0.01."""

from __future__ import annotations

import pytest

import oe_batch_processing_spark.operators  # noqa: F401
from oe_batch_processing_spark import registry
from oe_batch_processing_spark.testing import compare, duckdb_connection

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, oracle_con):
    spdf = registry.QUERIES[name](spark, sf_dir).toPandas()
    sql = registry.ORACLE.get(name)
    if sql is None:
        # rows-only contract: must run and produce a stable, well-formed frame
        assert spdf is not None
        return
    odf = oracle_con.execute(sql).fetchdf()
    mismatch = compare(spdf, odf)
    assert mismatch is None, f"{name}: {mismatch}"
