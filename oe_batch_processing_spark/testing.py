"""Shared differential-test helpers (used by tools/check.py and tests/).

Comparison contract mirrors the driver: row count + column-name set +
order-insensitive values. Values must match exactly — including doubles,
which is achievable because every aggregate goes through exact decimal
summation (registry.dsum) and every per-row double expression is composed of
IEEE-deterministic ops.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb

from oe_batch_processing_spark.tables import TABLE_NAMES, table_path


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def norm_cell(v: Any):
    if v is None:
        return ("N",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return ("f", v)
    if isinstance(v, (list, tuple)):
        return ("l", tuple(norm_cell(x) for x in v))
    return ("o", str(type(v).__name__), str(v))


def df_to_rows(pdf):
    """(sorted column names, sorted normalized row tuples) for a pandas DF."""
    import numpy as np

    cols = sorted(pdf.columns)
    out = []
    for t in pdf[cols].itertuples(index=False, name=None):
        out.append(
            tuple(norm_cell(v.tolist() if isinstance(v, np.ndarray) else v) for v in t)
        )
    out.sort()
    return cols, out


def compare(spark_pdf, oracle_pdf) -> str | None:
    """Return None when equal, else a human-readable mismatch description."""
    scols, srows = df_to_rows(spark_pdf)
    ocols, orows = df_to_rows(oracle_pdf)
    if scols != ocols:
        return f"columns spark={scols} oracle={ocols}"
    if len(srows) != len(orows):
        return f"rowcount spark={len(srows)} oracle={len(orows)}"
    if srows != orows:
        n_bad = sum(1 for a, b in zip(srows, orows) if a != b)
        first = next((a, b) for a, b in zip(srows, orows) if a != b)
        return f"{n_bad}/{len(srows)} rows differ; first: spark={first[0]} oracle={first[1]}"
    return None
