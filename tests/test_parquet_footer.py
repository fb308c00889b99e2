"""Cross-implementation validation of the hand-written parquet footer
walker (operators/ingest_queries.py): every column chunk of every test
table at sf0.001 compared field-by-field against DuckDB's independent
``parquet_metadata()`` — num_values, codec, offsets, compressed and
uncompressed sizes, dotted nested schema paths, row-group row counts —
plus a corruption battery. Unlike the self-roundtrip codecs, the
reference here is a production parquet reader we did not write.
"""

from __future__ import annotations

import glob

import duckdb
import pytest

from oe_batch_processing_spark.operators.ingest_queries import (
    parse_parquet_footer,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize(
    "path", sorted(glob.glob(f"{SF_DIR}/*.parquet")),
    ids=lambda p: p.rsplit("/", 1)[1],
)
def test_footer_matches_duckdb_parquet_metadata(path):
    with open(path, "rb") as f:
        blob = f.read()
    meta = parse_parquet_footer(blob)

    con = duckdb.connect()
    ref = con.execute(
        "SELECT row_group_id, row_group_num_rows, column_id, "
        "path_in_schema, num_values, compression, data_page_offset, "
        "dictionary_page_offset, total_compressed_size, "
        "total_uncompressed_size "
        "FROM parquet_metadata(?) ORDER BY row_group_id, column_id",
        [path],
    ).fetchall()

    mine = []
    for rg_id, rg in enumerate(meta["row_groups"]):
        for col_id, c in enumerate(rg["columns"]):
            mine.append((
                rg_id, rg["num_rows"], col_id, c["path"], c["num_values"],
                c["codec"], c["data_page_offset"],
                c["dictionary_page_offset"], c["total_compressed_size"],
                c["total_uncompressed_size"],
            ))
    assert mine == [tuple(r) for r in ref]

    # file-level row count agrees with the sum of row groups AND the view
    assert meta["num_rows"] == sum(rg["num_rows"] for rg in meta["row_groups"])
    (n,) = con.execute(f"SELECT COUNT(*) FROM '{path}'").fetchone()
    assert meta["num_rows"] == n


def test_footer_corruption_battery():
    path = f"{SF_DIR}/region.parquet"
    with open(path, "rb") as f:
        blob = f.read()

    with pytest.raises(ValueError, match="magic"):
        parse_parquet_footer(b"XXXX" + blob[4:])
    with pytest.raises(ValueError, match="magic"):
        parse_parquet_footer(blob[:-4] + b"XXXX")

    # footer length pointing past the file start
    import struct

    bad = blob[:-8] + struct.pack("<I", len(blob)) + blob[-4:]
    with pytest.raises(ValueError, match="footer length"):
        parse_parquet_footer(bad)

    # truncated thrift payload: chop bytes out of the footer body
    flen = struct.unpack("<I", blob[-8:-4])[0]
    start = len(blob) - 8 - flen
    bad = blob[:start] + blob[start + 40:]  # footer now shorter than flen
    with pytest.raises(ValueError):
        parse_parquet_footer(bad)


def test_table_row_count_metadata_only(spark, tmp_path):
    """The collapse gates' footer-count helper (tables.table_row_count,
    r15): exact on the driver's single-file tables, exact on a
    Spark-written DIRECTORY dataset (sums part footers), and re-reads
    when a temp dataset is rewritten (mtime-keyed cache)."""
    from oe_batch_processing_spark.tables import table_row_count

    # single-file driver tables: footer == df.count()
    for name in ("documents", "embeddings", "nation"):
        got = table_row_count(SF_DIR, name)
        want = spark.read.parquet(f"{SF_DIR}/{name}.parquet").count()
        assert got == want, name

    # Spark-written directory dataset (multiple part files)
    p = str(tmp_path / "documents.parquet")
    spark.range(137).selectExpr("id", "id * 2 as v").repartition(
        4
    ).write.mode("overwrite").parquet(p)
    assert table_row_count(str(tmp_path), "documents") == 137

    # rewrite with a different count: the cache must not serve stale n
    import time

    time.sleep(0.05)  # ensure mtime_ns moves even on coarse filesystems
    spark.range(23).selectExpr("id", "id * 2 as v").repartition(
        2
    ).write.mode("overwrite").parquet(p)
    assert table_row_count(str(tmp_path), "documents") == 23
