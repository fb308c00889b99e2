"""Line-oriented text-file source (reference O1).

The reference streams a file line-by-line and emits
``{fileName, rec, recId}`` with a 1-based line number
(lib/batchProcessing.js:314-320). Spark equivalent: ``spark.read.text`` plus
line numbering.

Two modes:
  - **exact** (default): per-file ``zipWithIndex`` — deterministic 1-based,
    contiguous line numbers identical to the reference. Costs one extra pass
    per file (zipWithIndex's partition-count job); fine for ingestion runs
    which are one-file-at-a-time in the reference model.
  - **fast**: ``monotonically_increasing_id`` — unique and increasing within
    each partition but non-contiguous. The right trade at 100 TB when the
    ledger only needs a stable record id, not the literal line number.

CRLF handling: the reference fixtures are CRLF-terminated (SURVEY.md §5);
Spark's text reader splits on ``\n`` leaving a trailing ``\r``, which we strip
(the reference's readline layer does the same).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

RECDATA_SCHEMA = StructType(
    [
        StructField("fileName", StringType(), False),
        StructField("rec", StringType(), True),
        StructField("recId", LongType(), False),
    ]
)


def line_scan(
    spark: SparkSession,
    paths: str | list[str],
    exact_line_numbers: bool = True,
) -> DataFrame:
    """Scan text file(s) into the reference's recData envelope."""
    if isinstance(paths, str):
        paths = [paths]
    if exact_line_numbers:
        frames = [_scan_one_exact(spark, p) for p in paths]
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return out
    df = spark.read.text(list(paths))
    return df.select(
        F.input_file_name().alias("fileName"),
        F.regexp_replace(F.col("value"), "\r$", "").alias("rec"),
        (F.monotonically_increasing_id() + 1).alias("recId"),
    )


def _scan_one_exact(spark: SparkSession, path: str) -> DataFrame:
    lines = spark.read.text(path)
    indexed = lines.rdd.map(lambda r: r.value).zipWithIndex().map(
        lambda t: (path, t[0].rstrip("\r"), t[1] + 1)
    )
    return spark.createDataFrame(indexed, RECDATA_SCHEMA)
