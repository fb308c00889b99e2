"""Multimodal column support (north-star scope): image/audio/video as opaque
``binary`` columns with typed metadata, plus decode / feature-extract plumbing
as Arrow-batched Pandas UDFs.

The container has no image/audio libraries, so the *decode* step is stubbed
behind ``NotImplementedError`` with a deterministic fake (byte-level feature
extraction) — the Spark-side plumbing (schema, partitioning, UDF signature,
batch shape) is real and tested (tests/test_ingestion.py).

Scale notes: binary payloads ride in parquet/Arrow untouched until the UDF
stage; ``mapInPandas`` streams Arrow batches so executor memory is bounded by
batch size (``spark.sql.execution.arrow.maxRecordsPerBatch``), not partition
size. Feature extraction is embarrassingly parallel — zero shuffles.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from oe_batch_processing_spark.registry import query
from oe_batch_processing_spark.tables import load_table

# Typed metadata envelope for an opaque media payload.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("n_bytes", IntegerType(), False),
        StructField("checksum", StringType(), False),  # md5 hex
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", IntegerType(), False),
        StructField("byte_histogram", ArrayType(LongType()), False),  # 16 bins
        StructField("mean_byte", IntegerType(), False),
    ]
)


def decode_image(payload: bytes) -> object:
    """Real image decode — requires an imaging library not present in this
    container. The pipeline plumbing around it is fully functional; swap this
    implementation on a cluster with codecs installed."""
    raise NotImplementedError(
        "image decode requires an imaging library (e.g. Pillow); "
        "use extract_features (deterministic byte-level fake) in this environment"
    )


def media_frame(docs: DataFrame) -> DataFrame:
    """Manufacture a media table from the documents table: utf-8 payload as
    the opaque binary + typed metadata. Stands in for real image/audio blobs;
    every downstream op only sees (binary, metadata)."""
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        payload.alias("payload"),
        F.octet_length(payload).alias("n_bytes"),
        F.md5(payload).alias("checksum"),
    )


def extract_features(media: DataFrame, batch_size_hint: int = 1024) -> DataFrame:
    """Deterministic byte-level feature extraction over Arrow batches —
    the stand-in for decode→resize→embed. Shows the real mapInPandas shape:
    binary in, fixed-width feature vector out."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out_rows = []
            for media_id, mtype, payload, n_bytes in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"], pdf["n_bytes"]
            ):
                b = bytes(payload or b"")
                hist = [0] * 16
                total = 0
                for byte in b:
                    hist[byte >> 4] += 1
                    total += byte
                out_rows.append(
                    {
                        "media_id": media_id,
                        "media_type": mtype,
                        "n_bytes": n_bytes,
                        "byte_histogram": hist,
                        "mean_byte": (total // len(b)) if b else 0,
                    }
                )
            yield pd.DataFrame(out_rows)

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


@query(
    "multimodal_binary_metadata",
    oracle="""
    SELECT doc_id AS media_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                ELSE 'video' END AS media_type,
           CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
           md5(text) AS checksum
    FROM documents
    """,
)
def multimodal_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary metadata projection: byte length + checksum of the
    payload, typed media kind. JVM-only (no Python), oracle-checkable."""
    docs = load_table(spark, sf_dir, "documents")
    return media_frame(docs).select("media_id", "media_type", "n_bytes", "checksum")


_BYTE_FEATURES_ORACLE = (
    """
    WITH h AS (
      SELECT doc_id AS media_id,
             CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                  ELSE 'video' END AS media_type,
             hex(encode(text)) AS hx,
             CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes
      FROM documents
    ),
    b AS (
      SELECT media_id, media_type, n_bytes,
             [ (instr('0123456789ABCDEF', hx[2*i+1]) - 1) * 16
             + (instr('0123456789ABCDEF', hx[2*i+2]) - 1)
               FOR i IN range(n_bytes)] AS bytes
      FROM h
    )
    SELECT media_id, media_type, n_bytes,
"""
    + ",\n".join(
        f"           CAST(LIST_SUM([CASE WHEN x // 16 = {i} THEN 1 ELSE 0 END"
        f" FOR x IN bytes]) AS BIGINT) AS bin_{i:02d}"
        for i in range(16)
    )
    + """,
           CAST(CASE WHEN n_bytes > 0 THEN LIST_SUM(bytes) // n_bytes
                     ELSE 0 END AS INTEGER) AS mean_byte
    FROM b
"""
)


@query("multimodal_byte_features", oracle=_BYTE_FEATURES_ORACLE)
def multimodal_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extraction plumbing end-to-end: binary payload → Arrow batch →
    Pandas UDF → fixed-width feature vector (16-bin byte histogram).

    The histogram is emitted as 16 flat ``bin_00``..``bin_15`` columns —
    downstream comparators (and the driver's value-hasher) only ever see
    scalar columns; the array form stays available via ``extract_features``.
    Oracle-checked despite the Python path: DuckDB reconstructs every byte
    from hex nibbles, so the full histogram relation is hash-verified.
    """
    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features(media_frame(docs))
    return feats.select(
        "media_id",
        "media_type",
        "n_bytes",
        *[F.col("byte_histogram").getItem(i).alias(f"bin_{i:02d}") for i in range(16)],
        "mean_byte",
    )


# --- resize / frame-sample plumbing ----------------------------------------

FRAME_BYTES = 64  # fixed "frame" size for the deterministic fake (small docs => several frames)
FRAME_STRIDE = 4  # sample every 4th frame

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_len", IntegerType(), False),
        StructField("frame_md5", StringType(), False),
    ]
)


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Real image resize — requires decode (see ``decode_image``). Swap in a
    Pillow-backed implementation on a cluster with codecs; the mapInPandas
    plumbing in ``thumbnail_frame`` is what carries over unchanged."""
    raise NotImplementedError(
        "image resize requires decode; this container has no imaging codecs"
    )


def thumbnail_frame(media: DataFrame, n_bytes_out: int = 64) -> DataFrame:
    """Deterministic stand-in for decode→resize→re-encode: stride-sample the
    payload down to ``n_bytes_out`` bytes. Same mapInPandas shape a real
    resize has: binary in, (smaller) binary out, one row per row."""
    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("thumb", BinaryType(), True),
            StructField("thumb_len", IntegerType(), False),
        ]
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload or b"")
                stride = max(1, len(b) // n_bytes_out)
                thumb = b[::stride][:n_bytes_out]
                rows.append(
                    {"media_id": media_id, "thumb": thumb, "thumb_len": len(thumb)}
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=schema)


_FRAME_ORACLE = f"""
    WITH m AS (
      SELECT doc_id AS media_id, hex(encode(text)) AS hx FROM documents
    ),
    f AS (
      SELECT media_id, CAST(i AS INTEGER) AS frame_idx,
             substring(hx, CAST(i * {2 * FRAME_BYTES} + 1 AS BIGINT),
                       {2 * FRAME_BYTES}) AS fh
      FROM m, UNNEST(range(CAST(CEIL(len(hx) / {2.0 * FRAME_BYTES}) AS BIGINT))) t(i)
      WHERE i % {FRAME_STRIDE} = 0
    )
    SELECT media_id, frame_idx,
           CAST(len(fh) / 2 AS INTEGER) AS frame_len,
           md5(fh) AS frame_md5
    FROM f
"""


@query("multimodal_frame_sample", oracle=_FRAME_ORACLE)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling: treat the opaque payload as a sequence of
    fixed-size frames, keep every FRAME_STRIDE-th, emit one row per sampled
    frame — the one-binary-in, many-rows-out mapInPandas shape (the same
    plumbing a real ffmpeg-backed sampler needs; only the slicing lambda
    changes).

    Oracle-checked despite being a Python-UDF path: frames are identified by
    md5 over the UPPERCASE HEX of their bytes, which DuckDB can reproduce
    with hex()/substring() (byte-aligned since every byte is 2 hex chars) —
    so the driver hash-verifies the full sampled relation, not just counts.

    Scale: embarrassingly parallel, zero shuffles; Arrow batch size bounds
    executor memory, and output size is input/STRIDE.
    """

    def run(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        step = 2 * FRAME_BYTES
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                hx = bytes(payload or b"").hex().upper()
                n_frames = (len(hx) + step - 1) // step
                for i in range(0, n_frames, FRAME_STRIDE):
                    fh = hx[i * step : (i + 1) * step]
                    rows.append(
                        {
                            "media_id": media_id,
                            "frame_idx": i,
                            "frame_len": len(fh) // 2,
                            "frame_md5": hashlib.md5(fh.encode()).hexdigest(),
                        }
                    )
            yield pd.DataFrame(rows)

    docs = load_table(spark, sf_dir, "documents")
    return media_frame(docs).select("media_id", "payload").mapInPandas(
        run, schema=FRAME_SCHEMA
    )
