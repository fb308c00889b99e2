"""Motion-JPEG video in an AVI container — the video pipeline, for real.

H.264 decodes for real as of round 9 (I-PCM baseline Annex-B,
multimodal_h264.py), and MJPEG — every frame an independent baseline
JPEG inside a RIFF/AVI container — is a genuine production video format
(capture cards, webcams, DV proxies), and BOTH halves are hand-written
here from the public specs: a muxer emitting the real RIFF grammar
(LIST hdrl with avih/strl/strh/strf, LIST movi with word-aligned 00dc
chunks, and the idx1 keyframe index) around frames produced by the
existing from-spec baseline JPEG encoder (multimodal_jpeg), and a
demuxer that re-walks the chunk tree, validates stream metadata
(vids/MJPG, BITMAPINFOHEADER), cross-checks every idx1 entry against
the movi chunks it actually finds (offset AND length), decodes every
frame with the hand-written JPEG parser, and verifies per-frame
dimensions against the container header.

Hash-oracle strategy: frames are flat-8x8-block rasters (the subspace
where baseline JPEG is provably bit-exact — multimodal_jpeg module
docstring), all frames of a video share one geometry (an AVI container
invariant: one biWidth/biHeight per stream), and every emitted statistic
is integer math over decoded pixels, so the DuckDB oracle recomputes the
whole per-video aggregate from the generation rule. A muxer/demuxer
disagreement (chunk padding, idx1 offset convention, frame order) kills
frames or reorders them and breaks n_frames / the frame-indexed
checksum; a codec regression breaks the luminance/gradient sums.

Reference scope note: the reference engine (SURVEY.md §2.1) has no
media path; this extends the §2.2 multimodal family — the natural unit
a 100 TB video-training corpus shards by is exactly "one container blob
per record".

Scale: one groupBy shuffle assembles frames into videos (videos are the
natural processing unit; the shuffle key is the video id, so skew equals
the longest video, bounded by the 8-frame grouping rule here and by
shard-time chunking in production), then a bounded round-robin fan-out
and one mapInPandas doing O(pixels) work per video. On a real corpus
the assembled-video stage is replaced by a binaryFile scan of .avi
blobs and ONLY the demux/decode stage runs.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oe_batch_processing_spark.operators.multimodal_jpeg import (
    encode_jpeg,
    parse_jpeg,
)
from oe_batch_processing_spark.registry import query
from oe_batch_processing_spark.tables import load_table

FRAMES_PER_VIDEO = 8  # grouping rule for the oracled corpus


# --- muxer -------------------------------------------------------------------


def mux_avi(frames: list[bytes], w: int, h: int) -> bytes:
    """Wrap per-frame JPEG payloads in a minimal-but-real AVI: RIFF
    'AVI ' / LIST hdrl (avih + strl(strh 'vids'/'MJPG' + strf
    BITMAPINFOHEADER)) / LIST movi ('00dc' chunks, word-aligned) /
    idx1 (offsets relative to the 'movi' fourcc, the common player
    convention)."""
    n = len(frames)
    avih = struct.pack(
        "<14I", 40000, 0, 0, 0x10, n, 0, 1, 0, w, h, 0, 0, 0, 0
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, 25, 0, n, 0, 0, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(fourcc: bytes, payload: bytes) -> bytes:
        body = fourcc + payload
        return b"LIST" + struct.pack("<I", len(body)) + body

    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)

    movi_payload = b""
    idx_entries = []
    for jpg in frames:
        # idx1 offset convention: from the position of the 'movi' fourcc;
        # the fourcc itself is 4 bytes, so the first chunk sits at +4.
        idx_entries.append((4 + len(movi_payload), len(jpg)))
        movi_payload += chunk(b"00dc", jpg)
    movi = lst(b"movi", movi_payload)
    idx1 = chunk(
        b"idx1",
        b"".join(
            b"00dc" + struct.pack("<III", 0x10, off, ln)
            for off, ln in idx_entries
        ),
    )
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


# --- demuxer -----------------------------------------------------------------


def demux_avi(b: bytes) -> tuple[int, int, int, list[bytes]]:
    """Parse an AVI byte stream -> (w, h, declared_frames, jpeg payloads).
    Validates the RIFF grammar, stream headers, and the idx1 index
    against the movi chunks actually present (offset and length)."""
    if len(b) < 12 or b[0:4] != b"RIFF":
        raise ValueError("not a RIFF file")
    riff_size = struct.unpack("<I", b[4:8])[0]
    if riff_size + 8 != len(b):
        raise ValueError("RIFF size mismatch")
    if b[8:12] != b"AVI ":
        raise ValueError("not an AVI form")

    w = h = declared = -1
    saw_vids_mjpg = saw_strf = False
    movi_fourcc_pos = -1
    chunks: list[tuple[int, int, bytes]] = []  # (off_from_movi, len, data)
    idx: list[tuple[int, int]] = []

    def walk(i: int, end: int) -> None:
        nonlocal w, h, declared, saw_vids_mjpg, saw_strf, movi_fourcc_pos
        while i + 8 <= end:
            fourcc = b[i:i + 4]
            size = struct.unpack("<I", b[i + 4:i + 8])[0]
            data_start = i + 8
            if data_start + size > end:
                raise ValueError(f"chunk {fourcc!r} overruns parent")
            if fourcc == b"LIST":
                kind = b[data_start:data_start + 4]
                if kind == b"movi":
                    movi_fourcc_pos = data_start
                    j = data_start + 4
                    movi_end = data_start + size
                    while j + 8 <= movi_end:
                        ck = b[j:j + 4]
                        cs = struct.unpack("<I", b[j + 4:j + 8])[0]
                        if j + 8 + cs > movi_end:
                            raise ValueError("movi chunk overrun")
                        if ck == b"00dc":
                            chunks.append((
                                j - movi_fourcc_pos,
                                cs,
                                b[j + 8:j + 8 + cs],
                            ))
                        j += 8 + cs + (cs % 2)
                else:
                    walk(data_start + 4, data_start + size)
            elif fourcc == b"avih":
                vals = struct.unpack("<14I", b[data_start:data_start + 56])
                declared, nstreams = vals[4], vals[6]
                w, h = vals[8], vals[9]
                if nstreams != 1:
                    raise ValueError(f"expected 1 stream, got {nstreams}")
            elif fourcc == b"strh":
                if b[data_start:data_start + 8] == b"vidsMJPG":
                    saw_vids_mjpg = True
            elif fourcc == b"strf":
                bi = struct.unpack("<Iii", b[data_start:data_start + 12])
                comp = b[data_start + 16:data_start + 20]
                if bi[0] != 40 or comp != b"MJPG":
                    raise ValueError("strf is not an MJPG BITMAPINFOHEADER")
                if (bi[1], bi[2]) != (w, h):
                    raise ValueError("strf/avih dimension mismatch")
                saw_strf = True
            elif fourcc == b"idx1":
                if size % 16:
                    raise ValueError("idx1 size not a multiple of 16")
                for e in range(size // 16):
                    ck, fl, off, ln = struct.unpack(
                        "<4sIII", b[data_start + 16 * e:data_start + 16 * e + 16]
                    )
                    if ck != b"00dc":
                        raise ValueError(f"unexpected idx1 ckid {ck!r}")
                    idx.append((off, ln))
            i = data_start + size + (size % 2)

    walk(12, len(b))
    if not (saw_vids_mjpg and saw_strf):
        raise ValueError("missing vids/MJPG stream headers")
    if movi_fourcc_pos < 0:
        raise ValueError("missing movi list")
    if len(idx) != len(chunks) or declared != len(chunks):
        raise ValueError(
            f"frame count mismatch: avih={declared} movi={len(chunks)} "
            f"idx1={len(idx)}"
        )
    for (ioff, iln), (coff, cln, _) in zip(idx, chunks):
        if (ioff, iln) != (coff, cln):
            raise ValueError(
                f"idx1 entry ({ioff},{iln}) != movi chunk ({coff},{cln})"
            )
    return w, h, declared, [c[2] for c in chunks]


# --- the oracled corpus query ------------------------------------------------

_AVI_ORACLE = """
    WITH g AS (
      SELECT doc_id // 8 AS video_id, doc_id,
             2 + (doc_id // 8) % 3 AS wb,
             1 + (doc_id // 8) % 4 AS hb,
             hex(encode(text)) AS hx,
             octet_length(encode(text)) AS n_bytes
      FROM documents
    ),
    d AS (SELECT * FROM g WHERE n_bytes >= wb * hb),
    v AS (
      SELECT video_id, doc_id, wb, hb,
             [ (instr('0123456789ABCDEF', hx[2*i+1]) - 1) * 16
             + (instr('0123456789ABCDEF', hx[2*i+2]) - 1)
               FOR i IN range(wb * hb)] AS bv,
             ROW_NUMBER() OVER (PARTITION BY video_id ORDER BY doc_id) - 1
               AS frame_no
      FROM d
    ),
    per_frame AS (
      SELECT video_id, wb, hb, frame_no,
             LIST_SUM(bv) // (wb * hb) AS mean_lum,
             COALESCE(LIST_SUM([
               CASE WHEN i % wb <> 0 THEN ABS(bv[i+1] - bv[i]) ELSE 0 END
               FOR i IN range(1, wb * hb)]), 0) AS hg,
             COALESCE(LIST_SUM([
               ABS(bv[i + wb + 1] - bv[i + 1])
               FOR i IN range(wb * (hb - 1))]), 0) AS vg
      FROM v
    )
    SELECT video_id,
           CAST(COUNT(*) AS INTEGER) AS n_frames,
           CAST(8 * ANY_VALUE(wb) AS INTEGER) AS w,
           CAST(8 * ANY_VALUE(hb) AS INTEGER) AS h,
           CAST(SUM(mean_lum) AS BIGINT) AS sum_mean_lum,
           CAST(8 * SUM(hg) AS BIGINT) AS hgrad_total,
           CAST(8 * SUM(vg) AS BIGINT) AS vgrad_total,
           CAST(SUM((frame_no + 1) * mean_lum) AS BIGINT) AS order_checksum
    FROM per_frame
    GROUP BY video_id
"""


@query("multimodal_video_mjpeg_avi_decode", oracle=_AVI_ORACLE)
def multimodal_video_mjpeg_avi_decode(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """REAL video pipeline with a full hash oracle: documents are grouped
    8-per-video (one shuffle on the video id — the natural unit), each
    frame is a flat-block raster JPEG-encoded by the from-spec baseline
    encoder, the frames are muxed into a genuine RIFF/AVI container
    (:func:`mux_avi`), and the decode side re-walks the container
    (:func:`demux_avi` — chunk tree, avih/strh/strf validation, idx1
    cross-check against the movi chunks), JPEG-decodes every frame, and
    emits per-video integer statistics. ``order_checksum`` weights each
    frame's mean luminance by its 1-based position in the stream, so a
    demuxer that drops, duplicates, or reorders frames breaks the hash
    even when the per-frame sums are right; dimension checks pin every
    frame to the container header.

    Scale: one groupBy shuffle (video-sized keys), a bounded round-robin
    fan-out, then embarrassingly parallel O(pixels)-per-video codec
    work. On a real corpus the mux side is replaced by a binaryFile scan
    of .avi blobs and only the demux/decode stage runs.
    """
    docs = load_table(spark, sf_dir, "documents")
    vid = F.expr("doc_id div 8")
    wb = (F.lit(2) + vid % 3).cast("int")
    hb = (F.lit(1) + vid % 4).cast("int")
    raw = F.encode(F.col("text"), "UTF-8")
    frames = (
        docs.select(
            vid.alias("video_id"),
            F.col("doc_id"),
            wb.alias("wb"),
            hb.alias("hb"),
            F.expr(
                "substring(encode(text, 'UTF-8'), 1, "
                "cast((2 + (doc_id div 8) % 3) * (1 + (doc_id div 8) % 4)"
                " as int))"
            ).alias("blocks"),
            F.octet_length(raw).alias("n_bytes"),
        )
        .filter(F.col("n_bytes") >= F.col("wb") * F.col("hb"))
    )
    videos = (
        frames.groupBy("video_id", "wb", "hb")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("doc_id", "blocks"))
            ).alias("frames")
        )
        # bounded fan-out: the tiny test parquet collapses to few
        # partitions post-AQE; real corpora enter via binaryFile splits
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for video_id, wb_, hb_, frame_rows in zip(
                pdf["video_id"], pdf["wb"], pdf["hb"], pdf["frames"]
            ):
                wb_, hb_ = int(wb_), int(hb_)
                w_px, h_px = 8 * wb_, 8 * hb_
                jpgs = []
                for fr in frame_rows:
                    bv = np.frombuffer(bytes(fr["blocks"]), dtype=np.uint8)
                    grid = bv.reshape(hb_, wb_)
                    raster = np.kron(grid, np.ones((8, 8), dtype=np.uint8))
                    jpgs.append(
                        encode_jpeg(raster.tobytes(), w_px, h_px, 1)
                    )
                avi = mux_avi(jpgs, w_px, h_px)  # the real container bytes

                dw, dh, n, payloads = demux_avi(avi)
                sum_mean = hg = vg = order_ck = 0
                for fno, payload in enumerate(payloads):
                    fw, fh, ns, planes, _rc = parse_jpeg(payload)
                    if (fw, fh) != (dw, dh) or ns != 1:
                        raise ValueError(
                            f"frame {fno} geometry {fw}x{fh}x{ns} != "
                            f"container {dw}x{dh}"
                        )
                    a = planes[0].astype(np.int64)
                    m = int(a.sum() // (fw * fh))
                    sum_mean += m
                    hg += int(np.abs(np.diff(a, axis=1)).sum())
                    vg += int(np.abs(np.diff(a, axis=0)).sum())
                    order_ck += (fno + 1) * m
                rows.append({
                    "video_id": int(video_id),
                    "n_frames": n,
                    "w": dw,
                    "h": dh,
                    "sum_mean_lum": sum_mean,
                    "hgrad_total": hg,
                    "vgrad_total": vg,
                    "order_checksum": order_ck,
                })
            yield pd.DataFrame(
                rows,
                columns=["video_id", "n_frames", "w", "h", "sum_mean_lum",
                         "hgrad_total", "vgrad_total", "order_checksum"],
            )

    return videos.mapInPandas(
        run,
        schema="video_id long, n_frames int, w int, h int, "
               "sum_mean_lum long, hgrad_total long, vgrad_total long, "
               "order_checksum long",
    )
