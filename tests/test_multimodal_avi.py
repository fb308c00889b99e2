"""RIFF/AVI MJPEG container battery (operators/multimodal_avi.py).

The end-to-end pipeline is hash-oracled by the differential harness;
these tests cover the container grammar itself: mux/demux mirror,
idx1 cross-checking, word-alignment padding, and corruption rejection.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from oe_batch_processing_spark.operators.multimodal_avi import (
    demux_avi,
    mux_avi,
)
from oe_batch_processing_spark.operators.multimodal_jpeg import encode_jpeg


def _frames(n=3, w=16, h=8, seed=0):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        grid = rng.randint(0, 256, (h // 8, w // 8)).astype(np.uint8)
        raster = np.kron(grid, np.ones((8, 8), dtype=np.uint8))
        out.append(encode_jpeg(raster.tobytes(), w, h, 1))
    return out


def test_mux_demux_mirror():
    frames = _frames(5)
    avi = mux_avi(frames, 16, 8)
    w, h, n, payloads = demux_avi(avi)
    assert (w, h, n) == (16, 8, 5)
    assert payloads == frames


def test_odd_sized_chunks_are_word_aligned():
    """JPEG payloads routinely have odd lengths; RIFF requires pad bytes
    that must NOT leak into the extracted payload."""
    frames = _frames(4, seed=3)
    odd = [f for f in frames if len(f) % 2]
    if not odd:  # force one odd payload via a one-byte comment-free tweak
        frames[0] += b""  # keep deterministic; construct odd manually below
    avi = mux_avi([b"\xff\xd8\xff\xd9\x00", b"\xff\xd8\xff\xd9"], 8, 8)
    # hand-check: first chunk payload 5 bytes -> padded to 6 in movi
    _, _, n, payloads = demux_avi(avi)
    assert n == 2
    assert payloads[0] == b"\xff\xd8\xff\xd9\x00"
    assert payloads[1] == b"\xff\xd8\xff\xd9"


def test_empty_video_roundtrips():
    avi = mux_avi([], 8, 8)
    w, h, n, payloads = demux_avi(avi)
    assert (w, h, n, payloads) == (8, 8, 0, [])


def test_corruption_battery():
    frames = _frames(2)
    avi = bytearray(mux_avi(frames, 16, 8))

    bad = avi.copy()
    bad[0:4] = b"RIFX"
    with pytest.raises(ValueError, match="RIFF"):
        demux_avi(bytes(bad))

    bad = avi.copy()
    bad[8:12] = b"WAVE"
    with pytest.raises(ValueError, match="AVI form"):
        demux_avi(bytes(bad))

    bad = avi.copy()
    struct.pack_into("<I", bad, 4, len(bad))  # wrong RIFF size
    with pytest.raises(ValueError, match="size mismatch"):
        demux_avi(bytes(bad))

    # corrupt the declared frame count in avih (offset: RIFF(12) +
    # LIST hdr(12) + avih hdr(8) + 4*4 bytes to dwTotalFrames)
    bad = avi.copy()
    avih_data = bad.find(b"avih") + 8
    struct.pack_into("<I", bad, avih_data + 16, 99)
    with pytest.raises(ValueError, match="frame count mismatch"):
        demux_avi(bytes(bad))

    # corrupt an idx1 offset
    bad = avi.copy()
    idx_data = bad.find(b"idx1") + 8
    struct.pack_into("<I", bad, idx_data + 8, 12345)
    with pytest.raises(ValueError, match="idx1 entry"):
        demux_avi(bytes(bad))

    # flip the stream handler away from MJPG
    bad = avi.copy()
    p = bad.find(b"vidsMJPG")
    bad[p + 4:p + 8] = b"H264"
    with pytest.raises(ValueError, match="vids/MJPG"):
        demux_avi(bytes(bad))

    # truncate inside movi
    with pytest.raises(ValueError):
        demux_avi(bytes(avi[: len(avi) // 2]))


def test_strf_dimension_cross_check():
    frames = _frames(1)
    avi = bytearray(mux_avi(frames, 16, 8))
    p = avi.find(b"strf") + 8
    struct.pack_into("<i", avi, p + 4, 999)  # biWidth != avih width
    with pytest.raises(ValueError, match="dimension mismatch"):
        demux_avi(bytes(avi))
