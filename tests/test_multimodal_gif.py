"""GIF89a/LZW codec battery (operators/multimodal_gif.py).

The whole corpus is hash-oracled by the differential harness (GIF is
lossless), so these tests cover the codec edge cases and the corruption
grammar: LZW dict-full Clear re-emission, the KwKwK code, both interlace
modes, sub-block framing, and malformed-structure rejection.
"""

from __future__ import annotations

import numpy as np
import pytest

from oe_batch_processing_spark.operators.multimodal_gif import (
    _interlace_order,
    _lzw_compress,
    _lzw_decompress,
    encode_gif,
    parse_gif,
)


def test_lzw_roundtrip_including_table_full_clear():
    rng = np.random.RandomState(3)
    for n in [1, 10, 1000, 20000, 60000]:  # >~4k random bytes forces Clear
        data = bytes(rng.randint(0, 256, n).astype(np.uint8))
        assert _lzw_decompress(_lzw_compress(data)) == data


def test_lzw_kwkwk_and_repetitive_inputs():
    for pat in [b"aaaaaaaaaaaaaaaa", b"abababababababab" * 50, b"a" * 5000,
                b"abcabcabcabc" * 300]:
        assert _lzw_decompress(_lzw_compress(pat)) == pat


def test_lzw_actually_compresses_repetitive_data():
    """Sanity that the dict is used, not just literals emitted."""
    data = b"ab" * 2000
    assert len(_lzw_compress(data)) < len(data) // 2


def test_interlace_order_is_a_permutation():
    for h in (2, 5, 8, 13, 40):
        rows = _interlace_order(h)
        assert sorted(rows) == list(range(h))
    assert _interlace_order(16)[:4] == [0, 8, 4, 12]  # pass 1 then pass 2


def test_container_roundtrip_both_modes():
    rng = np.random.RandomState(7)
    for _ in range(15):
        w, h = int(rng.randint(5, 40)), int(rng.randint(2, 40))
        raster = bytes(rng.randint(0, 256, w * h).astype(np.uint8))
        for inter in (False, True):
            gif = encode_gif(raster, w, h, inter)
            w2, h2, gray, i2, n_ext = parse_gif(gif)
            assert (w2, h2, i2, n_ext) == (w, h, inter, 2)
            assert gray == raster


def test_interlace_flag_is_load_bearing():
    """Flipping the stored interlace bit must scramble row order (the
    de-interlacer is real work, not a no-op)."""
    h, w = 8, 4
    raster = bytes(range(h * w % 256)) * 1
    raster = bytes((r * 7 + c) % 256 for r in range(h) for c in range(w))
    gif = bytearray(encode_gif(raster, w, h, True))
    desc = gif.index(0x2C, 13 + 768)  # first 0x2C AFTER the palette bytes
    gif[desc + 9] &= ~0x40  # clear the interlace flag
    w2, h2, gray, i2, _ = parse_gif(bytes(gif))
    assert not i2
    assert gray != raster  # rows now in file order, not logical order


def test_corruption_battery():
    raster = bytes(range(200))
    base = encode_gif(raster, 20, 10, False)

    with pytest.raises(ValueError, match="signature"):
        parse_gif(b"NOTGIF" + base[6:])

    # truncated global color table
    with pytest.raises(ValueError, match="color table|trailer|truncated"):
        parse_gif(base[:100])

    # missing trailer
    with pytest.raises(ValueError, match="trailer"):
        parse_gif(base[:-1])

    # trailer with no image data: header + LSD + GCT + trailer
    with pytest.raises(ValueError, match="no image data"):
        parse_gif(base[:13 + 768] + b"\x3b")

    # unexpected separator
    bad = bytearray(base)
    desc = bad.index(0x2C, 13 + 768)
    bad[desc] = 0x7E
    with pytest.raises(ValueError, match="separator"):
        parse_gif(bytes(bad))

    # corrupt LZW stream: flip bits mid-data -> decode error or wrong
    # pixel count (both must raise, never return garbage silently)
    bad = bytearray(base)
    bad[-10] ^= 0xFF
    with pytest.raises(ValueError):
        parse_gif(bytes(bad))

    # non-grayscale palette rejected by the gray-corpus contract
    bad = bytearray(base)
    bad[13 + 3] = 99  # palette entry 1 red component diverges
    with pytest.raises(ValueError, match="grayscale"):
        parse_gif(bytes(bad))

    # bad LZW min code size
    bad = bytearray(base)
    mcs_pos = bad.index(0x2C, 13 + 768) + 10
    bad[mcs_pos] = 1
    with pytest.raises(ValueError, match="min code size"):
        parse_gif(bytes(bad))
