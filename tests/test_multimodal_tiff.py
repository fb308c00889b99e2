"""Unit battery for the from-spec TIFF 6.0 grayscale codec
(operators/multimodal_tiff.py) and the exact box resize
(operators/multimodal.py round 9). Cross-engine hashes live in the
differential harness; these pin the grammars: PackBits edge cases, IFD
layout, strip reassembly, and a corruption battery proving the
validations fire.
"""

from __future__ import annotations

import struct

import pytest

from oe_batch_processing_spark.operators.multimodal import (
    resize_box,
    resize_image,
)
from oe_batch_processing_spark.operators.multimodal_tiff import (
    COMP_NONE,
    COMP_PACKBITS,
    ROWS_PER_STRIP,
    _tiff_pixels,
    encode_tiff,
    packbits_decode,
    packbits_encode_row,
    parse_tiff,
)


def test_packbits_spec_cases():
    # runs become (257-n, byte); literals <= 128 per chunk
    assert packbits_encode_row(b"\xaa" * 4) == bytes([253, 0xAA])
    assert packbits_encode_row(b"abc") == bytes([2]) + b"abc"
    # 300-run splits at 128
    enc = packbits_encode_row(b"q" * 300)
    assert packbits_decode(enc, 300) == b"q" * 300
    # mixed literal/run boundaries
    for row in [b"", b"x", b"aab", b"abb", bytes(range(256)), b"ab" * 100]:
        assert packbits_decode(packbits_encode_row(row), len(row)) == row


def test_packbits_decode_rejects_bad_lengths():
    with pytest.raises(ValueError, match="literal overruns"):
        packbits_decode(bytes([5, 1, 2]), 6)
    with pytest.raises(ValueError, match="run missing byte"):
        packbits_decode(bytes([255]), 2)
    with pytest.raises(ValueError, match="decoded"):
        packbits_decode(packbits_encode_row(b"abc"), 4)


def test_tiff_roundtrip_both_compressions_all_geometries():
    for doc in range(12):
        w, h = 8 + 4 * (doc % 3), 6 + 3 * (doc % 2)
        comp = COMP_NONE if doc % 2 == 0 else COMP_PACKBITS
        raster = _tiff_pixels(doc, w, h)
        t = encode_tiff(raster, w, h, comp)
        dw, dh, dc, strips = parse_tiff(t)
        assert (dw, dh, dc) == (w, h, comp)
        assert b"".join(strips) == raster
        assert len(strips) == (h + ROWS_PER_STRIP - 1) // ROWS_PER_STRIP


def test_tiff_packbits_actually_compresses():
    raster = _tiff_pixels(7, 16, 9)  # run-of-four pixels by construction
    assert len(encode_tiff(raster, 16, 9, COMP_PACKBITS)) < len(
        encode_tiff(raster, 16, 9, COMP_NONE)
    )


def test_tiff_corruption_battery():
    raster = _tiff_pixels(3, 12, 9)
    t = bytearray(encode_tiff(raster, 12, 9, COMP_PACKBITS))

    bad = bytearray(t); bad[0:2] = b"MM"
    with pytest.raises(ValueError, match="little-endian"):
        parse_tiff(bytes(bad))

    bad = bytearray(t); bad[2] = 43
    with pytest.raises(ValueError, match="magic"):
        parse_tiff(bytes(bad))

    # flip the compression tag to something unsupported (LZW=5)
    ifd_off = struct.unpack_from("<I", t, 4)[0]
    n = struct.unpack_from("<H", t, ifd_off)[0]
    for e in range(n):
        base = ifd_off + 2 + 12 * e
        tag = struct.unpack_from("<H", t, base)[0]
        if tag == 259:
            bad = bytearray(t)
            struct.pack_into("<I", bad, base + 8, 5)
            with pytest.raises(ValueError, match="unsupported compression"):
                parse_tiff(bytes(bad))
        if tag == 257:  # ImageLength: wrong strip count expectation
            bad = bytearray(t)
            struct.pack_into("<I", bad, base + 8, 40)
            with pytest.raises(ValueError, match="strips"):
                parse_tiff(bytes(bad))

    # truncate mid-strip
    with pytest.raises(ValueError):
        parse_tiff(bytes(t[:20]))


def test_resize_box_exact_means_and_errors():
    r = bytes(range(144))
    out, ow, oh = resize_box(r, 12, 12, 2)
    assert (ow, oh) == (6, 6)
    assert out[0] == (0 + 1 + 12 + 13) // 4
    # bottom-right block
    assert out[-1] == (r[130] + r[131] + r[142] + r[143]) // 4
    out3, ow3, oh3 = resize_box(r, 12, 12, 3)
    assert (ow3, oh3) == (4, 4)
    with pytest.raises(ValueError, match="f\\|w"):
        resize_box(r, 12, 12, 5)


def test_resize_image_p5_roundtrip_and_webp_raises():
    r = bytes((i * 7) % 256 for i in range(144))
    p5 = b"P5 12 12 255\n" + r
    out, ow, oh = resize_box(r, 12, 12, 3)
    assert resize_image(p5, 3) == b"P5 %d %d 255\n" % (ow, oh) + out
    with pytest.raises(NotImplementedError, match="WebP"):
        resize_image(b"RIFF....WEBP", 2)


def test_tiff_missing_strip_tags_raise_value_error():
    """ADVICE r9 (low): a TIFF whose IFD omits StripOffsets (273) or
    StripByteCounts (279) must surface as the documented ValueError, not a
    KeyError — array() now mirrors scalar()'s membership check."""
    raster = _tiff_pixels(5, 12, 9)
    t = bytearray(encode_tiff(raster, 12, 9, COMP_NONE))
    ifd_off = struct.unpack_from("<I", t, 4)[0]
    n = struct.unpack_from("<H", t, ifd_off)[0]
    for drop in (273, 279):
        bad = bytearray(t)
        for e in range(n):
            base = ifd_off + 2 + 12 * e
            if struct.unpack_from("<H", bad, base)[0] == drop:
                # retag the entry as a private tag the parser ignores
                struct.pack_into("<H", bad, base, 65000)
        with pytest.raises(ValueError, match=f"missing required tag {drop}"):
            parse_tiff(bytes(bad))
