"""AIFF big-endian container + 80-bit extended float battery
(operators/multimodal_aiff.py). The end-to-end pipeline is hash-oracled;
these tests cover the f80 codec edge cases, IFF padding, and corruption
rejection.
"""

from __future__ import annotations

import struct

import pytest

from oe_batch_processing_spark.operators.multimodal_aiff import (
    decode_f80,
    demux_aiff,
    encode_f80,
    mux_aiff,
)


def test_f80_exact_integer_roundtrip():
    for r in [1, 2, 3, 8000, 11025, 22050, 44100, 48000, 96000,
              2 ** 20, 2 ** 40, 2 ** 62, 3 ** 25, (1 << 63) - 1]:
        b = encode_f80(r)
        assert len(b) == 10
        assert decode_f80(b) == r


def test_f80_known_vector_44100():
    """44100 = 0xAC44: exponent 16383+15=0x400E, mantissa 0xAC44 << 48."""
    assert encode_f80(44100) == bytes.fromhex("400EAC44000000000000")
    assert decode_f80(bytes.fromhex("400EAC44000000000000")) == 44100


def test_f80_rejections():
    with pytest.raises(ValueError, match="positive"):
        encode_f80(0)
    with pytest.raises(ValueError, match="negative"):
        decode_f80(bytes.fromhex("C00EAC44000000000000"))
    with pytest.raises(ValueError, match="NaN/Inf"):
        decode_f80(bytes.fromhex("7FFF8000000000000000"))
    with pytest.raises(ValueError, match="zero"):
        decode_f80(bytes(10))
    with pytest.raises(ValueError, match="denormal"):
        decode_f80(bytes.fromhex("400E2C44000000000000"))
    with pytest.raises(ValueError, match="non-integer"):
        # 0.5: exponent 16382, integer bit set, fraction zero
        decode_f80(bytes.fromhex("3FFE8000000000000000"))


def test_odd_payload_padding():
    """An odd number of samples makes SSND even (8 + 2n), but an odd COMM
    never occurs; force odd-chunk padding via a 1-sample file where the
    FORM walker must still land on chunk boundaries."""
    smp = [7]
    raw = mux_aiff(smp, 8000)
    assert demux_aiff(raw)[4] == smp
    # every chunk start in the walk is even-aligned
    assert len(raw) % 2 == 0


def test_corruption_battery():
    raw = bytearray(mux_aiff([1, -2, 300], 48000))

    bad = raw.copy()
    bad[0:4] = b"RIFF"
    with pytest.raises(ValueError, match="IFF FORM"):
        demux_aiff(bytes(bad))

    bad = raw.copy()
    bad[8:12] = b"AIFC"
    with pytest.raises(ValueError, match="AIFF form"):
        demux_aiff(bytes(bad))

    bad = raw.copy()
    struct.pack_into(">I", bad, 4, len(bad))  # wrong FORM size
    with pytest.raises(ValueError, match="size mismatch"):
        demux_aiff(bytes(bad))

    # declared frame count vs actual PCM bytes
    bad = raw.copy()
    p = bad.find(b"COMM") + 8
    struct.pack_into(">I", bad, p + 2, 99)
    with pytest.raises(ValueError, match="declared frames"):
        demux_aiff(bytes(bad))

    # stereo not supported by this profile
    bad = raw.copy()
    struct.pack_into(">h", bad, p, 2)
    with pytest.raises(ValueError, match="unsupported layout"):
        demux_aiff(bytes(bad))

    with pytest.raises(ValueError):
        demux_aiff(bytes(raw[: len(raw) - 3]))


def test_big_endian_is_load_bearing():
    """A little-endian reader would see byte-swapped samples; check the
    mux actually writes big-endian."""
    raw = mux_aiff([0x0102], 8000)
    pcm_at = raw.find(b"SSND") + 8 + 8
    assert raw[pcm_at:pcm_at + 2] == b"\x01\x02"
