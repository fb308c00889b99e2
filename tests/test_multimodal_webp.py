"""Unit battery for the VP8L WebP codec (LZ77 + literals subset)
(operators/multimodal_webp.py): LSB bit order, canonical code assignment,
both prefix-code serializations, RFC container grammar, and a corruption /
unsupported-feature battery proving the subset boundaries are enforced.
"""

from __future__ import annotations

import struct

import pytest

from oe_batch_processing_spark.operators.multimodal_webp import (
    CanonicalDecoder,
    LsbReader,
    LsbWriter,
    _webp_pixels,
    canonical_codes,
    encode_webp_vp8l,
    huffman_lengths,
    parse_webp_vp8l,
    read_prefix_code,
    write_prefix_code,
)


def test_lsb_bit_order_known_vector():
    w = LsbWriter()
    w.put(0b101, 3)
    w.put(0b01, 2)
    w.put(0xFF, 8)
    data = w.flush()
    r = LsbReader(data)
    assert r.get(3) == 0b101 and r.get(2) == 0b01 and r.get(8) == 0xFF
    # first byte: bits fill from the LSB up
    assert data[0] & 0b111 == 0b101


def test_canonical_codes_deflate_convention():
    # RFC 1951's worked example: lengths (3,3,3,3,3,2,4,4) for A..H
    lengths = {i: ln for i, ln in enumerate([3, 3, 3, 3, 3, 2, 4, 4])}
    codes = canonical_codes(lengths)
    assert codes[5] == (0b00, 2)
    assert codes[0] == (0b010, 3)
    assert codes[6] == (0b1110, 4)
    assert codes[7] == (0b1111, 4)


def test_huffman_lengths_kraft_and_optimality_shape():
    freqs = {0: 100, 1: 10, 2: 10, 3: 1}
    ln = huffman_lengths(freqs)
    assert sum(2 ** -l for l in ln.values()) <= 1.0 + 1e-12  # Kraft
    assert ln[0] < ln[3]


def test_prefix_code_roundtrip_simple_and_complex():
    for lengths, alphabet in [
        ({7: 1}, 256),                      # simple, one symbol
        ({3: 1, 200: 1}, 256),              # simple, two symbols
        ({0: 1}, 40),                       # simple on the distance alphabet
        (huffman_lengths({i: i + 1 for i in range(20)}), 280),  # complex
        (huffman_lengths({i * 13 % 256: 1 + i % 7 for i in range(60)}), 256),
    ]:
        w = LsbWriter()
        write_prefix_code(w, lengths, alphabet)
        dec = read_prefix_code(LsbReader(w.flush()), alphabet)
        # every symbol decodes back through its own emitted bits
        codes = canonical_codes(lengths) if len(lengths) > 1 else {
            next(iter(lengths)): (0, 0)
        }
        for sym, (code, nbits) in codes.items():
            w2 = LsbWriter()
            w2.put_code(code, nbits)
            w2.put(0, 8)  # padding so the reader never starves
            assert dec.read(LsbReader(w2.flush())) == sym


def test_full_roundtrip_and_compression():
    for doc in (0, 1, 17):
        w, h = 48 + 16 * (doc % 2), 32
        r = _webp_pixels(doc, w, h)
        blob = encode_webp_vp8l(r, w, h)
        dw, dh, dec = parse_webp_vp8l(blob)
        assert (dw, dh) == (w, h) and dec == r
        assert encode_webp_vp8l(dec, dw, dh) == blob
        assert 8 * len(blob) < 6 * w * h  # beats 8-bit raw by >25%


def test_constant_image_roundtrips():
    r = bytes([9] * 80)
    assert parse_webp_vp8l(encode_webp_vp8l(r, 10, 8))[2] == r


def test_container_corruption_battery():
    r = _webp_pixels(5, 48, 32)
    blob = bytearray(encode_webp_vp8l(r, 48, 32))

    bad = bytearray(blob); bad[0:4] = b"RIFX"
    with pytest.raises(ValueError, match="RIFF/WEBP"):
        parse_webp_vp8l(bytes(bad))

    bad = bytearray(blob)
    struct.pack_into("<I", bad, 4, 5)  # wrong RIFF size
    with pytest.raises(ValueError, match="RIFF size"):
        parse_webp_vp8l(bytes(bad))

    bad = bytearray(blob); bad[12:16] = b"VP8 "  # lossy chunk
    with pytest.raises(ValueError, match="lossless"):
        parse_webp_vp8l(bytes(bad))

    bad = bytearray(blob); bad[20] = 0x2E  # signature
    with pytest.raises(ValueError, match="signature"):
        parse_webp_vp8l(bytes(bad))

    with pytest.raises(ValueError):  # truncated stream
        parse_webp_vp8l(bytes(blob[:40]) if False else bytes(
            blob[:12]) + b"VP8L" + struct.pack("<I", 4) + blob[20:24])


def test_unsupported_feature_flags_rejected():
    """Bit-surgery on the header: the stream layout after the 28-bit dims +
    alpha + version is transform-present(32), type(33-34, LSB-first),
    loop-terminator(35), cache(36), meta(37). Rewriting the type bits or
    raising the other flags must produce the by-name subset errors —
    proves the decoder actually walks the signaling loop."""
    r = _webp_pixels(2, 48, 32)
    # use_predictor=False + use_color_transform=False keeps the historical
    # fixed bit layout this battery was written against (SG is the only
    # transform)
    blob = encode_webp_vp8l(
        r, 48, 32, use_predictor=False, use_color_transform=False
    )

    def flip(bits):
        bad = bytearray(blob)
        for bit in bits:
            bad[21 + bit // 8] ^= 1 << (bit % 8)  # payload starts at 20+sig
        return bytes(bad)

    # type 2 is encoded as bits (0, 1) at positions 33, 34 (LSB first).
    # ALL FOUR transform types are supported since round 11 (predictor and
    # color indexing since round 10, the color transform since round 11)
    # so no type rewrite belongs in this battery any more; the remaining
    # by-name rejections (meta, <=120 distance map, lossy, unsupported
    # COMBINATIONS) are covered here and in the crafted-stream batteries.
    with pytest.raises(ValueError, match="signaled twice"):
        parse_webp_vp8l(flip([35, 37]))        # loop again, type 2 again
    # the cache is SUPPORTED since round 10: raising the flag bit makes
    # the decoder parse the 4-bit size field (here the zero meta/code bits
    # -> bits=0, outside the spec's 1..11) — proves the field is walked
    with pytest.raises(ValueError, match="color-cache bits 0"):
        parse_webp_vp8l(flip([36]))
    with pytest.raises(ValueError, match="meta prefix"):
        parse_webp_vp8l(flip([37]))


def test_lz77_prefix_scheme_continuity():
    """RFC scheme: codes 0..3 carry 1..4, then contiguous power-of-two
    ranges — every value 1..5000 must roundtrip through its (code, extra,
    extra_bits) triple, and codes must be monotone in value."""
    from oe_batch_processing_spark.operators.multimodal_webp import (
        prefix_decode_value,
        prefix_encode_value,
    )

    prev_code = -1
    for v in range(1, 5001):
        code, extra, ebits = prefix_encode_value(v)
        assert code >= prev_code or v <= 4
        prev_code = max(prev_code, code)
        w = LsbWriter()
        w.put(extra, ebits)
        w.put(0, 8)
        assert prefix_decode_value(code, LsbReader(w.flush())) == v


def test_lz77_backrefs_roundtrip_including_overlap():
    from oe_batch_processing_spark.operators.multimodal_webp import lz77_parse

    cases = [
        bytes(200),              # one giant dist-1 overlap run
        b"abcabcabc" * 20,       # periodic, dist-3 overlaps
        bytes(range(240)),       # incompressible: literals only
        b"xy" + bytes(50) + b"xy" + bytes(52) + b"zzzz",  # long-range match, 110 B
    ]
    for r in cases:
        w, h = len(r) // 10, 10
        blob = encode_webp_vp8l(r, w, h)
        assert parse_webp_vp8l(blob)[2] == r
    # runs corpora must actually use the backref path
    assert any(op[0] == 1 for op in lz77_parse(bytes(200)))
    assert all(op[0] == 0 for op in lz77_parse(bytes(range(240))))


def test_lz77_bad_backrefs_rejected():
    """Craft streams with a backref before start / past end: take a valid
    all-zero image (starts with a literal then one big dist-1 backref) and
    shrink/grow the declared dimensions so the same ops become invalid."""
    r = bytes(100)
    blob = bytearray(encode_webp_vp8l(r, 10, 10))
    # dims live in payload bits 0..27 (after the signature byte at 20)
    # shrink the image so the backref overruns: width-1 = 4, height-1 = 9
    import struct as _s

    def with_dims(wm1, hm1):
        bad = bytearray(blob)
        bits = wm1 | (hm1 << 14)
        bad[21] = bits & 0xFF
        bad[22] = (bits >> 8) & 0xFF
        bad[23] = (bad[23] & 0xF0) | ((bits >> 16) & 0x0F)
        return bytes(bad)

    with pytest.raises(ValueError, match="overruns"):
        parse_webp_vp8l(with_dims(4, 9))


def test_compression_beats_literal_only():
    """LZ77 + subtract-green must do real work on the runs corpus: ~2.3
    bits/pixel (5.17 literal-only, 2.98 before the transform)."""
    total_bits = total_px = 0
    for doc in range(8):
        w, h = 48 + 16 * (doc % 2), 32
        r = _webp_pixels(doc, w, h)
        total_bits += 8 * len(encode_webp_vp8l(r, w, h))
        total_px += w * h
    assert total_bits / total_px < 3.0


def test_full_range_grayscale_noise_roundtrips():
    """ADVICE r9 (medium): a raster whose green histogram exceeds 256
    distinct symbols (256 literals + length codes = up to 280) used to hit
    'alphabet too large for the length cap' with ENC_MAX_LEN=8. The cap is
    now 9 (512-entry table, still on the flat-decode path), so full-range
    grayscale noise must encode and roundtrip losslessly."""
    import hashlib

    # deterministic full-range noise: every byte value 0..255 appears,
    # plus enough runs to engage a few length codes -> >256 green symbols
    w, h = 41, 57
    stream = b"".join(
        hashlib.md5(f"noise:{k}".encode()).digest() for k in range(256)
    )
    raster = bytearray(stream[: w * h])
    raster[0:256] = bytes(range(256))       # guarantee all 256 literals
    raster[300:340] = bytes([7]) * 40       # guarantee LZ77 length codes
    raster = bytes(raster)
    blob = encode_webp_vp8l(raster, w, h)
    dw, dh, dec = parse_webp_vp8l(blob)
    assert (dw, dh, dec) == (w, h, raster)


def test_clc_code_length_limited_to_three_bit_field():
    """ADVICE r9 (low): the code-length code's own lengths are serialized
    in a 3-bit field, so huffman_lengths must be called with cap=7 — a
    Fibonacci-skewed histogram takes plain Huffman to depth 8."""
    fib = [1, 1, 2, 3, 5, 8, 13, 21, 34, 55, 89, 144, 233]
    freqs = {s: f for s, f in enumerate(fib)}
    # the hazard: the default (ENC_MAX_LEN) cap admits depths > 7
    assert max(huffman_lengths(dict(freqs)).values()) > 7
    capped = huffman_lengths(dict(freqs), cap=7)
    assert max(capped.values()) <= 7
    # still a valid (Kraft-satisfying) prefix code
    from fractions import Fraction

    assert sum(Fraction(1, 1 << ln) for ln in capped.values()) <= 1
    # end-to-end: serialize a code whose *length histogram* is
    # Fibonacci-skewed (lengths 1..7 with Fibonacci multiplicities would
    # violate Kraft, so use the capped code itself spread over a wider
    # alphabet) and prove write_prefix_code no longer raises and every
    # symbol decodes through its own bits
    lengths = capped
    wtr = LsbWriter()
    write_prefix_code(wtr, lengths, 256)
    dec = read_prefix_code(LsbReader(wtr.flush()), 256)
    for sym, (code, nbits) in canonical_codes(lengths).items():
        w2 = LsbWriter()
        w2.put_code(code, nbits)
        w2.put(0, 8)
        assert dec.read(LsbReader(w2.flush())) == sym


# --- predictor transform battery (round 10) ---------------------------------


def test_predictor_roundtrip_and_mode_coverage():
    """RFC 9649 §4.4.1: per-8x8-block mode selection must provably
    exercise the mode space — a gradient is perfectly predicted by mode 12
    (ClampAddSubtractFull), md5 noise exercises ALL 14 modes, and the
    committed corpus picks >= 3 distinct modes — and every raster must
    roundtrip bit-exactly through the full container path."""
    import hashlib

    import numpy as np

    from oe_batch_processing_spark.operators.multimodal_webp import (
        choose_predictor_modes,
    )

    # non-wrapping gradient g = 3y + 2x (max 211): mode 12 predicts the
    # interior EXACTLY (L+T-TL = v); the unequal slopes break every other
    # mode's tie (TR = v iff the slopes are equal; avg(T,TR) = v-2 here)
    w, h = 48, 40
    g = np.add.outer(3 * np.arange(h), 2 * np.arange(w)).astype(np.uint8)
    modes, residual = choose_predictor_modes(g, w, h)
    assert set(int(m) for m in modes.flat) == {12}
    assert not residual[1:, 1:].any()  # interior perfectly predicted
    raster = g.tobytes()
    assert parse_webp_vp8l(encode_webp_vp8l(raster, w, h))[2] == raster

    # md5 noise: all 14 modes appear, still lossless
    stream = b"".join(
        hashlib.md5(f"n:{k}".encode()).digest() for k in range(300)
    )
    w, h = 41, 57
    noise = stream[: w * h]
    nm, _ = choose_predictor_modes(
        np.frombuffer(noise, dtype=np.uint8).reshape(h, w), w, h
    )
    assert set(int(m) for m in nm.flat) == set(range(14))
    assert parse_webp_vp8l(encode_webp_vp8l(noise, w, h))[2] == noise

    # the committed corpus: >= 3 distinct modes across a few documents
    # (doc 15 is the first to complete the set {0, 1, 8})
    corpus_modes: set[int] = set()
    for doc in range(20):
        w, h = 48 + 16 * (doc % 2), 32
        r = _webp_pixels(doc, w, h)
        m, _ = choose_predictor_modes(
            np.frombuffer(r, dtype=np.uint8).reshape(h, w), w, h
        )
        corpus_modes |= set(int(x) for x in m.flat)
    assert len(corpus_modes) >= 3, corpus_modes


def test_predictor_edge_rules_known_vectors():
    """The fixed edge rules (top-left -> black, top row -> L, left column
    -> T) and the exceptional rightmost-column TR addressing, checked via
    hand-computed reconstructions."""
    import numpy as np

    from oe_batch_processing_spark.operators.multimodal_webp import (
        choose_predictor_modes,
        inverse_predict,
    )

    # 3-wide image, mode image forced by construction: all blocks get the
    # same mode because the image fits one 8x8 block column pair
    g = np.array(
        [[10, 20, 30], [40, 50, 60], [70, 80, 90]], dtype=np.uint8
    )
    modes, residual = choose_predictor_modes(g, 3, 3)
    rec = inverse_predict(residual.tobytes(), 3, 3, modes)
    assert rec == g.tobytes()
    # top-left: predicted by 0 regardless of mode
    assert residual.flat[0] == 10
    # top row: L rule -> residual = diff
    assert residual[0, 1] == 10 and residual[0, 2] == 10
    # left column: T rule
    assert residual[1, 0] == 30 and residual[2, 0] == 30

    # rightmost-column TR = leftmost pixel of the SAME row: build a case
    # where mode 3 (TR) is chosen and verify reconstruction agrees
    from oe_batch_processing_spark.operators.multimodal_webp import (
        _pred_green,
    )

    assert _pred_green(3, 0, 0, 0, 123) == 123  # TR passthrough
    h, w = 9, 8  # one block wide: x=7 is the rightmost column
    base = np.zeros((h, w), dtype=np.uint8)
    base[:, 0] = np.arange(h, dtype=np.uint8) * 7  # varying left column
    modes = [[3]] * 2  # force TR mode for both block rows
    # residual zero everywhere: reconstruct and then re-derive residuals
    rec = inverse_predict(bytes(h * w), w, h, [[3], [3]])
    arr = np.frombuffer(rec, dtype=np.uint8).reshape(h, w)
    # with all-zero residuals the TR chain stays zero: proves the
    # exceptional addressing reads an already-decoded pixel (no crash,
    # deterministic zeros)
    assert not arr.any()


def test_predictor_clamp_half_truncation_toward_zero():
    """ClampAddSubtractHalf divides (ave - TL) by 2 with C truncation
    toward zero — floor division would disagree on negatives."""
    from oe_batch_processing_spark.operators.multimodal_webp import (
        _div2_trunc,
        _pred_green,
    )

    assert _div2_trunc(5) == 2 and _div2_trunc(-5) == -2  # not -3
    # ave = (10 + 20) >> 1 = 15; TL = 40 -> 15 + trunc(-25/2) = 15-12 = 3
    assert _pred_green(13, 10, 20, 40, 0) == 3
    # floor division would give 15 + (-13) = 2; mode 12 clamps
    assert _pred_green(12, 200, 200, 10, 0) == 255
    assert _pred_green(12, 10, 10, 200, 0) == 0


def test_predictor_without_subtract_green_rejected():
    """A hand-built stream signaling ONLY the predictor transform must be
    rejected by name (grayscale red/blue residuals would be non-zero)."""
    from oe_batch_processing_spark.operators.multimodal_webp import (
        SIGNATURE,
        _write_mode_subimage,
    )

    w = LsbWriter()
    w.put(7, 14)   # width 8
    w.put(7, 14)   # height 8
    w.put(0, 1)
    w.put(0, 3)
    w.put(1, 1)    # transform present
    w.put(0, 2)    # predictor
    w.put(1, 3)    # size_bits = 3
    _write_mode_subimage(w, [[0]])
    w.put(0, 1)    # end of transforms
    payload = bytes([SIGNATURE]) + w.flush()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    blob = b"RIFF" + struct.pack("<I", len(riff)) + riff
    with pytest.raises(ValueError, match="predictor without a base"):
        parse_webp_vp8l(blob)


def test_mode_subimage_validation():
    """The embedded mode image rejects out-of-range modes and
    backreferences by name."""
    from oe_batch_processing_spark.operators.multimodal_webp import (
        _read_mode_subimage,
    )

    w = LsbWriter()
    w.put(0, 1)  # no color cache
    write_prefix_code(w, {15: 1}, 280)   # green: constant symbol 15 (>13)
    write_prefix_code(w, {0: 1}, 256)
    write_prefix_code(w, {0: 1}, 256)
    write_prefix_code(w, {255: 1}, 256)
    write_prefix_code(w, {0: 1}, 40)
    w.put(0, 8)
    with pytest.raises(ValueError, match="invalid predictor mode 15"):
        _read_mode_subimage(LsbReader(w.flush()), 1, 1)

    w = LsbWriter()
    w.put(0, 1)
    write_prefix_code(w, {260: 1}, 280)  # green: a length code
    write_prefix_code(w, {0: 1}, 256)
    write_prefix_code(w, {0: 1}, 256)
    write_prefix_code(w, {255: 1}, 256)
    write_prefix_code(w, {0: 1}, 40)
    w.put(0, 8)
    with pytest.raises(ValueError, match="backreferences in the mode"):
        _read_mode_subimage(LsbReader(w.flush()), 1, 1)


# --- color-indexing (palette) transform battery (round 10) ------------------


def test_palette_roundtrips_every_bundling_width():
    """RFC 9649 §4.4.3: index bundling packs 8/4/2 indices per coded pixel
    below 3/5/17 colors. Every width class (and the unpacked >16 case,
    plus a full-range-noise 252-color palette) must roundtrip bit-exactly,
    including a width that is NOT a multiple of the packing factor (41)."""
    import hashlib

    stream = b"".join(
        hashlib.md5(f"p:{k}".encode()).digest() for k in range(200)
    )
    w, h = 41, 23
    cases = [
        bytes([7] * (w * h)),                      # 1 color
        bytes(b % 2 * 255 for b in stream[: w * h]),   # 2  -> 8 idx/pixel
        bytes(b % 3 * 17 for b in stream[: w * h]),    # 3  -> 4 idx/pixel
        bytes(b % 4 * 5 for b in stream[: w * h]),     # 4  -> 4 idx/pixel
        bytes(b % 15 for b in stream[: w * h]),        # 15 -> 2 idx/pixel
        bytes(b % 16 for b in stream[: w * h]),        # 16 -> 2 idx/pixel
        bytes(b % 17 for b in stream[: w * h]),        # 17 -> unpacked
        stream[: w * h],                               # ~252 colors
    ]
    for raster in cases:
        blob = encode_webp_vp8l(raster, w, h, use_palette=True)
        assert parse_webp_vp8l(blob) == (w, h, raster)


def test_palette_beats_predictor_on_low_cardinality():
    """The point of the transform: on a 2-color raster the bundled index
    plane must code substantially smaller than the predictor pipeline."""
    import hashlib

    stream = b"".join(
        hashlib.md5(f"p:{k}".encode()).digest() for k in range(200)
    )
    w, h = 41, 23
    raster = bytes(b % 2 * 255 for b in stream[: w * h])
    pal = encode_webp_vp8l(raster, w, h, use_palette=True)
    pred = encode_webp_vp8l(raster, w, h)
    assert len(pal) < 0.7 * len(pred)
    assert parse_webp_vp8l(pal)[2] == parse_webp_vp8l(pred)[2] == raster


def test_palette_width_bits_spec_table():
    from oe_batch_processing_spark.operators.multimodal_webp import (
        palette_width_bits,
    )

    assert [palette_width_bits(n) for n in (1, 2, 3, 4, 5, 16, 17, 256)] == [
        3, 3, 2, 2, 1, 1, 0, 0,
    ]


def test_palette_validation_battery():
    """Out-of-range indices, non-zero padding bits, and the
    palette-combined-with-other-transforms case reject by name."""
    from oe_batch_processing_spark.operators.multimodal_webp import (
        SIGNATURE,
        _unpack_palette_indices,
        _write_argb_subimage,
    )

    # unpack-level: index beyond palette size
    with pytest.raises(ValueError, match="out of range"):
        _unpack_palette_indices(bytes([0x02]), 2, 1, [10, 20], 1)
    # unpack-level: non-zero padding bits in the row's last packed byte
    with pytest.raises(ValueError, match="padding bits"):
        # w=1 at wbits=1 -> only the low nibble is real
        _unpack_palette_indices(bytes([0x10]), 1, 1, [10, 20], 1)

    # stream-level: palette + subtract-green must be rejected by name
    w = LsbWriter()
    w.put(7, 14)
    w.put(0, 14)  # 8x1 image
    w.put(0, 1)
    w.put(0, 3)
    w.put(1, 1)
    w.put(2, 2)   # subtract-green
    w.put(1, 1)
    w.put(3, 2)   # color indexing
    w.put(1, 8)   # two colors
    _write_argb_subimage(w, [(255, 0, 0, 0), (0, 9, 9, 9)])
    w.put(0, 1)
    payload = bytes([SIGNATURE]) + w.flush()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    blob = b"RIFF" + struct.pack("<I", len(riff)) + riff
    with pytest.raises(ValueError, match="combined with other transforms"):
        parse_webp_vp8l(blob)


def test_palette_entries_validated():
    """Non-opaque or non-grayscale palette entries reject by name (the
    difference coding must reconstruct exact ARGB entries first)."""
    from oe_batch_processing_spark.operators.multimodal_webp import (
        SIGNATURE,
        _write_argb_subimage,
    )

    def stream_with_palette(diffs):
        w = LsbWriter()
        w.put(7, 14)
        w.put(0, 14)
        w.put(0, 1)
        w.put(0, 3)
        w.put(1, 1)
        w.put(3, 2)
        w.put(len(diffs) - 1, 8)
        _write_argb_subimage(w, diffs)
        w.put(0, 1)
        payload = bytes([SIGNATURE]) + w.flush()
        chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
        if len(payload) % 2:
            chunk += b"\x00"
        riff = b"WEBP" + chunk
        return b"RIFF" + struct.pack("<I", len(riff)) + riff

    # alpha 254 after cumulation
    with pytest.raises(ValueError, match="non-opaque palette"):
        parse_webp_vp8l(stream_with_palette([(254, 5, 5, 5)]))
    # r != g
    with pytest.raises(ValueError, match="non-grayscale palette"):
        parse_webp_vp8l(stream_with_palette([(255, 6, 5, 5)]))


# --- color cache battery (round 10) ------------------------------------------


def test_color_cache_roundtrips_all_sizes_and_pipelines():
    """RFC 9649 §4.5: the color cache must roundtrip at every bits size
    1..11 boundary and compose with each transform pipeline (SG-only,
    SG+predictor, palette). The encoder's greedy cache pass and the
    decoder's insertion discipline must mirror exactly (re-encode
    bit-exactness proves it)."""
    import hashlib

    stream = b"".join(
        hashlib.md5(f"cc:{k}".encode()).digest() for k in range(300)
    )
    w, h = 41, 57
    cases = [
        (_webp_pixels(2, 48, 32), 48, 32, {}),
        (stream[: w * h], w, h, {}),
        (stream[: w * h], w, h, {"use_predictor": False}),
        (bytes(b % 4 * 5 for b in stream[: w * h]), w, h,
         {"use_palette": True}),
    ]
    for bits in (1, 4, 11):
        for raster, w_, h_, kw in cases:
            blob = encode_webp_vp8l(raster, w_, h_, cache_bits=bits, **kw)
            assert parse_webp_vp8l(blob) == (w_, h_, raster)
            assert (
                encode_webp_vp8l(raster, w_, h_, cache_bits=bits, **kw)
                == blob
            )


def test_color_cache_hits_actually_occur():
    """Guard against a vacuously-green cache path: replicate the encoder's
    greedy eligibility pass over a literal-heavy raster and demand real
    cache hits, then roundtrip the same raster with the cache enabled —
    so the decoder provably consumed >=280 green symbols."""
    import hashlib

    from oe_batch_processing_spark.operators.multimodal_webp import (
        cache_slot,
        lz77_parse,
    )

    stream = b"".join(
        hashlib.md5(f"hit:{k}".encode()).digest() for k in range(300)
    )
    w, h = 41, 57
    raster = bytes(b % 11 * 23 for b in stream[: w * h])  # repeats, few runs
    bits = 4
    cache = [0] * (1 << bits)
    hits = 0
    pos = 0
    for kind, a, b_ in lz77_parse(raster):
        if kind == 0:
            argb = (255 << 24) | (a << 8)  # SG-only coded domain
            slot = cache_slot(argb, bits)
            if cache[slot] == argb:
                hits += 1
            else:
                cache[slot] = argb
            pos += 1
        else:
            for k in range(a):
                argb = (255 << 24) | (raster[pos - b_ + k] << 8)
                cache[cache_slot(argb, bits)] = argb
            pos += a
    assert hits > 100, hits
    blob = encode_webp_vp8l(raster, w, h, use_predictor=False, cache_bits=bits)
    assert parse_webp_vp8l(blob) == (w, h, raster)


def test_color_cache_bits_range_validated():
    r = bytes(range(80))
    with pytest.raises(ValueError, match="1..11"):
        encode_webp_vp8l(r, 10, 8, cache_bits=0)
    with pytest.raises(ValueError, match="1..11"):
        encode_webp_vp8l(r, 10, 8, cache_bits=12)


def test_color_cache_full_range_alphabet_over_512_roundtrips():
    """Regression (round-11 ADVICE): with the cache on, the green alphabet
    gains up to 2^cache_bits hit symbols, so a full-range raster can emit
    >512 distinct green symbols — under the cacheless 2^9 cap
    huffman_lengths raised 'alphabet too large' at encode time. The cap is
    now 10 bits for cache-enabled encodes (flat-table decode still holds);
    this raster measurably exceeds 512 distinct symbols and must
    roundtrip."""
    import hashlib

    from oe_batch_processing_spark.operators.multimodal_webp import (
        cache_slot,
        lz77_parse,
        prefix_encode_value,
    )

    stream = b"".join(
        hashlib.md5(f"fr:{k}".encode()).digest() for k in range(600)
    )
    w, h = 96, 96
    raster = (bytes(range(256)) + stream)[: w * h]
    bits = 11
    # replicate the encoder's greedy cache pass to prove the alphabet is
    # genuinely past the old 2^9 cap (not a vacuous roundtrip)
    cache = [0] * (1 << bits)
    syms: set[int] = set()
    pos = 0
    for kind, a, b_ in lz77_parse(raster):
        if kind == 0:
            argb = (255 << 24) | (a << 8)  # SG-only coded domain
            slot = cache_slot(argb, bits)
            if cache[slot] == argb:
                syms.add(280 + slot)
            else:
                syms.add(a)
                cache[slot] = argb
            pos += 1
        else:
            lcode, _, _ = prefix_encode_value(a)
            syms.add(256 + lcode)
            for k in range(a):
                argb = (255 << 24) | (raster[pos - b_ + k] << 8)
                cache[cache_slot(argb, bits)] = argb
            pos += a
    assert len(syms) > 512, len(syms)
    blob = encode_webp_vp8l(raster, w, h, use_predictor=False, cache_bits=bits)
    assert parse_webp_vp8l(blob) == (w, h, raster)


# --- color (cross-color) transform battery (round 11) ------------------------


def test_color_transform_is_the_default_base_and_roundtrips():
    """Round 11: the color transform replaces subtract-green in the default
    grayscale encode path. The data-driven per-block choice lands on the
    (32, 32, 0) subtract-green identity, the decoder reconstructs r and b
    from g through the real §4.3 inverse, and the SG path stays available
    (and produces a different stream) behind use_color_transform=False."""
    for doc in (1, 2, 9):
        w, h = 48 + 16 * (doc % 2), 32
        r = _webp_pixels(doc, w, h)
        blob = encode_webp_vp8l(r, w, h)
        assert parse_webp_vp8l(blob) == (w, h, r)
        assert encode_webp_vp8l(r, w, h) == blob
        sg = encode_webp_vp8l(r, w, h, use_color_transform=False)
        assert sg != blob
        assert parse_webp_vp8l(sg) == (w, h, r)


def test_color_transform_rgb_roundtrip_and_cross_channel_choice():
    """The RGB entry: r ~ g + sparse noise, b ~ r + sparse noise — every
    block must choose nonzero g2r and most must choose nonzero r2b (the
    cross-channel deltas an R=G=B corpus can never exercise); decode is
    bit-exact and re-encode reproduces the file."""
    import numpy as np

    from oe_batch_processing_spark.operators.multimodal_webp import (
        _webp_color_pixels,
        choose_color_deltas,
        encode_webp_vp8l_rgb,
        parse_webp_vp8l_rgb,
    )

    for doc in (1, 4):
        w, h = 32 + 16 * (doc % 2), 24
        rgb = _webp_color_pixels(doc, w, h)
        blob = encode_webp_vp8l_rgb(rgb, w, h)
        assert parse_webp_vp8l_rgb(blob) == (w, h, rgb)
        assert encode_webp_vp8l_rgb(rgb, w, h) == blob
        arr = np.frombuffer(rgb, np.uint8).reshape(h, w, 3)
        grid, r_res, b_res = choose_color_deltas(
            arr[:, :, 0], arr[:, :, 1], arr[:, :, 2], w, h
        )
        flat = [p for row in grid for p in row]
        assert all(p[0] != 0 for p in flat)          # g2r everywhere
        assert sum(1 for p in flat if p[2] != 0) > len(flat) // 2  # r2b
        # the transform genuinely decorrelates: residuals are sparse
        assert np.count_nonzero(r_res) < r_res.size // 8
        assert np.count_nonzero(b_res) < b_res.size // 8
        assert 8 * len(blob) < 7 * w * h  # vs 24 bpp raw


def test_color_transform_delta_math_matches_spec_reference():
    """ColorTransformDelta is (int8 * int8) >> 5 with an ARITHMETIC shift:
    pin the signed corners against hand-computed values."""
    from oe_batch_processing_spark.operators.multimodal_webp import (
        color_transform_delta,
    )

    assert color_transform_delta(32, 100) == 100        # the SG identity
    assert color_transform_delta(32, 200) == -56        # int8(200) = -56
    assert (200 + color_transform_delta(32, 200)) & 255 == 144
    assert color_transform_delta(16, 100) == 50
    assert color_transform_delta(16, 101) == 50         # floor
    assert color_transform_delta(240, 100) == -50       # int8(240) = -16
    assert color_transform_delta(16, 200) == -28        # -56/2 floors to -28
    assert color_transform_delta(0, 255) == 0


def test_color_transform_nongrayscale_reconstruction_rejected():
    """The grayscale decoder must reject CC streams that are legal VP8L
    but leave the grayscale subset: (a) nonzero coded residuals (an RGB
    stream), and (b) residual-zero streams whose deltas do NOT reconstruct
    r = g = b — the wrong-delta case, proving the per-block delta choice
    is load-bearing in decode."""
    import numpy as np

    from oe_batch_processing_spark.operators.multimodal_webp import (
        color_transform_delta,
        encode_webp_vp8l_rgb,
    )

    # (a) genuinely colored stream -> nonzero residuals
    w, h = 32, 24
    g = bytes((3 * j) % 37 for j in range(w * h))
    rgb = b"".join(
        bytes((((gv + 5) & 255), gv, gv)) for gv in g
    )
    blob = encode_webp_vp8l_rgb(rgb, w, h)
    with pytest.raises(ValueError, match="residual under the color"):
        parse_webp_vp8l(blob)

    # (b) r = delta(16, g) exactly: residual-zero under g2r=16, but the
    # reconstruction is NOT grayscale wherever delta(16, g) != g
    g = bytes((7 * j) % 33 + 1 for j in range(w * h))
    rgb = b"".join(
        bytes((
            color_transform_delta(16, gv) & 255,
            gv,
            color_transform_delta(16, gv) & 255,
        ))
        for gv in g
    )
    assert any((color_transform_delta(16, gv) & 255) != gv for gv in g)
    blob = encode_webp_vp8l_rgb(rgb, w, h)
    # confirm the encoder found the residual-zero (but non-gray) deltas
    arr = np.frombuffer(rgb, np.uint8).reshape(h, w, 3)
    from oe_batch_processing_spark.operators.multimodal_webp import (
        choose_color_deltas,
    )
    _, r_res, b_res = choose_color_deltas(
        arr[:, :, 0], arr[:, :, 1], arr[:, :, 2], w, h
    )
    assert not r_res.any() and not b_res.any()
    with pytest.raises(ValueError, match="reconstruct a grayscale"):
        parse_webp_vp8l(blob)


def test_color_transform_combination_rules_rejected():
    """Crafted streams for the by-name composition rules: CC+SG and
    CC-twice are rejected AFTER the signaling loop parses both payloads,
    and the RGB decoder rejects non-CC streams."""
    from oe_batch_processing_spark.operators.multimodal_webp import (
        COLOR_BLOCK_BITS,
        LsbWriter,
        SIGNATURE,
        _riff_container,
        _write_color_subimage,
        encode_webp_vp8l,
        parse_webp_vp8l_rgb,
    )

    def crafted(first_sg: bool) -> bytes:
        w_, h_ = 16, 8
        w = LsbWriter()
        w.put(w_ - 1, 14)
        w.put(h_ - 1, 14)
        w.put(0, 1)
        w.put(0, 3)
        if first_sg:
            w.put(1, 1)
            w.put(2, 2)  # subtract-green
        grid = [[(32, 32, 0)] * 2]  # 16x8 at 8x8 blocks -> 2x1 grid
        for _ in range(1 if first_sg else 2):
            w.put(1, 1)
            w.put(1, 2)  # color transform
            w.put(COLOR_BLOCK_BITS - 2, 3)
            _write_color_subimage(w, grid)
        w.put(0, 1)  # end of transforms
        return _riff_container(bytes([SIGNATURE]) + w.flush())

    with pytest.raises(ValueError, match="combined with subtract-green"):
        parse_webp_vp8l(crafted(first_sg=True))
    with pytest.raises(ValueError, match="color transform signaled twice"):
        parse_webp_vp8l(crafted(first_sg=False))

    # the RGB decoder accepts exactly one color transform and nothing else
    gray = encode_webp_vp8l(
        _webp_pixels(2, 48, 32), 48, 32,
        use_predictor=False, use_color_transform=False,
    )
    with pytest.raises(ValueError, match="exactly one color transform"):
        parse_webp_vp8l_rgb(gray)
