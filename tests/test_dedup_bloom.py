"""Non-vacuous evidence for the Bloom prefilter (round-6 verdict item):
drive ``bloom_prefilter`` with a crafted corpus that exercises BOTH output
branches — a true duplicate (bloom hit that survives exact verify) and an
engineered mod-m collision (bloom hit whose fingerprint is NOT in history,
i.e. a false positive) — plus a guaranteed non-candidate.

The collision is found by brute force over candidate strings using the same
md5 16-bit-slice-mod-m arithmetic the operator uses; md5 is deterministic,
so the search result is stable across runs and the test never flakes.
"""

from __future__ import annotations

import hashlib

from oe_batch_processing_spark.operators.dedup import (
    _BLOOM_K,
    _BLOOM_M,
    bloom_prefilter,
)


def _positions(text: str) -> list[tuple[int, int]]:
    fp = hashlib.md5(text.encode()).hexdigest()
    return [
        (j, int(fp[j * 4 : j * 4 + 4], 16) % _BLOOM_M) for j in range(_BLOOM_K)
    ]


def _find_false_positive(history: list[str]) -> str:
    """A string whose k positions all collide with history bits but whose
    md5 is not a history fingerprint."""
    bits: set[tuple[int, int]] = set()
    for t in history:
        bits.update(_positions(t))
    hist_fps = {hashlib.md5(t.encode()).hexdigest() for t in history}
    i = 0
    while True:
        cand = f"collision-probe-{i}"
        fp = hashlib.md5(cand.encode()).hexdigest()
        if fp not in hist_fps and all(p in bits for p in _positions(cand)):
            return cand
        i += 1
        assert i < 5_000_000, "no collision found — filter arithmetic drifted?"


def _find_non_candidate(history: list[str]) -> str:
    bits: set[tuple[int, int]] = set()
    for t in history:
        bits.update(_positions(t))
    i = 0
    while True:
        cand = f"clean-probe-{i}"
        if not any(p in bits for p in _positions(cand)):
            return cand
        i += 1
        assert i < 5_000_000


def test_bloom_prefilter_true_dup_false_positive_and_miss(spark):
    # ~60 history docs fill ~17% of each 1024-bit slice: dense enough that a
    # 3-way collision exists within a few thousand tries ((0.17)^-3 ≈ 200),
    # sparse enough that a zero-hit string exists within a handful.
    history = [f"history-document-{i}" for i in range(60)]
    fp_text = _find_false_positive(history)
    clean_text = _find_non_candidate(history)

    rows = [(2 * i, t) for i, t in enumerate(history)]  # even = history
    rows += [
        (1001, history[7]),  # odd = incoming; exact dup of a history doc
        (1003, fp_text),  # bloom candidate, NOT a real dup
        (1005, clean_text),  # not even a bloom candidate
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    out = {r["doc_id"]: r["true_dup"] for r in bloom_prefilter(docs).collect()}
    assert out[1001] is True, "true duplicate must survive exact verify"
    assert out[1003] is False, "engineered collision must surface as FP"
    assert 1005 not in out, "zero-hit doc must be pruned by the filter"
