"""Equivalence tests for the r17 size-gated BPE driver merge kernel.

``_bpe_train_vocab`` claims: below ``_BPE_DRIVER_MAX_VOCAB`` the K merge
rounds run driver-side from one bounded collect and produce EXACTLY the
distributed loop's merge table and final vocab. The proof leans on three
identities, each pinned here:

1. ``_merge_seq_py`` (greedy left-to-right scan) == ``_merge_expr`` (the
   positionwise filter/map HOF) for every sequence when a != b — checked
   by a randomized A/B over low-alphabet sequences (where adjacencies and
   near-overlaps are dense) against a literal Python mirror of the HOF.
2. The driver argmax (min over (-cnt, a, b) tuples; Python str comparison
   is code-point order == Spark's UTF8 binary orderBy) picks the same
   merge as the distributed ``orderBy(cnt DESC, a, b).limit(1)``.
3. End-to-end: forcing the distributed path (gate monkeypatched to -1) on
   the committed corpus yields the identical (merges, vocab) pair as the
   driver path.
"""

from __future__ import annotations

import random

from oe_batch_processing_spark.operators import langmodel as lm


def _merge_hof_mirror(s: list[str], a: str, b: str) -> list[str]:
    """Literal Python transcription of ``_merge_expr``'s filter+transform
    (1-based positions, as the SQL HOF runs them)."""
    n = len(s)
    kept = [
        i
        for i in range(1, n + 1)
        if not (i > 1 and s[i - 2] == a and s[i - 1] == b)
    ]
    return [
        (a + b) if (i < n and s[i - 1] == a and s[i] == b) else s[i - 1]
        for i in kept
    ]


def test_merge_seq_py_matches_hof_semantics():
    rng = random.Random(20260818)
    alphabet = ["a", "b", "c", "ab", "</w>"]
    for _ in range(2000):
        s = [rng.choice(alphabet) for _ in range(rng.randint(0, 12))]
        a, b = rng.sample(["a", "b", "c", "ab"], 2)  # a != b guaranteed
        assert lm._merge_seq_py(s, a, b) == _merge_hof_mirror(s, a, b), (
            s, a, b,
        )


def test_driver_kernel_matches_distributed(spark, monkeypatch, sf_dir):
    drv_merges, drv_vocab = lm._bpe_train_vocab(spark, sf_dir)
    drv_rows = sorted(
        (r["word"], r["freq"], tuple(r["s"])) for r in drv_vocab.collect()
    )
    drv_vocab.unpersist()
    monkeypatch.setattr(lm, "_BPE_DRIVER_MAX_VOCAB", -1)
    dist_merges, dist_vocab = lm._bpe_train_vocab(spark, sf_dir)
    dist_rows = sorted(
        (r["word"], r["freq"], tuple(r["s"])) for r in dist_vocab.collect()
    )
    dist_vocab.unpersist()
    assert drv_merges == dist_merges
    assert drv_rows == dist_rows
    assert len(drv_merges) >= 1  # the corpus actually trains merges


def test_driver_argmax_tie_break():
    # Two pairs with equal weighted count: the (a, b) lexicographic
    # tie-break must pick ('x', 'y') over ('y', 'z') — and counts must
    # weight by freq, not occurrences.
    rows = [
        ("w1", 3, ["x", "y"]),
        ("w2", 3, ["y", "z"]),
        ("w3", 2, ["q", "r", "q", "r"]),  # 2 occurrences x freq 2 = 4
    ]
    merges, _ = lm._bpe_driver_merges(rows, 1)
    assert merges == [(1, "q", "r", "qr", 4)]
    rows2 = [("w1", 3, ["x", "y"]), ("w2", 3, ["y", "z"])]
    merges2, _ = lm._bpe_driver_merges(rows2, 1)
    assert merges2 == [(1, "x", "y", "xy", 3)]
