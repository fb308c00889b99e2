"""Equivalence tests for the r16 rep-level cluster-summary rewrite.

``rep_cluster_summaries`` claims: CC over the rep pair graph + one
membership expansion is frame-identical to ``cluster_summaries`` over the
fully expanded member-level pair relation, and the size-adaptive driver
union-find kernel labels exactly like the distributed LPA loop. Both are
exercised on crafted graphs covering the corners the proof leans on:
isolated within-only cliques, cross-linked groups, gate-failing groups,
singleton groups, and chains that merge under transitivity.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oe_batch_processing_spark.operators.dedup import (
    _cc_labels_adaptive,
    cc_labels,
    cluster_summaries,
    content_rep_groups,
    expand_rep_pairs,
    rep_cluster_summaries,
    trigram_clique_reps,
)


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_driver_union_find_matches_lpa(spark):
    # chain 1-2-3-4, clique 10-11-12, isolated edge 20-21, plus a merge
    # of two components through a late edge (7-1, 7-4)
    pairs = spark.createDataFrame(
        [
            (1, 2), (2, 3), (3, 4),
            (10, 11), (11, 12), (10, 12),
            (20, 21),
            (7, 4), (7, 1),
        ],
        "doc_a long, doc_b long",
    )
    got = _sorted_rows(_cc_labels_adaptive(pairs))
    want = _sorted_rows(cc_labels(pairs))
    assert got == want
    # min-label contract: every label is the component minimum
    assert (1, 1) in got and (7, 1) in got and (12, 10) in got


def test_rep_cluster_summaries_matches_expanded(spark):
    # Crafted corpus: group A = replicas of a long text, cross-linked to
    # group B (single member) via a rep pair; group C = isolated replica
    # pair (within-only clique); group D = replicas of a 2-word text
    # (fails the trigram gate -> must NOT appear); group E = singleton
    # (no pairs -> must not appear).
    long_a = "alpha beta gamma delta epsilon zeta"
    long_b = "alpha beta gamma delta epsilon eta"
    iso_c = "one two three four five six seven"
    short_d = "tiny text"
    docs = spark.createDataFrame(
        [
            (1, long_a), (4, long_a), (9, long_a),
            (2, long_b),
            (5, iso_c), (6, iso_c),
            (7, short_d), (8, short_d),
            (3, "unique singleton content here okay"),
        ],
        "doc_id long, text string",
    )
    groups = content_rep_groups(docs)
    rep_pairs = spark.createDataFrame(
        [(1, 2, 0.9)], "rep_a long, rep_b long, jaccard double"
    )
    clique_reps = trigram_clique_reps(groups)

    expanded = expand_rep_pairs(groups, rep_pairs, "jaccard", F.lit(1.0))
    want = _sorted_rows(cluster_summaries(expanded.select("doc_a", "doc_b")))
    got = _sorted_rows(rep_cluster_summaries(groups, rep_pairs, clique_reps))
    assert got == want
    # shape spot-checks: component {1,4,9,2} labeled 1 with 4 members;
    # isolated clique {5,6} labeled 5; nothing for D (gate) or E (singleton)
    reps = {r[0]: r[1] for r in got}
    assert reps == {1: 4, 5: 2}


def test_rep_cluster_summaries_empty_pairs(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e"), (3, "x")],
        "doc_id long, text string",
    )
    groups = content_rep_groups(docs)
    rep_pairs = spark.createDataFrame(
        [], "rep_a long, rep_b long, jaccard double"
    )
    got = _sorted_rows(
        rep_cluster_summaries(groups, rep_pairs, trigram_clique_reps(groups))
    )
    assert got == [(1, 2, "1,2")]
