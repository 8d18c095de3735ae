"""ANN consistency: the LSH-bucketed near-dup scale path must agree
with the exact anchor-subset twin on their overlap, and LSH/IVF top-k
must be subsets-with-equal-cosines of the brute-force ranking."""

from __future__ import annotations

from spatialjoin.ann import (
    q_ann_lsh,
    q_ann_topk,
    q_embedding_near_dup,
    q_embedding_near_dup_lsh,
)

SF = "/root/testdata/sf0.001"


def test_near_dup_lsh_agrees_with_exact_twin_on_overlap(spark):
    exact = {
        (r.a, r.b): r.cosine for r in q_embedding_near_dup(spark, SF).collect()
    }
    lsh = {(r.a, r.b): r.cosine for r in q_embedding_near_dup_lsh(spark, SF).collect()}
    assert lsh, "expected bucketed near-dup pairs"
    # every LSH pair whose anchor is in the exact twin's anchor subset
    # must appear there with a bit-identical cosine
    overlap = {k: v for k, v in lsh.items() if k[0] % 20 == 0}
    assert overlap, "expected overlap with the exact twin's anchors"
    for k, v in overlap.items():
        assert k in exact and exact[k] == v, k


def test_ann_lsh_cosines_match_bruteforce(spark):
    truth = {
        (r.query_id, r.neighbor_id): r.cosine for r in q_ann_topk(spark, SF).collect()
    }
    approx = q_ann_lsh(spark, SF).collect()
    assert approx
    hits = 0
    for r in approx:
        key = (r.query_id, r.neighbor_id)
        if key in truth:
            assert truth[key] == r.cosine, key
            hits += 1
    assert hits > 0, "LSH should recover at least some true neighbors"
