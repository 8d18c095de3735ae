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
