"""Local replica of the driver's correctness gate: run every queries()
entry at sf0.001 and compare row-count + sorted values against its
oracle_sql() via DuckDB."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _norm(rows):
    out = []
    for r in rows:
        out.append(tuple(float(v) if isinstance(v, float) else v for v in r))
    return sorted(out)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"big_id", "small_id"}


def test_strategy_queries_engage_their_paths(spark):
    """The cogroup query's plan must contain FlatMapCoGroupsInArrow,
    the hot query's index must actually have hot cells, and the donut
    table must really carry two rings — otherwise these oracle rows
    would silently test the broadcast-pairs path again."""
    from spatialjoin.index import SpatialIndex
    from spatialjoin.queries import (
        _donuts_df,
        _skewed_rects_df,
        q_rects_intersect_cogroup,
    )

    plan = q_rects_intersect_cogroup(spark, SF_DIR)._jdf.queryExecution().toString()
    assert "FlatMapCoGroupsInArrow" in plan

    small = _skewed_rects_df(spark, SF_DIR, "part", "p_partkey")
    idx = SpatialIndex.build(spark, small, validate=False, resolution=6,
                             hot_threshold=64, split_steps=2)
    assert idx.hot_cells is not None and idx.hot_cells.count() >= 1
    idx.unpersist()

    d = _donuts_df(spark, SF_DIR, "supplier", "s_suppkey").first()
    assert list(d.rings) == [0, 5] and len(d.coords) == 20

    # the shuffle row must run with NO broadcast geometry and NO Python
    # operator (Catalyst may still pick a broadcast HASH join for the
    # tiny cell equi-join at this scale — that's its call, not ours)
    from spatialjoin.queries import _mixed_lines_df, _rects_df

    small = _rects_df(spark, SF_DIR, "part", "p_partkey")
    idx = SpatialIndex.build(spark, small, validate=False, broadcast=False)
    assert idx.small_geo_bc is None and not idx.broadcast_small
    big = _rects_df(spark, SF_DIR, "part", "p_partkey")
    plan = idx.spatial_join(big, validate=False, big_kinds={4}) \
        ._jdf.queryExecution().toString()
    for op in ("MapInPandas", "MapInArrow", "FlatMapCoGroupsInPandas",
               "FlatMapCoGroupsInArrow", "BatchEvalPython"):
        assert op not in plan, op
    idx.unpersist()

    # the mixed-prox row's index must really be multilevel (>= 2
    # populated size strata) or it would just re-test one resolution
    lines = _mixed_lines_df(spark, SF_DIR)
    idx = SpatialIndex.build(spark, lines, max_distance=0.25, validate=False,
                             multilevel=True, resolution=6)
    assert idx.levels is not None and len(idx.levels) >= 2, idx.levels
    idx.unpersist()


def _supplier_quad_ids(spark):
    from spatialjoin.queries import _quads_df

    return {r.id for r in _quads_df(spark, SF_DIR, "supplier", "s_suppkey")
            .select("id").collect()}


def test_tri_quad_swallowed_pairs(spark):
    """The tri x quad hole-rule row must actually SWALLOW pairs: folded
    keys guarantee concentric quarter-scale triangles strictly inside
    their supplier's quad, and the reference composite (tri-edge
    crossings OR quad-vertex-in-tri, NO tri-vertex-in-quad term)
    must exclude every one of them."""
    from spatialjoin.queries import _quarter_tris_df, q_tris_intersect_quads

    sup_ids = _supplier_quad_ids(spark)
    tri_ids = {r.id for r in _quarter_tris_df(spark, SF_DIR).select("id").collect()}
    swallowed = {(c, c % 97) for c in tri_ids if (c % 97) in sup_ids}
    assert len(swallowed) >= 1, "no folded-key collision at this sf"
    got = {(r.big_id, r.small_id)
           for r in q_tris_intersect_quads(spark, SF_DIR).collect()}
    assert not (swallowed & got), sorted(swallowed & got)[:5]


def test_linestring_contains_line_per_segment(spark):
    """The LINESTRING.Contains(LINE) row must observe the per-segment
    deviation: every even probe (half of segment 1) IS contained by
    its own path, every odd probe (spanning the shared vertex of two
    COLLINEAR segments) is NOT — geo 0.14's multi-segment rule would
    have accepted it."""
    from spatialjoin.queries import q_paths_contain_lines

    got_cl = {(r.big_id, r.small_id)
              for r in q_paths_contain_lines(spark, SF_DIR).collect()}
    keys = [k for (k,) in duckdb.connect().execute(
        f"SELECT o_orderkey FROM '{SF_DIR}/orders.parquet' WHERE o_orderkey % 32 = 0"
    ).fetchall()]
    assert keys, "no lattice probe keys at this sf"
    for k in keys:
        assert (2 * k, k) in got_cl, f"half-segment probe {2*k} not contained"
        assert (2 * k + 1, k) not in got_cl, f"spanning probe {2*k+1} wrongly contained"


def test_donut_contains_path_hole_rule(spark):
    """The donut-contains-path row must observe BOTH arms of the
    hole-aware rule on every folded-key collision: hugging paths
    (even ids) contained, diameter-chord paths (odd ids — vertices
    all strictly in the annulus, segment through the hole) rejected."""
    from spatialjoin.queries import q_donuts_contain_paths

    sup_ids = _supplier_quad_ids(spark)
    got_dp = {(r.big_id, r.small_id)
              for r in q_donuts_contain_paths(spark, SF_DIR).collect()}
    part_keys = [k for (k,) in duckdb.connect().execute(
        f"SELECT p_partkey FROM '{SF_DIR}/part.parquet'").fetchall()]
    coll = [k for k in part_keys if (k % 97) in sup_ids]
    assert coll, "no folded-key collision at this sf"
    for k in coll:
        assert (2 * k, k % 97) in got_dp, f"hugging path {2*k} not contained"
        assert (2 * k + 1, k % 97) not in got_dp, f"chord path {2*k+1} wrongly contained"


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_matches_oracle(spark, ddb, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    sdf = q(spark, SF_DIR)
    got_cols = sdf.columns
    got = [tuple(r) for r in sdf.collect()]
    if sql is None:
        assert len(got) >= 0
        return
    ora = ddb.execute(sql)
    ora_cols = [d[0] for d in ora.description]
    assert sorted(got_cols) == sorted(ora_cols), (got_cols, ora_cols)
    want = ora.fetchall()
    # align column order to spark's
    perm = [ora_cols.index(c) for c in got_cols]
    want = [tuple(r[i] for i in perm) for r in want]
    assert len(got) == len(want), f"{name}: {len(got)} vs oracle {len(want)}"
    g, w = _norm(got), _norm(want)
    for a, b in zip(g, w):
        for x, y in zip(a, b):
            if isinstance(x, float):
                assert x == y or math.isclose(x, y, rel_tol=0, abs_tol=0), (name, a, b)
            else:
                assert x == y, (name, a, b)
