"""Snap join: closed-form distance arms, blocking completeness fuzz,
eps-boundary exactness, hygiene, and the DuckDB twin."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from core_spark.operators.snap import snap_join, sql_snap_join


def _run(spark, pts, segs, eps, cell=4.0):
    p = spark.createDataFrame(pts, "pt_id long, x long, y long")
    s = spark.createDataFrame(
        segs, "seg_id long, x1 long, y1 long, x2 long, y2 long")
    return sorted((r["pt"], r["seg"])
                  for r in snap_join(p, s, eps, cell).collect())


def _dist2_leq(px, py, x1, y1, x2, y2, eps):
    """Python model: segment-clamped squared distance vs eps^2, exact."""
    abx, aby = x2 - x1, y2 - y1
    apx, apy = px - x1, py - y1
    tn = apx * abx + apy * aby
    td = abx * abx + aby * aby
    if td == 0 or tn <= 0:
        return apx * apx + apy * apy <= eps * eps
    if tn >= td:
        bpx, bpy = px - x2, py - y2
        return bpx * bpx + bpy * bpy <= eps * eps
    return (apx * apx + apy * apy) * td - tn * tn <= eps * eps * td


def test_three_distance_arms(spark):
    seg = [(0, 0, 0, 10, 0)]  # horizontal segment y=0, x in [0,10]
    pts = [
        (0, 5, 3),    # perpendicular, dist 3    -> in at eps=3
        (1, 5, 4),    # perpendicular, dist 4    -> out at eps=3
        (2, -3, 0),   # before A, dist 3         -> in
        (3, -4, 0),   # before A, dist 4         -> out
        (4, 12, 2),   # beyond B, dist sqrt(8)   -> in (8 <= 9)
        (5, 13, 3),   # beyond B, dist sqrt(18)  -> out
        (6, 7, 0),    # on the segment           -> in even at eps=0
    ]
    assert _run(spark, pts, seg, eps=3) == [(0, 0), (2, 0), (4, 0), (6, 0)]
    assert _run(spark, pts, seg, eps=0) == [(6, 0)]


def test_degenerate_point_segment(spark):
    segs = [(1, 5, 5, 5, 5)]
    pts = [(0, 5, 8), (1, 5, 9)]
    assert _run(spark, pts, segs, eps=3) == [(0, 1)]


def test_eps_boundary_is_closed_and_exact(spark):
    # dist is exactly eps: 3-4-5 triangle -> perpendicular distance 5
    assert _run(spark, [(0, 0, 5)], [(7, -10, 0, 10, 0)], eps=5) == [(0, 7)]
    assert _run(spark, [(0, 0, 5)], [(7, -10, 0, 10, 0)], eps=4) == []


def test_hygiene_and_validation(spark):
    p = spark.createDataFrame(
        [(0, 1, 1), (1, None, 1)], "pt_id long, x long, y long")
    s = spark.createDataFrame(
        [(9, 0, 0, 3, 0), (8, None, 0, 3, 0)],
        "seg_id long, x1 long, y1 long, x2 long, y2 long")
    assert [(r["pt"], r["seg"]) for r in snap_join(p, s, 2, 4.0).collect()] \
        == [(0, 9)]
    with pytest.raises(ValueError):
        snap_join(p, s, 2, 0.0)
    with pytest.raises(ValueError):
        snap_join(p, s, -1, 4.0)


_pt = st.tuples(st.integers(-15, 15), st.integers(-15, 15))
_sg = st.tuples(st.integers(-15, 15), st.integers(-15, 15),
                st.integers(-15, 15), st.integers(-15, 15))


@given(st.lists(_pt, min_size=1, max_size=8),
       st.lists(_sg, min_size=1, max_size=6),
       st.integers(0, 8), st.sampled_from([2.0, 5.0, 16.0]))
@settings(max_examples=25, deadline=None)
def test_blocking_complete_vs_python_brute_force(spark, pts, segs, eps, cell):
    points = [(i, *p) for i, p in enumerate(pts)]
    segments = [(i, *s) for i, s in enumerate(segs)]
    want = sorted(
        (i, j)
        for i, (px, py) in enumerate(pts)
        for j, s in enumerate(segs)
        if _dist2_leq(px, py, *s, eps)
    )
    assert _run(spark, points, segments, eps, cell) == want


def test_twin_parity_with_duckdb(spark):
    pts = [(r, r % 21 - 3, r % 23 - 4) for r in range(67)]
    segs = [(r, r % 17, r % 19, r % 17 + r % 7 - 3, r % 19 + r % 5 - 2)
            for r in range(60)]
    got = _run(spark, pts, segs, eps=2, cell=4.0)
    con = duckdb.connect()
    con.execute("CREATE TABLE p AS SELECT * FROM (VALUES "
                + ",".join(f"({a},{b},{c})" for a, b, c in pts)
                + ") t(pt_id, x, y)")
    con.execute("CREATE TABLE s AS SELECT * FROM (VALUES "
                + ",".join(f"({a},{b},{c},{d},{e})"
                           for a, b, c, d, e in segs)
                + ") t(seg_id, x1, y1, x2, y2)")
    exp = con.execute(sql_snap_join(
        "SELECT * FROM p", "SELECT * FROM s", 2)).fetchall()
    assert got == sorted((int(a), int(b)) for a, b in exp)
