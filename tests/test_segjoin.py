"""Segment-intersection join: the CLRS predicate battery on hand
geometries, blocking completeness vs a Python brute force, cell-size
invariance, single emission, hygiene, and the DuckDB twin."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from core_spark.operators.segjoin import segment_join, sql_segment_join


def _run(spark, left, right, cell=4.0):
    l = spark.createDataFrame(
        left, "seg_id long, x1 long, y1 long, x2 long, y2 long")
    r = spark.createDataFrame(
        right, "seg_id long, x1 long, y1 long, x2 long, y2 long")
    return sorted((row["a"], row["b"])
                  for row in segment_join(l, r, cell).collect())


def _segs_intersect(a, b):
    """Python model of the closed segment-intersection predicate."""
    (ax1, ay1, ax2, ay2), (bx1, by1, bx2, by2) = a, b

    def cross(ox, oy, px, py, qx, qy):
        return (px - ox) * (qy - oy) - (py - oy) * (qx - ox)

    d1 = cross(bx1, by1, bx2, by2, ax1, ay1)
    d2 = cross(bx1, by1, bx2, by2, ax2, ay2)
    d3 = cross(ax1, ay1, ax2, ay2, bx1, by1)
    d4 = cross(ax1, ay1, ax2, ay2, bx2, by2)
    if ((d1 > 0 > d2) or (d1 < 0 < d2)) and ((d3 > 0 > d4) or (d3 < 0 < d4)):
        return True

    def on(px, py, x1, y1, x2, y2, d):
        return d == 0 and min(x1, x2) <= px <= max(x1, x2) \
            and min(y1, y2) <= py <= max(y1, y2)

    return (on(ax1, ay1, bx1, by1, bx2, by2, d1)
            or on(ax2, ay2, bx1, by1, bx2, by2, d2)
            or on(bx1, by1, ax1, ay1, ax2, ay2, d3)
            or on(bx2, by2, ax1, ay1, ax2, ay2, d4))


def test_predicate_battery(spark):
    left = [(0, 0, 0, 10, 10)]      # the main diagonal
    right = [
        (0, 0, 10, 10, 0),          # proper X crossing      -> hit
        (1, 5, 5, 12, 5),           # T-touch at (5,5)       -> hit
        (2, 10, 10, 20, 10),        # endpoint-endpoint touch-> hit
        (3, 2, 2, 8, 8),            # collinear containment  -> hit
        (4, 11, 11, 20, 20),        # collinear disjoint     -> miss
        (5, 0, 1, 10, 11),          # parallel offset        -> miss
        (6, 3, 3, 3, 3),            # degenerate ON segment  -> hit
        (7, 3, 4, 3, 4),            # degenerate OFF segment -> miss
        (8, 0, 2, 2, 0),            # crosses at (1,1) near start -> hit
    ]
    got = _run(spark, left, right)
    assert got == [(0, 0), (0, 1), (0, 2), (0, 3), (0, 6), (0, 8)]


def test_pair_sharing_many_cells_emitted_once(spark):
    # two long collinear overlapping segments share ~25 cells at g=4
    got = _run(spark, [(1, 0, 0, 100, 0)], [(2, 50, 0, 150, 0)], cell=4.0)
    assert got == [(1, 2)]


def test_cell_size_invariance(spark):
    left = [(i, i, 0, i + 6, 9) for i in range(8)]
    right = [(i, 0, i, 12, i + 1) for i in range(8)]
    assert _run(spark, left, right, cell=2.0) \
        == _run(spark, left, right, cell=7.0)


def test_null_endpoints_dropped_and_validation(spark):
    l = spark.createDataFrame(
        [(1, 0, 0, 4, 4), (2, None, 0, 4, 4)],
        "seg_id long, x1 long, y1 long, x2 long, y2 long")
    r = spark.createDataFrame(
        [(9, 0, 4, 4, 0)], "seg_id long, x1 long, y1 long, x2 long, y2 long")
    assert [(x["a"], x["b"]) for x in segment_join(l, r, 4.0).collect()] \
        == [(1, 9)]
    with pytest.raises(ValueError):
        segment_join(l, r, 0)


_seg = st.tuples(st.integers(-12, 12), st.integers(-12, 12),
                 st.integers(-12, 12), st.integers(-12, 12))


@given(st.lists(_seg, min_size=1, max_size=7),
       st.lists(_seg, min_size=1, max_size=7),
       st.sampled_from([1.0, 3.0, 10.0]))
@settings(max_examples=25, deadline=None)
def test_blocking_complete_vs_python_brute_force(spark, la, lb, cell):
    left = [(i, *s) for i, s in enumerate(la)]
    right = [(i, *s) for i, s in enumerate(lb)]
    want = sorted(
        (i, j)
        for i, a in enumerate(la) for j, b in enumerate(lb)
        if _segs_intersect(a, b)
    )
    assert _run(spark, left, right, cell) == want


def test_twin_parity_with_duckdb(spark):
    left = [(r, r % 17, r % 19, r % 17 + r % 7 - 3, r % 19 + r % 5 - 2)
            for r in range(60)]
    right = [(r, r % 13, r % 11, r % 13 + r % 9 - 4, r % 11 + 3 - r % 6)
             for r in range(60)]
    got = _run(spark, left, right, cell=4.0)
    con = duckdb.connect()
    for name, rows in (("l", left), ("r", right)):
        con.execute(
            f"CREATE TABLE {name} AS SELECT * FROM (VALUES "
            + ",".join(f"({a},{b},{c},{d},{e})" for a, b, c, d, e in rows)
            + ") t(seg_id, x1, y1, x2, y2)")
    exp = con.execute(sql_segment_join(
        "SELECT * FROM l", "SELECT * FROM r")).fetchall()
    assert got == sorted((int(a), int(b)) for a, b in exp)
