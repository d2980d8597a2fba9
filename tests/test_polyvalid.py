"""Ring validity: hand geometries for every violation class, fuzz vs a
Python model, degenerate rings, and the DuckDB twin."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from core_spark.operators.polyvalid import sql_validate_rings, validate_rings


def _run(spark, rings):
    rows = [(rid, pos, x, y)
            for rid, verts in rings.items()
            for pos, (x, y) in enumerate(verts)]
    df = spark.createDataFrame(rows, "ring_id long, pos long, x long, y long")
    return {r["ring_id"]: (r["n_vertices"], r["violations"], r["valid"])
            for r in validate_rings(df).collect()}


def _segs_touch(a, b):
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


def _on_closed(p, a, b):
    (px, py), (ax, ay), (bx, by) = p, a, b
    return ((bx - ax) * (py - ay) - (by - ay) * (px - ax)) == 0 \
        and min(ax, bx) <= px <= max(ax, bx) \
        and min(ay, by) <= py <= max(ay, by)


def _model(verts):
    m = len(verts)
    if m < 3:
        return (m, -1, False)
    edges = [(verts[i], verts[(i + 1) % m]) for i in range(m)]
    v = 0
    for i in range(m):
        for j in range(i + 1, m):
            (a1, a2), (b1, b2) = edges[i], edges[j]
            consecutive = j == i + 1
            wrap = i == 0 and j == m - 1
            if consecutive and not wrap:
                bad = _on_closed(b2, a1, a2) or _on_closed(a1, b1, b2)
            elif wrap:
                bad = _on_closed(a2, b1, b2) or _on_closed(b1, a1, a2)
            else:
                bad = _segs_touch((*a1, *a2), (*b1, *b2))
            v += bad
    return (m, v, v == 0)


def test_valid_shapes(spark):
    rings = {
        0: [(0, 0), (4, 0), (4, 4), (0, 4)],            # square
        1: [(0, 0), (5, 0), (3, 4)],                    # triangle
        2: [(0, 0), (4, 0), (4, 2), (2, 2), (2, 4), (0, 4)],  # L-shape
    }
    got = _run(spark, rings)
    assert all(v[2] and v[1] == 0 for v in got.values()), got


def test_invalid_shapes_each_violation_class(spark):
    rings = {
        0: [(0, 0), (4, 0), (0, 4), (4, 4)],   # bowtie: crossing
        1: [(0, 0), (4, 0), (2, 0), (2, 4)],   # spike: doubled-back edge
        2: [(0, 0), (4, 0), (4, 4), (0, 0)],   # repeated first vertex
        3: [(0, 0), (4, 4)],                   # degenerate: 2 vertices
        4: [(0, 0), (4, 0), (4, 4), (2, 0)],   # vertex touches an edge
    }
    got = _run(spark, rings)
    assert not any(v[2] for v in got.values()), got
    assert got[3] == (2, -1, False)


def test_matches_model(spark):
    rings = {
        0: [(0, 0), (6, 0), (6, 6), (0, 6)],
        1: [(0, 0), (6, 0), (0, 6), (6, 6)],
        2: [(1, 1), (5, 1), (3, 5)],
    }
    got = _run(spark, rings)
    for rid, verts in rings.items():
        assert got[rid] == _model(verts), rid


_vert = st.tuples(st.integers(0, 6), st.integers(0, 6))


@given(st.lists(st.lists(_vert, min_size=3, max_size=6, unique=True),
                min_size=1, max_size=4))
@settings(max_examples=20, deadline=None)
def test_fuzz_matches_model(spark, ringlists):
    rings = {i: vs for i, vs in enumerate(ringlists)}
    got = _run(spark, rings)
    for rid, verts in rings.items():
        assert got[rid] == _model(verts), (rid, verts)


def test_twin_parity_with_duckdb(spark):
    # the registered fixture's generation rule in miniature
    rows = []
    for r in range(40):
        cx, cy, s = r % 23, r % 19, r % 5 + 2
        if r % 4 == 0:  # bowtie
            quad = [(cx, cy), (cx + s, cy), (cx, cy + s), (cx + s, cy + s)]
        else:
            quad = [(cx, cy), (cx + s, cy), (cx + s, cy + s), (cx, cy + s)]
        rows += [(r, p, x, y) for p, (x, y) in enumerate(quad)]
    df = spark.createDataFrame(rows, "ring_id long, pos long, x long, y long")
    got = sorted(tuple(r) for r in validate_rings(df).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE rv AS SELECT * FROM (VALUES "
                + ",".join(f"({a},{b},{c},{d})" for a, b, c, d in rows)
                + ") t(ring_id, pos, x, y)")
    exp = sorted(tuple(r) for r in con.execute(
        sql_validate_rings("SELECT * FROM rv")).fetchall())
    assert [(a, b, c, bool(d)) for a, b, c, d in got] \
        == [(int(a), int(b), int(c), bool(d)) for a, b, c, d in exp]
    assert sum(1 for *_x, v in got if not v) == 10  # the 10 bowties


def test_null_vertex_quarantines_the_whole_ring(spark):
    # dropping a NULL row would silently reshape the ring (and diverge
    # from the twin); the contract is whole-ring quarantine instead
    rows = [(0, 0, 0, 0), (0, 1, 4, 0), (0, 2, None, 4), (0, 3, 0, 4),
            (1, 0, 0, 0), (1, 1, 4, 0), (1, 2, 4, 4)]
    df = spark.createDataFrame(rows, "ring_id long, pos long, x long, y long")
    got = {r["ring_id"]: (r["n_vertices"], r["violations"], r["valid"])
           for r in validate_rings(df).collect()}
    assert got[0] == (4, -1, False)   # quarantined, NOT reshaped
    assert got[1] == (3, 0, True)     # clean sibling unaffected

    con = duckdb.connect()
    con.execute("CREATE TABLE rvn (ring_id BIGINT, pos BIGINT,"
                " x BIGINT, y BIGINT)")
    con.executemany("INSERT INTO rvn VALUES (?, ?, ?, ?)", rows)
    exp = {int(a): (int(b), int(c), bool(d)) for a, b, c, d in con.execute(
        sql_validate_rings("SELECT * FROM rvn")).fetchall()}
    assert exp == got
