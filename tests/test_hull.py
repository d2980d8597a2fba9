"""Convex hull: hand geometries, degenerate sets, fuzz vs the vertex
definition, CCW order contract, and Spark-vs-DuckDB twin parity."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings, strategies as st

from core_spark.operators.hull import _chain, convex_hull, sql_convex_hull


def _run(spark, pts):
    df = spark.createDataFrame(pts, "x long, y long")
    rows = convex_hull(df).collect()
    return sorted((r["pos"], r["x"], r["y"]) for r in rows)


def _in_conv_of_others(p, pts):
    """Membership per the DEFINITION (Caratheodory): p in conv(pts \\ {p})
    iff p is strictly within a segment of two others or inside-or-on a
    non-degenerate triangle of three others. Pure-int arithmetic."""
    others = [q for q in pts if q != p]

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    for a in others:
        for b in others:
            if cross(a, b, p) == 0 \
                    and min(a[0], b[0]) <= p[0] <= max(a[0], b[0]) \
                    and min(a[1], b[1]) <= p[1] <= max(a[1], b[1]):
                return True
    for a in others:
        for b in others:
            for c in others:
                if cross(a, b, c) == 0:
                    continue
                d1 = cross(a, b, p)
                d2 = cross(b, c, p)
                d3 = cross(c, a, p)
                if (d1 >= 0 and d2 >= 0 and d3 >= 0) or (
                        d1 <= 0 and d2 <= 0 and d3 <= 0):
                    return True
    return False


def _model_vertices(pts):
    uniq = sorted(set(pts))
    return sorted(p for p in uniq if not _in_conv_of_others(p, uniq))


def test_square_with_interior_points(spark):
    pts = [(0, 0), (4, 0), (4, 4), (0, 4), (2, 2), (1, 3), (3, 1)]
    got = _run(spark, pts)
    assert got == [(0, 0, 0), (1, 4, 0), (2, 4, 4), (3, 0, 4)]


def test_edge_interior_point_is_not_a_vertex(spark):
    # (2, 0) sits on the bottom edge: strict hull excludes it
    pts = [(0, 0), (2, 0), (4, 0), (4, 4), (0, 4)]
    got = _run(spark, pts)
    assert (got[1][1], got[1][2]) == (4, 0)
    assert len(got) == 4


def test_collinear_keeps_endpoints_only(spark):
    pts = [(0, 0), (1, 1), (2, 2), (3, 3)]
    assert _run(spark, pts) == [(0, 0, 0), (1, 3, 3)]


def test_degenerate_small_inputs(spark):
    assert _run(spark, [(5, 7)]) == [(0, 5, 7)]
    assert _run(spark, [(5, 7), (1, 2)]) == [(0, 1, 2), (1, 5, 7)]
    assert _run(spark, [(5, 7), (5, 7), (1, 2)]) == [(0, 1, 2), (1, 5, 7)]


def test_null_coordinates_dropped(spark):
    df = spark.createDataFrame(
        [(0, 0), (None, 9), (9, None), (3, 0), (0, 3)], "x long, y long"
    )
    rows = sorted((r["x"], r["y"]) for r in convex_hull(df).collect())
    assert rows == [(0, 0), (0, 3), (3, 0)]


def test_ccw_order_contract(spark):
    pts = [(0, 0), (6, 1), (7, 5), (3, 8), (-1, 4), (2, 2), (4, 4)]
    rows = sorted(
        ((r["pos"], (r["x"], r["y"])) for r in
         convex_hull(spark.createDataFrame(pts, "x long, y long")).collect())
    )
    hull = [p for _, p in rows]
    assert hull[0] == min(hull)  # pos 0 is the lex-min vertex
    n = len(hull)
    for i in range(n):
        o, a, b = hull[i], hull[(i + 1) % n], hull[(i + 2) % n]
        c = (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])
        assert c > 0  # strictly counter-clockwise, no collinear runs


@given(st.lists(
    st.tuples(st.integers(-20, 20), st.integers(-20, 20)),
    min_size=1, max_size=24,
))
@settings(max_examples=120, deadline=None)
def test_chain_matches_vertex_definition(pts):
    got = sorted(_chain(sorted(set(pts))))
    assert got == _model_vertices(pts)


def test_twin_parity_with_duckdb(spark):
    # the fixture expression used by the registered query, in miniature
    pts = [((r * r) % 61, (r * r * r + 3 * r) % 61) for r in range(61)]
    spark_rows = sorted(
        (r["x"], r["y"]) for r in
        convex_hull(spark.createDataFrame(pts, "x long, y long")).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE src AS SELECT * FROM (VALUES "
                + ",".join(f"({x},{y})" for x, y in pts) + ") t(x, y)")
    oracle = con.execute(sql_convex_hull("SELECT x, y FROM src")).fetchall()
    assert spark_rows == sorted((int(x), int(y)) for x, y in oracle)
