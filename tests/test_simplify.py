"""Douglas-Peucker: hand fixtures, the eps guarantee, ring adaptation."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from core_spark.operators.simplify import simplify_ring, simplify_rings

EPS = 0.5

# rectangle with INWARD-displaced edge midpoints: DP survival of each
# midpoint is exactly (its displacement > eps) — see the entry-query
# derivation; corners always survive.
def rect_ring(w, h, d):
    return [
        [0.0, 0.0], [w / 2, d[0]], [w, 0.0], [w - d[1], h / 2],
        [w, h], [w / 2, h - d[2]], [0.0, h], [d[3], h / 2],
        [0.0, 0.0],
    ]


def test_midpoint_survival_is_displacement_vs_eps():
    ring = rect_ring(4.0, 2.0, [0.25, 0.75, 0.75, 0.25])
    got = simplify_ring(ring, EPS)
    assert got == [
        [0.0, 0.0], [4.0, 0.0], [3.25, 1.0], [4.0, 2.0],
        [2.0, 1.25], [0.0, 2.0], [0.0, 0.0],
    ]


def test_exactly_eps_is_dropped():
    """Strict inequality: displacement == eps does not survive."""
    ring = rect_ring(4.0, 2.0, [0.5, 0.5, 0.5, 0.5])
    got = simplify_ring(ring, EPS)
    assert got == [
        [0.0, 0.0], [4.0, 0.0], [4.0, 2.0], [0.0, 2.0], [0.0, 0.0],
    ]


def test_eps_zero_drops_exact_collinears_only():
    ring = [[0.0, 0.0], [2.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 0.0]]
    got = simplify_ring(ring, 0.0)
    assert got == [[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 0.0]]


def test_small_and_degenerate_rings():
    tri = [[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [0.0, 0.0]]
    assert simplify_ring(tri, 10.0) == tri  # <= 4 positions: untouched
    same = [[1.0, 1.0]] * 6
    assert simplify_ring(same, 0.5) == [[1.0, 1.0], [1.0, 1.0]]


def _seg_d2_num_den(p, a, b):
    ax, ay = a
    bx, by = b
    px, py = p
    dx, dy = bx - ax, by - ay
    seg2 = dx * dx + dy * dy
    if seg2 == 0.0:
        return (px - ax) ** 2 + (py - ay) ** 2, 1.0
    t_num = (px - ax) * dx + (py - ay) * dy
    if t_num <= 0:
        return (px - ax) ** 2 + (py - ay) ** 2, 1.0
    if t_num >= seg2:
        return (px - bx) ** 2 + (py - by) ** 2, 1.0
    cr = dx * (py - ay) - dy * (px - ax)
    return cr * cr, seg2


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 16).map(lambda v: v * 0.25),
            st.integers(0, 16).map(lambda v: v * 0.25),
        ),
        min_size=3, max_size=14,
    )
)
def test_dp_guarantee_every_dropped_vertex_within_eps(pts):
    """The DP contract: each input vertex lies within eps of the
    simplified CHAIN (checked against the nearest simplified segment,
    exact arithmetic)."""
    ring = [list(p) for p in pts] + [list(pts[0])]
    simp = simplify_ring(ring, EPS)
    assert simp[0] == simp[-1] or len(simp) == 2  # stays closed
    segs = list(zip(simp, simp[1:]))
    for p in ring:
        ok = False
        for a, b in segs:
            num, den = _seg_d2_num_den(p, a, b)
            if num <= (EPS * EPS) * den + 1e-9:
                ok = True
                break
        assert ok, (p, simp)


@pytest.mark.spark
def test_spark_stage_matches_kernel_and_counts(spark):
    rings_a = [rect_ring(4.0, 2.0, [0.25, 0.75, 0.75, 0.25])]
    rings_b = [rect_ring(6.0, 3.0, [0.75, 0.25, 0.25, 0.75]),
               rect_ring(6.0, 3.0, [0.25, 0.25, 0.25, 0.25])]
    df = spark.createDataFrame(
        [(0, rings_a), (1, rings_b), (2, None)],
        "pid long, rings array<array<array<double>>>",
    )
    got = {r["pid"]: r for r in simplify_rings(df, EPS).collect()}
    assert [list(map(list, r)) for r in got[0]["rings"]] == [
        simplify_ring(rings_a[0], EPS)
    ]
    assert got[0]["n_vertices_in"] == 9
    assert got[0]["n_vertices_out"] == 7
    assert got[1]["n_vertices_in"] == 18
    assert got[1]["n_vertices_out"] == 7 + 5
    assert got[2]["rings"] is None and got[2]["n_vertices_in"] is None


def test_rejects_negative_eps(spark):
    df = spark.createDataFrame(
        [(0, [[[0.0, 0.0]]])], "pid long, rings array<array<array<double>>>"
    )
    with pytest.raises(ValueError):
        simplify_rings(df, -1.0)
