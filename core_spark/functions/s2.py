"""G4 — S2 cell ids from scratch (vectorized numpy; no s2 library needed).

Implements the published S2 cell-id scheme (s2geometry.io docs; the cube-face
+ quadratic ST projection + Hilbert curve layout described in the public
S2 papers and reference sources):

  lat/lon -> unit XYZ -> cube face (largest |component|) -> (u,v) via the
  face-specific ratios -> (s,t) via the quadratic projection -> 30-bit (i,j)
  -> 60-bit Hilbert position (4-bit lookup blocks) -> 64-bit cell id
  ``face<<61 | pos<<1 | 1`` for leaves, truncated for coarser levels.

The Hilbert lookup tables are *generated* at import from the 4-entry base
case, exactly as the reference implementation generates them — no big
hardcoded tables to get wrong. Correctness is established by structural
invariants (tests/test_s2.py): consecutive leaf positions are spatially
adjacent (the defining Hilbert property), parent ranges nest exactly,
centers round-trip, and face/UV axes match the documented orientation.

This is the engine's only geospatial stage that needs Python at all; it runs
as an Arrow-batched pandas UDF (~10^6 rows/s/core vectorized). Everything
else (HX tiling) stays JVM-side.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
_SWAP = 1
_INVERT = 2

_POS_TO_IJ = np.array(
    [[0, 1, 3, 2], [0, 2, 3, 1], [3, 2, 0, 1], [3, 1, 0, 2]], dtype=np.int64
)
_POS_TO_ORIENT = np.array([_SWAP, 0, 0, _INVERT | _SWAP], dtype=np.int64)

_LOOKUP_BITS = 4
_LOOKUP_POS = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.int64)
_LOOKUP_IJ = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.int64)


def _init_lookup(level: int, i: int, j: int, orig: int, pos: int, orient: int) -> None:
    if level == _LOOKUP_BITS:
        ij = (i << _LOOKUP_BITS) + j
        _LOOKUP_POS[(ij << 2) + orig] = (pos << 2) + orient
        _LOOKUP_IJ[(pos << 2) + orig] = (ij << 2) + orient
        return
    level += 1
    i <<= 1
    j <<= 1
    pos <<= 2
    r = _POS_TO_IJ[orient]
    for subpos in range(4):
        ij = int(r[subpos])
        _init_lookup(
            level,
            i + (ij >> 1),
            j + (ij & 1),
            orig,
            pos + subpos,
            orient ^ int(_POS_TO_ORIENT[subpos]),
        )


for _o in (0, _SWAP, _INVERT, _SWAP | _INVERT):
    _init_lookup(0, 0, 0, _o, 0, _o)


# ---------------------------------------------------------------------------
# Coordinate transforms (vectorized)
# ---------------------------------------------------------------------------

def latlon_to_xyz(lat: np.ndarray, lon: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    phi = np.radians(lat)
    lam = np.radians(lon)
    cp = np.cos(phi)
    return cp * np.cos(lam), cp * np.sin(lam), np.sin(phi)


def xyz_to_face_uv(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    comp = np.choose(face, [x, y, z])
    face = np.where(comp < 0, face + 3, face)
    # face-specific (u, v) ratios (documented S2 orientation)
    u = np.empty_like(x)
    v = np.empty_like(x)
    m0, m1, m2 = face == 0, face == 1, face == 2
    m3, m4, m5 = face == 3, face == 4, face == 5
    with np.errstate(divide="ignore", invalid="ignore"):
        u[m0] = y[m0] / x[m0]; v[m0] = z[m0] / x[m0]
        u[m1] = -x[m1] / y[m1]; v[m1] = z[m1] / y[m1]
        u[m2] = -x[m2] / z[m2]; v[m2] = -y[m2] / z[m2]
        u[m3] = z[m3] / x[m3]; v[m3] = y[m3] / x[m3]
        u[m4] = z[m4] / y[m4]; v[m4] = -x[m4] / y[m4]
        u[m5] = -y[m5] / z[m5]; v[m5] = -x[m5] / z[m5]
    return face.astype(np.int64), u, v


def face_uv_to_xyz(face: np.ndarray, u: np.ndarray, v: np.ndarray):
    """Inverse of xyz_to_face_uv (un-normalized)."""
    one = np.ones_like(u)
    x = np.empty_like(u)
    y = np.empty_like(u)
    z = np.empty_like(u)
    table = [
        (one, u, v),        # face 0
        (-u, one, v),       # face 1
        (-u, -v, one),      # face 2
        (-one, -v, -u),     # face 3
        (v, -one, -u),      # face 4
        (v, u, -one),       # face 5
    ]
    for f, (fx, fy, fz) in enumerate(table):
        m = face == f
        x[m], y[m], z[m] = fx[m], fy[m], fz[m]
    return x, y, z


def uv_to_st(u: np.ndarray) -> np.ndarray:
    """Quadratic projection (the S2_QUADRATIC_PROJECTION default)."""
    with np.errstate(invalid="ignore"):  # np.where evaluates both branches
        return np.where(
            u >= 0.0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u)
        )


def st_to_uv(s: np.ndarray) -> np.ndarray:
    return np.where(
        s >= 0.5, (1.0 / 3.0) * (4.0 * s * s - 1.0), (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s))
    )


def st_to_ij(s: np.ndarray) -> np.ndarray:
    return np.clip((np.floor(s * (1 << MAX_LEVEL))).astype(np.int64), 0, (1 << MAX_LEVEL) - 1)


# ---------------------------------------------------------------------------
# Hilbert encoding
# ---------------------------------------------------------------------------

def face_ij_to_id(face: np.ndarray, i: np.ndarray, j: np.ndarray, level: int = MAX_LEVEL) -> np.ndarray:
    """(face, i, j) at level 30 -> cell id at ``level`` (vectorized)."""
    face = face.astype(np.uint64)
    i = i.astype(np.uint64)
    j = j.astype(np.uint64)
    n = face << np.uint64(60)
    bits = (face & np.uint64(_SWAP)).astype(np.uint64)
    mask = np.uint64((1 << _LOOKUP_BITS) - 1)
    lookup = _LOOKUP_POS.astype(np.uint64)
    for k in range(7, -1, -1):
        sh = np.uint64(k * _LOOKUP_BITS)
        bits = bits + (((i >> sh) & mask) << np.uint64(_LOOKUP_BITS + 2))
        bits = bits + (((j >> sh) & mask) << np.uint64(2))
        bits = lookup[bits.astype(np.int64)]
        n |= (bits >> np.uint64(2)) << np.uint64(k * 2 * _LOOKUP_BITS)
        bits &= np.uint64(_SWAP | _INVERT)
    leaf = n * np.uint64(2) + np.uint64(1)
    if level >= MAX_LEVEL:
        return leaf.astype(np.int64)
    lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    with np.errstate(over="ignore"):
        return ((leaf & (~(lsb - np.uint64(1)))) | lsb).astype(np.int64)


def s2_cell(lat, lon, level: int = MAX_LEVEL) -> np.ndarray:
    """Vectorized (lat, lon) -> S2 cell id at ``level``. Invalid -> -1."""
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    valid = (lat >= -90.0) & (lat <= 90.0) & np.isfinite(lon)
    x, y, z = latlon_to_xyz(np.where(valid, lat, 0.0), np.where(valid, lon, 0.0))
    face, u, v = xyz_to_face_uv(x, y, z)
    i = st_to_ij(uv_to_st(u))
    j = st_to_ij(uv_to_st(v))
    out = face_ij_to_id(face, i, j, level)
    return np.where(valid, out, np.int64(-1))


# ---------------------------------------------------------------------------
# Cell-id algebra
# ---------------------------------------------------------------------------

def lsb(cell: np.ndarray) -> np.ndarray:
    c = np.asarray(cell).astype(np.uint64)
    with np.errstate(over="ignore"):
        return (c & (~c + np.uint64(1))).astype(np.uint64)


def level_of(cell) -> np.ndarray:
    l = lsb(np.asarray(cell))
    # position of the lowest set bit / 2
    out = np.zeros(l.shape, dtype=np.int64)
    for b in range(61):
        out = np.where(l == np.uint64(1) << np.uint64(b), MAX_LEVEL - b // 2, out)
    return out


def parent(cell, level: int) -> np.ndarray:
    c = np.asarray(cell).astype(np.uint64)
    new_lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    with np.errstate(over="ignore"):
        return ((c & (~(new_lsb - np.uint64(1)))) | new_lsb).astype(np.int64)


def range_min(cell) -> np.ndarray:
    c = np.asarray(cell).astype(np.uint64)
    return (c - (lsb(c) - np.uint64(1))).astype(np.int64)


def range_max(cell) -> np.ndarray:
    c = np.asarray(cell).astype(np.uint64)
    return (c + (lsb(c) - np.uint64(1))).astype(np.int64)


def contains(parent_cell, child_cell) -> np.ndarray:
    return (range_min(parent_cell) <= np.asarray(child_cell)) & (
        np.asarray(child_cell) <= range_max(parent_cell)
    )


def cell_center_latlon(cell) -> tuple[np.ndarray, np.ndarray]:
    """Cell id -> (lat, lon) of the cell center (decode via lookup_ij)."""
    c = np.asarray(cell).astype(np.uint64)
    face = (c >> np.uint64(61)).astype(np.int64)
    pos = (c & np.uint64((1 << 61) - 1)) >> np.uint64(1)
    # decode 60-bit position to (i, j) at leaf granularity of this cell:
    # run the inverse lookup per 8-bit block
    bits = (face.astype(np.uint64) & np.uint64(_SWAP)).astype(np.uint64)
    i = np.zeros(c.shape, dtype=np.uint64)
    j = np.zeros(c.shape, dtype=np.uint64)
    lookup = _LOOKUP_IJ.astype(np.uint64)
    for k in range(7, -1, -1):
        nbits = np.uint64(2 * _LOOKUP_BITS)
        bits = bits + (((pos >> np.uint64(k * 2 * _LOOKUP_BITS)) & np.uint64((1 << (2 * _LOOKUP_BITS)) - 1)) << np.uint64(2))
        bits = lookup[bits.astype(np.int64)]
        i |= ((bits >> np.uint64(_LOOKUP_BITS + 2)) & np.uint64((1 << _LOOKUP_BITS) - 1)) << np.uint64(k * _LOOKUP_BITS)
        j |= ((bits >> np.uint64(2)) & np.uint64((1 << _LOOKUP_BITS) - 1)) << np.uint64(k * _LOOKUP_BITS)
        bits &= np.uint64(_SWAP | _INVERT)
        _ = nbits
    lvl = level_of(c.astype(np.int64))
    # center of the cell: take the leaf (i,j) of range_min's corner + half extent
    size = np.uint64(1) << (np.uint64(MAX_LEVEL) - lvl.astype(np.uint64))
    # (i, j) decoded above correspond to this cell id's curve position; mask to
    # cell granularity then offset to the center
    i = (i & ~(size - np.uint64(1))) + size // np.uint64(2)
    j = (j & ~(size - np.uint64(1))) + size // np.uint64(2)
    s = (i.astype(np.float64) + 0.5) / float(1 << MAX_LEVEL)
    t = (j.astype(np.float64) + 0.5) / float(1 << MAX_LEVEL)
    u = st_to_uv(s)
    v = st_to_uv(t)
    x, y, z = face_uv_to_xyz(face, u, v)
    norm = np.sqrt(x * x + y * y + z * z)
    lat = np.degrees(np.arcsin(z / norm))
    lon = np.degrees(np.arctan2(y, x))
    return lat, lon


# ---------------------------------------------------------------------------
# Spark stage
# ---------------------------------------------------------------------------

def s2_cell_col(lat_col: str, lon_col: str, level: int):
    """Pandas-UDF Column: S2 cell id (Arrow-batched numpy, no per-row Python)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    def _s2(lat, lon):
        out = s2_cell(lat.to_numpy(dtype=np.float64), lon.to_numpy(dtype=np.float64), level)
        return pd.Series(out)

    udf = pandas_udf(_s2, "long")
    return udf(F.col(lat_col), F.col(lon_col))
