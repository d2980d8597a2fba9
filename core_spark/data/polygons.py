"""Deterministic synthetic admin-boundary polygon table (no external data).

Irregular convex polygons on a world grid — one per "admin region" — built as
a pure function of the polygon id (same splitmix64 discipline as synth.py, so
driver, executors, and the DuckDB oracle all see identical geometry).

Vertices are rounded to 6 decimal places and emitted as SQL literals, so the
polygon table can be reconstructed *inside SQL* as a VALUES edge list — the
DuckDB oracle ray-casts over exactly the same doubles the Spark operator sees
(IEEE-754 literals round-trip identically in both engines).

Centers sit on a coarse grid with spacing wider than twice the max radius, so
polygons never overlap: every point matches at most one admin_id, which makes
PIP join goldens order-insensitive and unambiguous.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from core_spark.data.synth import smix, u01
from core_spark.functions.geometry import ring_envelope, ring_to_wkt

# grid: 18 lon slots x 8 lat slots = 144 polygon slots, spacing 20 x 18 deg
_LON_SLOTS = 18
_LAT_SLOTS = 8
_MAX_R = 6.0  # max vertex radius in degrees < spacing/2


def gen_polygon(pid: int) -> np.ndarray:
    """(n, 2) float64 ring of (lon, lat) vertices, CCW, 5-8 verts."""
    ids = np.full(1, pid, dtype=np.uint64)
    n_verts = 5 + int(smix(ids, 101)[0] % np.uint64(4))
    clon = -170.0 + (pid % _LON_SLOTS) * 20.0
    clat = -63.0 + (pid // _LON_SLOTS % _LAT_SLOTS) * 18.0
    vids = np.arange(n_verts, dtype=np.uint64) + np.uint64(pid) * np.uint64(1000)
    # radii in [2, MAX_R], angle jitter within each sector keeps convex order
    radii = 2.0 + u01(vids, 102) * (_MAX_R - 2.0)
    base = np.arange(n_verts, dtype=np.float64) * (2.0 * np.pi / n_verts)
    jitter = (u01(vids, 103) - 0.5) * (np.pi / n_verts)
    ang = base + jitter
    lon = np.round(clon + radii * np.cos(ang), 6)
    lat = np.round(clat + radii * np.sin(ang) * 0.8, 6)
    return np.stack([lon, lat], axis=1)


def gen_hole(pid: int) -> np.ndarray | None:
    """Inner hole ring for every 7th polygon (pid % 7 == 3): the outer ring
    shrunk 3x toward its centroid. Even-odd ray-cast parity makes hole
    semantics free (crossings XOR) in both the engine and the SQL oracle."""
    if pid % 7 != 3:
        return None
    outer = gen_polygon(pid)
    c = outer.mean(axis=0)
    return np.round(c + (outer - c) / 3.0, 6)


def gen_rings(pid: int) -> list[np.ndarray]:
    """All rings of polygon ``pid`` (outer first, then holes)."""
    rings = [gen_polygon(pid)]
    hole = gen_hole(pid)
    if hole is not None:
        rings.append(hole)
    return rings


def admin_polygons(n: int = 96) -> pd.DataFrame:
    """Polygon table: (admin_id, name, ring, rings, wkt, envelope).

    ``ring`` is the outer ring; ``rings`` includes holes. Antimeridian rule:
    crossing polygons must be pre-split at ingestion into fragments sharing
    one admin_id (the engine handles duplicate ids); this synthetic set
    keeps all polygons within (-180, 180) by grid construction.
    """
    if n > _LON_SLOTS * _LAT_SLOTS:
        raise ValueError(f"max {_LON_SLOTS * _LAT_SLOTS} non-overlapping slots")
    rows = []
    for pid in range(n):
        rings = gen_rings(pid)
        outer = rings[0]
        minx, miny, maxx, maxy = ring_envelope(outer)
        rows.append(
            {
                "admin_id": pid,
                "name": f"admin_{pid:03d}",
                "ring": [(float(x), float(y)) for x, y in outer],
                "rings": [[(float(x), float(y)) for x, y in r] for r in rings],
                "wkt": ring_to_wkt(outer),
                "minx": minx,
                "miny": miny,
                "maxx": maxx,
                "maxy": maxy,
            }
        )
    return pd.DataFrame(rows)


def edges_sql_values(n: int = 96) -> str:
    """The polygon EDGE list as a SQL VALUES table:
    (admin_id, ax, ay, bx, by) — one row per directed edge of EVERY ring
    (closing edges included; hole edges too — the parity join then gets
    hole semantics for free). Runs verbatim in Spark SQL and DuckDB.
    """
    parts = []
    for pid in range(n):
        for ring in gen_rings(pid):
            m = len(ring)
            for i in range(m):
                ax, ay = ring[i]
                bx, by = ring[(i + 1) % m]
                parts.append(f"({pid}, {ax!r}, {ay!r}, {bx!r}, {by!r})")
    return "VALUES " + ", ".join(parts)
