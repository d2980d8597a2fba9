"""Pure geometry kernels: ray-cast point-in-polygon, packed STRtree, haversine.

No geospatial libraries in the container (no shapely/GEOS), so the kernels are
implemented from public computational-geometry definitions, numpy-vectorized,
and Spark-free (unit-testable on plain arrays — the reference keeps its parse
kernels embedder-callable the same way, pkg/parser/framework/definition.go:111).

PIP edge rule (fixed, golden-tested — SURVEY.md §7 hard part (b)): the
half-open crossing rule. For point P and edge (A, B), the edge crosses P's
upward ray iff ``(Ay > Py) != (By > Py)`` and the intersection x lies strictly
right of Px:

    (Ay > Py) != (By > Py)  AND  Px < Ax + (Py - Ay) * (Bx - Ax) / (By - Ay)

Odd crossing count => inside. Points exactly on a horizontal edge follow the
rule's parity (top-exclusive / bottom-inclusive), so shared polygon borders
assign every point to exactly one polygon — the determinism the golden
fixtures rely on. The SAME inequality chain is emitted as ANSI SQL by
``sql_ray_cast_crossing`` for the DuckDB oracle.

STRtree: classic Sort-Tile-Recursive bulk-packing (Leutenegger et al. 1997) —
leaves hold polygon envelopes tiled by x then y; queries descend nodes whose
envelope intersects the probe point/box. Built once per executor process over
the broadcast polygon table (lazy global, the analog of the reference's
compiled-query cache, pkg/parser/tspool/query.go:33).
"""

from __future__ import annotations

import math

import numpy as np

EARTH_RADIUS_M = 6_371_008.8  # IUGG mean radius


# ---------------------------------------------------------------------------
# Haversine distance (vectorized)
# ---------------------------------------------------------------------------

def haversine_m(lat1, lon1, lat2, lon2) -> np.ndarray:
    """Great-circle distance in metres, float64 arrays."""
    la1, lo1, la2, lo2 = (np.radians(np.asarray(a, dtype=np.float64))
                          for a in (lat1, lon1, lat2, lon2))
    dlat = la2 - la1
    dlon = lo2 - lo1
    h = np.sin(dlat / 2.0) ** 2 + np.cos(la1) * np.cos(la2) * np.sin(dlon / 2.0) ** 2
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(np.clip(h, 0.0, 1.0)))


def sql_haversine_m(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """The same formula as ANSI SQL (RADIANS/SIN/COS/ASIN/SQRT exist with
    identical IEEE semantics in Spark SQL and DuckDB). LEAST() clamps the
    rounding overshoot exactly like np.clip."""
    la1, lo1 = f"RADIANS({lat1})", f"RADIANS({lon1})"
    la2, lo2 = f"RADIANS({lat2})", f"RADIANS({lon2})"
    h = (
        f"(POWER(SIN(({la2} - {la1})/2.0), 2) + "
        f"COS({la1})*COS({la2})*POWER(SIN(({lo2} - {lo1})/2.0), 2))"
    )
    return f"(2.0 * {EARTH_RADIUS_M!r} * ASIN(SQRT(LEAST({h}, 1.0))))"


# ---------------------------------------------------------------------------
# Ray-cast point-in-polygon
# ---------------------------------------------------------------------------

def point_in_ring(px: float, py: float, ring: np.ndarray) -> bool:
    """Scalar reference implementation. ``ring``: (n, 2) array of (x, y)
    vertices, closing edge implied (last->first)."""
    x = ring[:, 0]
    y = ring[:, 1]
    xj = np.roll(x, -1)
    yj = np.roll(y, -1)
    cross = (y > py) != (yj > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x + (py - y) * (xj - x) / (yj - y)
    hits = cross & (px < xint)
    return bool(np.count_nonzero(hits) & 1)


def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized: many points vs one ring -> bool array.

    O(n_points * n_vertices) numpy ops — used on the *candidate* pairs that
    survive the STRtree envelope filter, so n is small per polygon.
    """
    px = np.asarray(px, dtype=np.float64)[:, None]
    py = np.asarray(py, dtype=np.float64)[:, None]
    x = ring[None, :, 0]
    y = ring[None, :, 1]
    xj = np.roll(ring[:, 0], -1)[None, :]
    yj = np.roll(ring[:, 1], -1)[None, :]
    cross = (y > py) != (yj > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x + (py - y) * (xj - x) / (yj - y)
    hits = cross & (px < xint)
    return (hits.sum(axis=1) & 1).astype(bool)


def sql_ray_cast_crossing(px: str, py: str, ax: str, ay: str, bx: str, by: str) -> str:
    """SQL predicate: does edge (A,B) cross the upward ray from P?

    Identical inequality chain to the numpy kernel; division is guarded by the
    crossing test (Ay>Py) != (By>Py), which implies By != Ay. The oracle sums
    these per (point, polygon) and checks odd parity.
    """
    return (
        f"((({ay}) > ({py})) <> (({by}) > ({py})) AND "
        f"({px}) < ({ax}) + (({py}) - ({ay})) * (({bx}) - ({ax})) / (({by}) - ({ay})))"
    )


# ---------------------------------------------------------------------------
# Envelopes
# ---------------------------------------------------------------------------

def ring_envelope(ring: np.ndarray) -> tuple[float, float, float, float]:
    """(minx, miny, maxx, maxy) of a vertex ring."""
    return (
        float(ring[:, 0].min()),
        float(ring[:, 1].min()),
        float(ring[:, 0].max()),
        float(ring[:, 1].max()),
    )


# ---------------------------------------------------------------------------
# STRtree (Sort-Tile-Recursive packed R-tree) — bulk-load only, query by point
# ---------------------------------------------------------------------------

class STRtree:
    """Packed R-tree over rectangles, bulk-loaded with the STR heuristic.

    Flat-array layout (no per-node Python objects): nodes stored in
    ``self.boxes`` (N, 4); internal nodes reference a contiguous child span.
    Query cost O(log n + k). For admin-boundary cardinality (10^2..10^5
    polygons) build time is negligible and the whole tree broadcasts in KBs.
    """

    NODE_CAP = 16

    def __init__(self, boxes: np.ndarray):
        """boxes: (n, 4) array of (minx, miny, maxx, maxy)."""
        boxes = np.asarray(boxes, dtype=np.float64)
        n = len(boxes)
        self.n_items = n
        self.dense_boxes = boxes  # original order, for the small-P dense path
        if n == 0:
            self.levels: list[tuple[np.ndarray, np.ndarray]] = []
            self.item_order = np.empty(0, dtype=np.int64)
            return

        # --- STR packing of the leaf level ---
        cap = self.NODE_CAP
        cx = (boxes[:, 0] + boxes[:, 2]) * 0.5
        cy = (boxes[:, 1] + boxes[:, 3]) * 0.5
        n_nodes = math.ceil(n / cap)
        n_slices = math.ceil(math.sqrt(n_nodes))
        per_slice = n_slices * cap
        # sort by center x, tile into vertical slices, sort each slice by y
        order = np.argsort(cx, kind="stable")
        for s in range(0, n, per_slice):
            sl = order[s : s + per_slice]
            sl_sorted = sl[np.argsort(cy[sl], kind="stable")]
            order[s : s + per_slice] = sl_sorted
        self.item_order = order.astype(np.int64)
        sorted_boxes = boxes[order]

        # --- build levels bottom-up; each level: (boxes, child_start) ---
        self.levels = []
        level_boxes = sorted_boxes
        while len(level_boxes) > 1:
            m = len(level_boxes)
            k = math.ceil(m / cap)
            starts = np.arange(k, dtype=np.int64) * cap
            ends = np.minimum(starts + cap, m)
            parent = np.empty((k, 4), dtype=np.float64)
            for i in range(k):
                chunk = level_boxes[starts[i] : ends[i]]
                parent[i, 0] = chunk[:, 0].min()
                parent[i, 1] = chunk[:, 1].min()
                parent[i, 2] = chunk[:, 2].max()
                parent[i, 3] = chunk[:, 3].max()
            self.levels.append((level_boxes, starts))
            level_boxes = parent
        self.levels.append((level_boxes, np.zeros(1, dtype=np.int64)))
        self.levels.reverse()  # levels[0] = root

    def query_point(self, x: float, y: float) -> np.ndarray:
        """Item indices (original order) whose envelope contains (x, y)."""
        if self.n_items == 0:
            return np.empty(0, dtype=np.int64)
        cap = self.NODE_CAP
        frontier = np.array([0], dtype=np.int64)
        for li, (lboxes, _) in enumerate(self.levels):
            if li > 0:
                # expand each frontier node into its child span at this level
                starts = frontier * cap
                spans = [np.arange(s, min(s + cap, len(lboxes))) for s in starts]
                frontier = np.concatenate(spans) if spans else np.empty(0, np.int64)
            if len(frontier) == 0:
                return np.empty(0, dtype=np.int64)
            b = lboxes[frontier]
            hit = (b[:, 0] <= x) & (x <= b[:, 2]) & (b[:, 1] <= y) & (y <= b[:, 3])
            frontier = frontier[hit]
        return self.item_order[frontier]

    def query_points(self, xs: np.ndarray, ys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Batch query: -> (point_idx, item_idx) candidate pair arrays."""
        pis, iis = [], []
        for i in range(len(xs)):
            items = self.query_point(float(xs[i]), float(ys[i]))
            if len(items):
                pis.append(np.full(len(items), i, dtype=np.int64))
                iis.append(items)
        if not pis:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        return np.concatenate(pis), np.concatenate(iis)


# ---------------------------------------------------------------------------
# WKT (subset: POLYGON with one outer ring) — for boundary export / fixtures
# ---------------------------------------------------------------------------

def ring_to_wkt(ring: np.ndarray) -> str:
    pts = ", ".join(f"{x:.9f} {y:.9f}" for x, y in ring)
    first = ring[0]
    return f"POLYGON (({pts}, {first[0]:.9f} {first[1]:.9f}))"


def wkt_to_ring(wkt: str) -> np.ndarray:
    """Parse the single outer ring of a POLYGON wkt (closing vertex dropped)."""
    inner = wkt[wkt.index("((") + 2 : wkt.rindex("))")]
    pts = [tuple(map(float, p.split())) for p in inner.split(",")]
    if pts[0] == pts[-1]:
        pts = pts[:-1]
    return np.asarray(pts, dtype=np.float64)
