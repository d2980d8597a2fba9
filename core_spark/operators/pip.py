"""G5 — point-in-polygon join: broadcast STRtree + ray-cast refinement.

Plan shape (SURVEY.md G5): the polygon side (admin boundaries, 10^2..10^5
rows) is tiny next to 10^12 documents, so it is broadcast — zero shuffle on
the document side, the join runs map-side inside one Arrow stage:

    docs --(mapInPandas, Arrow batches)--> [envelope STRtree probe]
                                           [ray-cast refine on candidates]
         --> (key_cols..., lat, lon, admin_id)

The STRtree is built ONCE PER EXECUTOR PROCESS from the broadcast polygon
payload (lazy module-global keyed by payload fingerprint — the analog of the
reference's compiled-query cache, pkg/parser/tspool/query.go:33-66, and its
one-grammar-init-per-process discipline, pool.go:60-76).

Scale notes:
  * No shuffle, no skew sensitivity: mega-cell documents distribute over
    whatever partitioning the scan produced. AQE has nothing to fix here.
  * Cost per row is O(log P + c) envelope probes + c ray casts with c the
    candidate count (≤1 for non-overlapping admin tiers).
  * If the polygon side ever outgrows broadcast (continent-scale cadastral
    data), the escape hatch is the cell-prefix range join (SURVEY.md §4) —
    not needed at admin-boundary cardinality.

Unmatched documents keep admin_id NULL (left join semantics, error-as-data).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from core_spark.functions.geometry import STRtree, points_in_ring

# executor-global tree cache: {fingerprint: (tree, rings, admin_ids)}
_TREE_CACHE: dict[int, tuple] = {}


def _fingerprint(payload) -> int:
    """Content hash of the polygon payload — computed once on the driver so
    every task of every stage maps to the same executor-side cache entry."""
    import zlib

    return zlib.crc32(repr(payload).encode()) & 0xFFFFFFFF


def _normalize_entry(rings) -> list[np.ndarray]:
    """Accept one ring (list of (x, y)) or several (list of rings)."""
    first = rings[0]
    if isinstance(first, (tuple, list)) and len(first) == 2 and not isinstance(
        first[0], (tuple, list)
    ):
        return [np.asarray(rings, dtype=np.float64)]
    return [np.asarray(r, dtype=np.float64) for r in rings]


def _build(payload: list[tuple[int, list]], key: int):
    """payload: [(admin_id, ring | [outer, hole...])] -> (tree, rings, ids).

    Multi-ring polygons use even-odd parity (crossings XOR across rings), so
    holes fall out of the same ray-cast rule. Antimeridian-crossing polygons
    are pre-split at ingestion into two fragments sharing one admin_id —
    duplicate ids in the payload are deliberate and handled by the
    first-only tie-break (identical id either way).
    """
    hit = _TREE_CACHE.get(key)
    if hit is not None:
        return hit
    ringsets = [_normalize_entry(r) for _, r in payload]
    ids = np.asarray([a for a, _ in payload], dtype=np.int64)
    boxes = np.empty((len(ringsets), 4), dtype=np.float64)
    for i, rs in enumerate(ringsets):
        outer = rs[0]
        boxes[i, 0] = outer[:, 0].min()
        boxes[i, 1] = outer[:, 1].min()
        boxes[i, 2] = outer[:, 0].max()
        boxes[i, 3] = outer[:, 1].max()
    built = (STRtree(boxes), ringsets, ids)
    _TREE_CACHE.clear()  # one active polygon set per executor
    _TREE_CACHE[key] = built
    return built


def match_points(
    lons: np.ndarray,
    lats: np.ndarray,
    payload: list[tuple[int, list[tuple[float, float]]]],
    first_only: bool = True,
    fp: int | None = None,
) -> np.ndarray:
    """Pure kernel: point arrays -> admin_id per point (-1 = no match).

    ``first_only`` keeps the lowest admin_id when polygons overlap —
    a deterministic tie-break (reference analog: deepest-config tie-break,
    pkg/parser/detection/detector.go:213-230).
    """
    tree, rings, ids = _build(payload, fp if fp is not None else _fingerprint(payload))
    out = np.full(len(lons), -1, dtype=np.int64)
    lons = np.asarray(lons, np.float64)
    lats = np.asarray(lats, np.float64)
    if len(rings) <= 512:
        # dense vectorized envelope test: an (n_pts x n_polys) comparison is
        # one numpy kernel and beats a per-point Python tree descent by ~8x
        # at admin-boundary cardinality (profiled). STRtree remains the path
        # for large polygon sets.
        boxes = tree.dense_boxes
        hit = (
            (lons[:, None] >= boxes[None, :, 0])
            & (lons[:, None] <= boxes[None, :, 2])
            & (lats[:, None] >= boxes[None, :, 1])
            & (lats[:, None] <= boxes[None, :, 3])
        )
        pi, ii = np.nonzero(hit)
    else:
        pi, ii = tree.query_points(lons, lats)
    if len(pi) == 0:
        return out
    # group candidate pairs by polygon -> one vectorized ray-cast per polygon
    order = np.argsort(ii, kind="stable")
    pi, ii = pi[order], ii[order]
    starts = np.flatnonzero(np.r_[True, ii[1:] != ii[:-1]])
    bounds = np.r_[starts, len(ii)]
    for s, e in zip(bounds[:-1], bounds[1:]):
        poly = int(ii[s])
        pts = pi[s:e]
        inside = np.zeros(len(pts), dtype=bool)
        for ring in rings[poly]:  # even-odd across outer + holes
            inside ^= points_in_ring(lons[pts], lats[pts], ring)
        hit_pts = pts[inside]
        aid = int(ids[poly])
        if first_only:
            cur = out[hit_pts]
            out[hit_pts] = np.where((cur == -1) | (aid < cur), aid, cur)
        else:
            out[hit_pts] = aid
    return out


def pip_join(
    df,
    polygons: pd.DataFrame,
    lat_col: str = "lat",
    lon_col: str = "lon",
    keep_unmatched: bool = True,
):
    """Append ``admin_id`` (long, NULL if outside every polygon) to ``df``.

    ``polygons``: pandas DataFrame with columns (admin_id, ring) — collected
    on the driver (small side) and shipped inside the UDF closure, which Spark
    broadcasts with the task binary exactly once per executor.
    """
    payload = [(int(r.admin_id), [list(ring) for ring in r.rings]) for r in polygons.itertuples()]
    fp = _fingerprint(payload)
    fields = ", ".join(f.name + " " + f.dataType.simpleString() for f in df.schema.fields)
    out_schema = fields + ", admin_id bigint"

    def run(batches):
        for pdf in batches:
            lats = pdf[lat_col].to_numpy(dtype=np.float64)
            lons = pdf[lon_col].to_numpy(dtype=np.float64)
            aid = match_points(lons, lats, payload, fp=fp)
            out = pdf.copy()
            out["admin_id"] = pd.array(
                [None if a == -1 else int(a) for a in aid], dtype="Int64"
            )
            yield out

    joined = df.mapInPandas(run, out_schema)
    if not keep_unmatched:
        joined = joined.filter(joined.admin_id.isNotNull())
    return joined


def sql_pip_parity_join(points_sql: str, edges_sql: str) -> str:
    """Oracle-side plan as one ANSI SQL string (runs on DuckDB and Spark):

    points x edges -> crossing predicate -> odd parity per (point, polygon).
    Quadratic in (points * edges) — fine for fixtures; the Spark operator is
    the scale path.
    """
    from core_spark.functions.geometry import sql_ray_cast_crossing

    crossing = sql_ray_cast_crossing("p.lon", "p.lat", "e.ax", "e.ay", "e.bx", "e.by")
    return f"""
SELECT p.pt_id, e.admin_id
FROM ({points_sql}) p
JOIN ({edges_sql}) AS e(admin_id, ax, ay, bx, by)
  ON {crossing}
GROUP BY p.pt_id, e.admin_id
HAVING (COUNT(*) % 2) = 1
"""
