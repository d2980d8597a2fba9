"""Spatial capstone chain: snap -> distinct matched -> density -> Gi*,
integration-gated against a model composed from the PIECES' models."""

from __future__ import annotations

import math

from core_spark.operators.moran import cell_counts, getis_ord_gi
from core_spark.operators.snap import snap_join

from tests.test_snap import _dist2_leq


def _model_chain(pings, roads, eps, g):
    matched = [
        (px, py)
        for (pid, px, py) in pings
        if any(_dist2_leq(px, py, x1, y1, x2, y2, eps)
               for (_, x1, y1, x2, y2) in roads)
    ]
    cells = {}
    for px, py in matched:
        key = (math.floor(px / g), math.floor(py / g))
        cells[key] = cells.get(key, 0) + 1
    n = len(cells)
    s = sum(cells.values())
    q = sum(v * v for v in cells.values())
    out = {}
    for (cx, cy), x in cells.items():
        hood = [cells[(cx + dx, cy + dy)]
                for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                if (cx + dx, cy + dy) in cells]
        gsum, k = sum(hood), len(hood)
        a, b = n * q - s * s, k * (n - k)
        z = (float(n * gsum - k * s)
             / math.sqrt(float(a) * float(b) / float(n - 1))
             if n > 1 and a > 0 and b > 0 else None)
        out[(cx, cy)] = (x, gsum, k, z)
    return out


def test_chain_matches_composed_model(spark):
    # pings on a residue scatter, two roads crossing the frame; a ping
    # near BOTH roads must count once (the DISTINCT is load-bearing)
    pings = [(i, (i * 5) % 17 - 2, (i * 7) % 13 - 1) for i in range(120)]
    roads = [(0, 0, 0, 12, 0), (1, 3, -3, 3, 9)]
    eps, cell, g = 2, 4.0, 3.0

    p = spark.createDataFrame(pings, "pt_id long, x long, y long")
    r = spark.createDataFrame(
        roads, "seg_id long, x1 long, y1 long, x2 long, y2 long")
    matched = snap_join(p, r, eps=eps, cell=cell).select("pt").distinct()
    mp = p.join(matched, p.pt_id == matched.pt).selectExpr(
        "CAST(y AS DOUBLE) AS lat", "CAST(x AS DOUBLE) AS lon")
    got = {(row["cx"], row["cy"]):
           (row["x"], row["nbr_sum"], row["nbr_cnt"], row["gi_z"])
           for row in getis_ord_gi(cell_counts(mp, g)).collect()}

    want = _model_chain(pings, roads, eps, g)
    assert set(got) == set(want)
    for key, (x, gsum, k, z) in want.items():
        assert got[key][:3] == (x, gsum, k)
        if z is None:
            assert got[key][3] is None
        else:
            assert abs(got[key][3] - z) < 1e-12

    # sanity: the double-match ping population is non-trivial
    n_matched = sum(
        1 for (pid, px, py) in pings
        if sum(_dist2_leq(px, py, *rd[1:], eps) for rd in roads) == 2)
    assert n_matched > 0
