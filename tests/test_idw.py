"""IDW raster fill: Python-model parity both engines, hit dominance,
radius/guard edges."""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb
import pytest

from core_spark.operators.idw import idw_fill, sql_idw_fill

SCALE = 1_000_000_000

# scattered readings over a ~4x4 frame: a hot corner, a cold corner,
# an exact-hit probe at a future node center, hygiene NULLs
PTS = [
    (0.1, 0.1, 100), (0.3, 0.2, 90), (3.9, 3.8, 10), (3.6, 3.9, 20),
    (2.0, 2.0, 50), (1.5, 2.5, 60), (2.5, 1.5, 40),
    (None, 1.0, 5), (1.0, None, 5), (1.0, 1.0, None),
]


def model(pts, cell, radius):
    clean = [p for p in pts if all(v is not None for v in p)]
    if not clean:
        return {}
    lat0 = min(p[0] for p in clean)
    lat1 = max(p[0] for p in clean)
    lon0 = min(p[1] for p in clean)
    lon1 = max(p[1] for p in clean)
    nx = int(math.floor((lat1 - lat0) / cell))
    ny = int(math.floor((lon1 - lon0) / cell))
    r2m = int(radius * radius * 1_000_000)
    out = defaultdict(lambda: [0, 0, 0])
    for gi in range(nx + 1):
        for gj in range(ny + 1):
            glat = lat0 + (gi + 0.5) * cell
            glon = lon0 + (gj + 0.5) * cell
            for plat, plon, z in clean:
                d2m = math.floor(
                    ((glat - plat) ** 2 + (glon - plon) ** 2) * 1000000)
                if d2m >= r2m:
                    continue
                w = SCALE // (d2m + 1)
                e = out[(gi, gj, glat, glon)]
                e[0] += 1
                e[1] += w
                e[2] += w * z
    return {k: (n, w, wz, wz / w) for k, (n, w, wz) in out.items()}


def test_model_hand_checks():
    m = model(PTS, 1.0, 1.5)
    assert m, "some nodes must have in-radius points"
    # node nearest the hot corner estimates hot, near cold estimates cold
    keys = sorted(m)
    est = {(k[0], k[1]): v[3] for k, v in m.items()}
    assert est[(0, 0)] > 80 and est[(3, 3)] < 30
    assert keys[0][0] == 0


def _vals(pts):
    rows = ", ".join(
        "(" + ", ".join("NULL" if v is None else repr(v) for v in p) + ")"
        for p in pts
    )
    return f"SELECT * FROM (VALUES {rows}) t(lat, lon, value)"


@pytest.mark.parametrize("cell,radius", [(1.0, 1.5), (2.0, 1.0), (0.5, 0.7)])
def test_duckdb_twin_matches_model(cell, radius):
    got = {
        (r[0], r[1], r[2], r[3]): (r[4], r[5], r[6], r[7])
        for r in duckdb.sql(
            sql_idw_fill(_vals(PTS), cell, radius)).fetchall()
    }
    assert got == model(PTS, cell, radius)


@pytest.mark.spark
@pytest.mark.parametrize("cell,radius", [(1.0, 1.5), (0.5, 0.7)])
def test_spark_matches_model(spark, cell, radius):
    df = spark.createDataFrame(
        PTS, "lat double, lon double, value long")
    got = {
        (r["gi"], r["gj"], r["glat"], r["glon"]):
        (r["n_pts"], r["w_sum"], r["wz_sum"], r["est"])
        for r in idw_fill(df, cell, radius).collect()
    }
    assert got == model(PTS, cell, radius)


@pytest.mark.spark
def test_exact_hit_dominates(spark):
    # a point AT a node center (d2=0 -> w=scale) vs one far away: the
    # estimate must sit within a hair of the exact hit's value. bbox
    # 0..1, cell 1.0 -> node (0,0) center = (0.5, 0.5) exactly.
    df = spark.createDataFrame(
        [(0.0, 0.0, 7), (0.5, 0.5, 7), (1.0, 1.0, 1000)],
        "lat double, lon double, value long")
    rows = idw_fill(df, 1.0, 2.0).collect()
    node0 = [r for r in rows if (r["gi"], r["gj"]) == (0, 0)][0]
    assert node0["n_pts"] == 3
    assert abs(node0["est"] - 7) < 0.01


@pytest.mark.spark
def test_empty_and_guard(spark):
    empty = spark.createDataFrame([], "lat double, lon double, value long")
    assert idw_fill(empty, 1.0, 1.0).count() == 0
    wide = spark.createDataFrame(
        [(0.0, 0.0, 1), (10000.0, 10000.0, 2)],
        "lat double, lon double, value long")
    with pytest.raises(Exception, match="lattice exceeds"):
        idw_fill(wide, 0.001, 1.0, max_nodes=1000).count()


def test_rejects_bad_params():
    with pytest.raises(ValueError):
        idw_fill(None, 0.0, 1.0)
    with pytest.raises(ValueError):
        idw_fill(None, 1.0, -1.0)
    with pytest.raises(ValueError):
        idw_fill(None, 1.0, 1.0, scale=0)
