"""Focal kernel smoothing (KDE heatmap): hand geometry, boundary
strictness, cross-cell influence, hygiene, dual-engine parity vs an
independent Python model, and plan shape."""

from __future__ import annotations

import math

import duckdb
import pytest

from core_spark.operators.kde import (
    WSCALE_DEFAULT,
    kernel_heatmap,
    sql_kernel_heatmap,
)


def _model(pts, g, r, wscale=WSCALE_DEFAULT):
    """Independent reference: brute force over occupied cells."""
    valid = [
        (a, b, v) for a, b, v in pts
        if a is not None and b is not None and v is not None
        and not math.isnan(a) and not math.isnan(b)
        and abs(a) < 1e12 and abs(b) < 1e12
    ]
    cells = {(math.floor(a / g), math.floor(b / g)) for a, b, _ in valid}
    out = {}
    for ci, cj in cells:
        clat, clon = (ci + 0.5) * g, (cj + 0.5) * g
        n = ws = vs = 0
        for a, b, v in valid:
            d2 = (a - clat) ** 2 + (b - clon) ** 2
            if d2 < r * r:
                w = math.floor(wscale * (r * r - d2) / (r * r))
                n, ws, vs = n + 1, ws + w, vs + w * v
        sm = vs / ws if ws > 0 else None
        out[(ci, cj)] = (n, ws, vs, sm)
    return out


def _run_spark(spark, pts, g, r, wscale=WSCALE_DEFAULT):
    df = spark.createDataFrame(pts, "lat double, lon double, value int")
    rows = kernel_heatmap(df, g, r, wscale=wscale).collect()
    return {(x.cell_i, x.cell_j): (x.npts, x.wsum, x.vwsum, x.smoothed)
            for x in rows}


def _run_duck(pts, g, r, wscale=WSCALE_DEFAULT):
    con = duckdb.connect()
    con.execute("CREATE TABLE t(lat DOUBLE, lon DOUBLE, value INT)")
    con.executemany("INSERT INTO t VALUES (?,?,?)", pts)
    rows = con.execute(
        sql_kernel_heatmap("SELECT * FROM t", g, r, wscale=wscale)
    ).fetchall()
    return {(a, b): (c, d, e, f) for a, b, c, d, e, f in rows}


@pytest.mark.spark
def test_point_at_own_center(spark):
    # (4,4) IS the center of cell (0,0) at g=8: d²=0 → w = wscale
    got = _run_spark(spark, [(4.0, 4.0, 7)], 8.0, 16.0)
    assert got == {(0, 0): (1, WSCALE_DEFAULT, 7 * WSCALE_DEFAULT, 7.0)}


@pytest.mark.spark
def test_radius_boundary_is_strict(spark):
    # second point exactly r away from (0,0)'s center: excluded there,
    # but it occupies its own cell (2,0) where the first point is out
    # of range and it itself is 12-away in lat (d²=144<256).
    pts = [(4.0, 4.0, 3), (20.0, 4.0, 9)]
    got = _run_spark(spark, pts, 8.0, 16.0)
    assert got[(0, 0)][0] == 1 and got[(0, 0)][3] == 3.0
    assert got == _model(pts, 8.0, 16.0) == _run_duck(pts, 8.0, 16.0)


@pytest.mark.spark
def test_cross_cell_influence(spark):
    # neighbor-cell point 8 away (d²=64 < 256) raises npts to 2
    pts = [(4.0, 4.0, 0), (12.0, 4.0, 16)]
    got = _run_spark(spark, pts, 8.0, 16.0)
    assert got[(0, 0)][0] == 2 and got[(1, 0)][0] == 2
    w0, w8 = WSCALE_DEFAULT, math.floor(WSCALE_DEFAULT * (256 - 64) / 256)
    assert got[(0, 0)] == (2, w0 + w8, 16 * w8, 16 * w8 / (w0 + w8))


@pytest.mark.spark
def test_all_weights_quantize_to_zero(spark):
    # wscale=1: any d²>0 floors to w=0 → wsum can be 0 → smoothed NULL
    pts = [(1.0, 1.0, 5), (2.0, 2.0, 5)]
    got = _run_spark(spark, pts, 8.0, 16.0, wscale=1)
    (cell,) = set(got)
    npts, wsum, vwsum, sm = got[cell]
    assert npts == 2 and wsum == 0 and vwsum == 0 and sm is None
    assert got == _run_duck(pts, 8.0, 16.0, wscale=1)


@pytest.mark.spark
def test_hygiene_null_nan_inf(spark):
    pts = [(4.0, 4.0, 1), (float("nan"), 1.0, 1), (1.0, float("nan"), 1),
           (None, 1.0, 1), (1.0, None, 1), (1.0, 1.0, None),
           (float("inf"), 1.0, 1)]
    got = _run_spark(spark, pts, 8.0, 16.0)
    assert set(got) == {(0, 0)}
    # the (1,1) rows with NULL value are dropped entirely
    assert got[(0, 0)][0] == 1


@pytest.mark.spark
def test_validation(spark):
    df = spark.createDataFrame([(1.0, 1.0, 1)], "lat double, lon double, value int")
    with pytest.raises(ValueError):
        kernel_heatmap(df, cell_size=8.0, radius=4.0)  # r < g
    with pytest.raises(ValueError):
        kernel_heatmap(df, cell_size=0.0, radius=4.0)
    with pytest.raises(ValueError):
        kernel_heatmap(df, cell_size=1.0, radius=2.0, wscale=0)


@pytest.mark.spark
def test_parity_random_cloud(spark):
    import random

    rnd = random.Random(42)
    pts = [(float(rnd.randint(-60, 60)), float(rnd.randint(-60, 60)),
            rnd.randint(-5, 20)) for _ in range(250)]
    g, r = 8.0, 24.0
    got = _run_spark(spark, pts, g, r)
    assert got == _model(pts, g, r) == _run_duck(pts, g, r)


@pytest.mark.spark
def test_plan_no_cartesian_and_pinned(spark):
    df = spark.createDataFrame([(1.0, 1.0, 1)], "lat double, lon double, value int")
    plan = (kernel_heatmap(df, 8.0, 16.0)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Cartesian" not in plan, plan
    assert "BroadcastNestedLoop" not in plan, plan
