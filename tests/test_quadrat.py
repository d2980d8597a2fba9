"""Quadrat VMR: Python-model parity on both engines, CSR~1 /
clustered / regular regimes, outside-window audit, hygiene."""

from __future__ import annotations

import duckdb
import pytest

from core_spark.operators.quadrat import (
    quadrat_dispersion,
    sql_quadrat_dispersion,
)

ARGS = dict(lat0=0.0, lon0=0.0, cell=1.0, nx=4, ny=4)


def model(pts, lat0=0.0, lon0=0.0, cell=1.0, nx=4, ny=4):
    import math

    counts = {}
    outside = 0
    for la, lo in pts:
        if la is None or lo is None:
            outside += 1
            continue
        ix = math.floor((la - lat0) / cell)
        iy = math.floor((lo - lon0) / cell)
        if 0 <= ix < nx and 0 <= iy < ny:
            k = ix * ny + iy
            counts[k] = counts.get(k, 0) + 1
        else:
            outside += 1
    n_cells = nx * ny
    t = sum(counts.values())
    ssq = sum(c * c for c in counts.values())
    num = n_cells * ssq - t * t
    den = n_cells * t
    vmr = (num / den) if t else None
    return (n_cells, t, len(counts), outside, ssq, num, den, vmr)


REGULAR = [(0.5 + i, 0.5 + j) for i in range(4) for j in range(4)]
CLUSTERED = [(0.1 + 0.01 * k, 0.1 + 0.01 * k) for k in range(16)]
MESSY = REGULAR + [(5.0, 0.5), (-1.0, 0.5), (None, 1.0), (1.0, None)]


def test_model_regimes():
    # one point per cell -> variance 0 -> VMR 0 (maximal regularity)
    assert model(REGULAR)[7] == 0.0
    # all 16 points in one cell -> VMR = (16*256-256)/(16*16) = 15
    assert model(CLUSTERED)[7] == 15.0
    n_cells, t, occ, outside, *_ = model(MESSY)
    assert (t, occ, outside) == (16, 16, 4)


def _vals(pts):
    rows = ", ".join(
        "(" + ", ".join("NULL" if v is None else repr(v) for v in p) + ")"
        for p in pts
    )
    return f"SELECT * FROM (VALUES {rows}) t(lat, lon)"


def test_duckdb_twin_matches_model():
    for pts in (REGULAR, CLUSTERED, MESSY):
        got = duckdb.sql(
            sql_quadrat_dispersion(_vals(pts), **ARGS)).fetchall()[0]
        assert tuple(got) == model(pts)


@pytest.mark.spark
def test_spark_matches_model(spark):
    for pts in (REGULAR, CLUSTERED, MESSY):
        df = spark.createDataFrame(pts, "lat double, lon double")
        got = tuple(quadrat_dispersion(df, **ARGS).collect()[0])
        assert got == model(pts)


@pytest.mark.spark
def test_engines_bit_identical(spark):
    pts = [((i * 7 % 23) * 0.17, (i * 13 % 19) * 0.21)
           for i in range(500)]
    df = spark.createDataFrame(pts, "lat double, lon double")
    srow = tuple(quadrat_dispersion(df, **ARGS).collect()[0])
    orow = tuple(duckdb.sql(
        sql_quadrat_dispersion(_vals(pts), **ARGS)).fetchall()[0])
    assert srow == orow


@pytest.mark.spark
def test_empty_and_validation(spark):
    empty = spark.createDataFrame([], "lat double, lon double")
    row = tuple(quadrat_dispersion(empty, **ARGS).collect()[0])
    assert row == (16, 0, 0, 0, 0, 0, 0, None)
    with pytest.raises(ValueError):
        quadrat_dispersion(empty, 0.0, 0.0, 0.0, 4, 4)
    with pytest.raises(ValueError):
        quadrat_dispersion(empty, 0.0, 0.0, 1.0, 0, 4)
