"""Variogram: Python-model parity on both engines, binning edges, guards."""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb
import pytest

from core_spark.operators.variogram import sql_variogram, variogram

# (doc_id, lat, lon, value): a 4x4 lattice spaced 2.0 with a linear
# trend value = 3*(row+col) + residue noise — gamma must RISE with lag
PTS = [
    (16 * 0 + i, float(2 * (i % 4)), float(2 * (i // 4)),
     3 * ((i % 4) + (i // 4)) + (i * 7) % 2)
    for i in range(16)
]
# hygiene rows: NULL value, NULL coordinate
PTS_H = PTS + [(100, 1.0, 1.0, None), (101, None, 3.0, 5)]


def model(pts, lag, n_bins):
    """Brute-force reference: quantized micro-distance binning, exactly
    the operator's documented semantics."""
    clean = [p for p in pts if all(v is not None for v in p)]
    out = defaultdict(lambda: [0, 0])
    r2 = (lag * n_bins) ** 2
    for i, (ka, alat, alon, va) in enumerate(clean):
        for kb, blat, blon, vb in clean[i + 1:]:
            d2 = (alat - blat) ** 2 + (alon - blon) ** 2
            if not d2 < r2:
                continue
            micro = math.floor(d2 * 1000000)
            b = int(math.floor(math.sqrt(micro) / (lag * 1000.0)))
            if b >= n_bins:
                continue
            out[b][0] += 1
            out[b][1] += (va - vb) ** 2
    return {b: (n, s, s / (2.0 * n)) for b, (n, s) in out.items()}


def test_model_hand_checks():
    m = model(PTS, 2.0, 4)
    # bin 0 = adjacent lattice neighbors (dist 2.0 quantizes just under
    # the edge: floor(sqrt(4e6)) = 2000 -> bin 1... verify which side)
    assert set(m) <= set(range(4))
    # autocorrelated trend: gamma strictly rises across observed bins
    gammas = [m[b][2] for b in sorted(m)]
    assert gammas == sorted(gammas)
    assert all(n > 0 for n, _, _ in m.values())


def _vals(pts):
    rows = ", ".join(
        "(" + ", ".join("NULL" if v is None else repr(v) for v in p) + ")"
        for p in pts
    )
    return (f"SELECT * FROM (VALUES {rows})"
            " t(doc_id, lat, lon, value)")


@pytest.mark.parametrize("pts,lag,n_bins", [
    (PTS, 2.0, 4), (PTS, 1.0, 8), (PTS_H, 2.5, 3),
])
def test_duckdb_twin_matches_model(pts, lag, n_bins):
    got = {
        r[0]: (r[1], r[2], r[3])
        for r in duckdb.sql(
            sql_variogram(_vals(pts), lag, n_bins)).fetchall()
    }
    assert got == model(pts, lag, n_bins)


@pytest.mark.spark
@pytest.mark.parametrize("pts,lag,n_bins", [(PTS, 2.0, 4), (PTS_H, 2.5, 3)])
def test_spark_matches_model(spark, pts, lag, n_bins):
    df = spark.createDataFrame(
        pts, "doc_id long, lat double, lon double, value long")
    got = {
        r["bin"]: (r["n_pairs"], r["sum_sqdiff"], r["gamma"])
        for r in variogram(df, lag, n_bins).collect()
    }
    assert got == model(pts, lag, n_bins)


@pytest.mark.spark
def test_edge_bin_exclusive(spark):
    # two points at exactly dist = lag·n_bins: outside the pair radius
    df = spark.createDataFrame(
        [(1, 0.0, 0.0, 5), (2, 0.0, 4.0, 9)],
        "doc_id long, lat double, lon double, value long")
    assert variogram(df, 2.0, 2).count() == 0
    # just inside: exactly one pair, top bin
    df2 = spark.createDataFrame(
        [(1, 0.0, 0.0, 5), (2, 0.0, 3.9, 9)],
        "doc_id long, lat double, lon double, value long")
    rows = variogram(df2, 2.0, 2).collect()
    assert len(rows) == 1 and rows[0]["bin"] == 1
    assert rows[0]["n_pairs"] == 1 and rows[0]["sum_sqdiff"] == 16
    assert rows[0]["gamma"] == 8.0


def test_rejects_bad_params():
    with pytest.raises(ValueError):
        variogram(None, 0.0, 4)
    with pytest.raises(ValueError):
        variogram(None, 2.0, 0)
