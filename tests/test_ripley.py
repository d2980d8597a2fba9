"""Ripley's K: Python-model parity on both engines, CSR-parabola
sanity, clustered-vs-dispersed discrimination, densified empty bins,
hygiene arms."""

from __future__ import annotations

import math

import duckdb
import pytest

from core_spark.operators.ripley import ripley_k, sql_ripley_k

LAG, BINS, AREA = 0.25, 4, 16.0


def model(pts, lag=LAG, n_bins=BINS, area=AREA):
    """Mirror of the shared scoring algebra (same IEEE op sequence)."""
    clean = [(k, la, lo) for k, la, lo in pts
             if k is not None and la is not None and lo is not None]
    n = len(clean)
    r = lag * n_bins
    counts = [0] * n_bins
    for i in range(n):
        for j in range(i + 1, n):
            _, la1, lo1 = clean[i]
            _, la2, lo2 = clean[j]
            d2 = (la1 - la2) * (la1 - la2) + (lo1 - lo2) * (lo1 - lo2)
            if not d2 < r * r:
                continue
            micro = math.floor(d2 * 1000000)
            b = math.floor(math.sqrt(float(micro)) / (lag * 1000.0))
            if b < n_bins:
                counts[int(b)] += 1
    out, cum = [], 0
    for b in range(n_bins):
        cum += counts[b]
        khat = (
            (area * 2.0 * float(cum)) / (float(n) * float(n - 1))
            if n >= 2 else None
        )
        out.append((b, float(b + 1) * lag, counts[b], cum, n, khat))
    return out


def _vals(pts):
    rows = ", ".join(
        "(" + ", ".join("NULL" if v is None else repr(v) for v in p) + ")"
        for p in pts
    )
    return f"SELECT * FROM (VALUES {rows}) t(doc_id, lat, lon)"


GRID = [(i, float(i % 5) * 0.2, float(i // 5) * 0.2) for i in range(25)]
HYGIENE = GRID + [(None, 0.1, 0.1), (100, None, 0.1), (101, 0.1, None)]


def test_model_sanity():
    rows = model(GRID)
    assert len(rows) == BINS
    assert rows[-1][3] == sum(r[2] for r in rows)          # cum = total
    assert all(rows[i][3] <= rows[i + 1][3] for i in range(BINS - 1))
    assert rows[0][2] > 0                                   # near pairs live
    # K is non-decreasing in r
    ks = [r[5] for r in rows]
    assert all(a <= b for a, b in zip(ks, ks[1:]))


def test_clustered_exceeds_dispersed():
    # two tight clumps vs the same 10 points spread far apart: the
    # clumped pattern must dominate K at short range
    clumped = [(i, 0.01 * (i % 5), 0.0 if i < 5 else 3.0) for i in range(10)]
    spread = [(i, float(i), float(i)) for i in range(10)]
    k_c = model(clumped, area=9.0)[0][5]
    k_s = model(spread, area=9.0)[0][5]
    assert k_c > k_s == 0.0


def test_duckdb_twin_matches_model():
    got = sorted(duckdb.sql(
        sql_ripley_k(_vals(HYGIENE), LAG, BINS, AREA)).fetchall())
    assert [tuple(r) for r in got] == model(HYGIENE)


@pytest.mark.spark
def test_spark_matches_model(spark):
    df = spark.createDataFrame(
        HYGIENE, "doc_id long, lat double, lon double")
    got = sorted(
        tuple(r) for r in ripley_k(df, LAG, BINS, AREA).collect())
    assert got == model(HYGIENE)


@pytest.mark.spark
def test_engines_bit_identical(spark):
    pts = [(i, (i % 16) * 0.125, ((i * 7) % 16) * 0.125)
           for i in range(200)]
    df = spark.createDataFrame(pts, "doc_id long, lat double, lon double")
    srows = sorted(tuple(r) for r in ripley_k(df, LAG, BINS, 4.0).collect())
    orows = sorted(
        tuple(r)
        for r in duckdb.sql(sql_ripley_k(_vals(pts), LAG, BINS, 4.0))
        .fetchall()
    )
    assert srows == orows


@pytest.mark.spark
def test_empty_and_singleton_null_khat(spark):
    empty = spark.createDataFrame([], "doc_id long, lat double, lon double")
    rows = sorted(
        tuple(r) for r in ripley_k(empty, LAG, BINS, AREA).collect())
    assert rows == [(b, (b + 1) * LAG, 0, 0, 0, None) for b in range(BINS)]
    solo = spark.createDataFrame(
        [(1, 0.0, 0.0)], "doc_id long, lat double, lon double")
    rows = ripley_k(solo, LAG, BINS, AREA).collect()
    assert all(r["khat"] is None and r["n_points"] == 1 for r in rows)


def test_validation():
    for bad in ((0.0, BINS, AREA), (LAG, 0, AREA), (LAG, BINS, 0.0)):
        with pytest.raises(ValueError):
            ripley_k(None, *bad)
