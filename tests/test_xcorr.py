"""Cross-correlation: Python-model parity on both engines, planted
lead detection, negative lags, constant-series NULL, no-overlap,
hygiene."""

from __future__ import annotations

import math

import duckdb
import pytest

from core_spark.operators.xcorr import (
    cross_correlation,
    sql_cross_correlation,
)

LAGS = (-1, 0, 1, 2)


def model(rows, key_a="a", key_b="b", lags=LAGS):
    buckets = {}
    for k, t, x in rows:
        if k is None or t is None or x is None or k not in (key_a, key_b):
            continue
        buckets.setdefault(k, {})
        buckets[k][t] = buckets[k].get(t, 0) + x
    sa = buckets.get(key_a, {})
    sb = buckets.get(key_b, {})
    out = {}
    for lag in lags:
        pairs = [(sa[t], sb[t + lag]) for t in sa if t + lag in sb]
        m = len(pairs)
        sx = sum(p[0] for p in pairs)
        sy = sum(p[1] for p in pairs)
        sxy = sum(p[0] * p[1] for p in pairs)
        sxx = sum(p[0] * p[0] for p in pairs)
        syy = sum(p[1] * p[1] for p in pairs)
        dx = float(m) * float(sxx) - float(sx) * float(sx)
        dy = float(m) * float(syy) - float(sy) * float(sy)
        r = (
            (float(m) * float(sxy) - float(sx) * float(sy))
            / math.sqrt(dx * dy)
            if m >= 2 and dx > 0.0 and dy > 0.0 else None
        )
        out[lag] = (m, sx, sy, sxy, sxx, syy, r)
    return out


# b(t) = a(t-2) pattern: CCF peaks exactly at lag 2
A = [("a", t, [3, 1, 4, 1, 5, 9, 2, 6][t % 8]) for t in range(24)]
B = [("b", t + 2, [3, 1, 4, 1, 5, 9, 2, 6][t % 8]) for t in range(24)]
NOISE = [("c", 1, 99), ("a", None, 1), ("a", 1, None), (None, 1, 1)]
ROWS = A + B + NOISE


def test_model_hand_checks():
    m = model(ROWS)
    assert m[2][6] == 1.0                     # exact planted lead
    assert m[2][0] == 24                      # full overlap at the lead
    assert m[0][6] is not None and m[0][6] < 1.0
    assert m[-1][6] is not None


def test_constant_and_empty_margins():
    rows = [("a", t, 5) for t in range(6)] + [("b", t, t) for t in range(6)]
    m = model(rows)
    assert all(v[6] is None for v in m.values())   # constant a -> NULL
    m2 = model([("a", 1, 1), ("b", 100, 1)])
    assert m2[0] == (0, 0, 0, 0, 0, 0, None)       # no overlap


def _vals(rows):
    sql_rows = ", ".join(
        "(" + ", ".join(
            "NULL" if v is None else (f"'{v}'" if isinstance(v, str) else str(v))
            for v in r) + ")"
        for r in rows
    )
    return f"SELECT * FROM (VALUES {sql_rows}) t(key, t, x)"


def test_duckdb_twin_matches_model():
    got = {
        r[0]: tuple(r[1:])
        for r in duckdb.sql(
            sql_cross_correlation(_vals(ROWS), "a", "b", LAGS)).fetchall()
    }
    assert got == model(ROWS)


@pytest.mark.spark
def test_spark_matches_model(spark):
    df = spark.createDataFrame(ROWS, "key string, t long, x long")
    got = {
        r["lag"]: (r["m_pairs"], r["sx"], r["sy"], r["sxy"],
                   r["sxx"], r["syy"], r["ccf"])
        for r in cross_correlation(df, "a", "b", LAGS).collect()
    }
    assert got == model(ROWS)


@pytest.mark.spark
def test_engines_bit_identical(spark):
    rows = [("a", t, (t * 7) % 13) for t in range(80)] + [
        ("b", t, (t * t) % 11) for t in range(80)]
    df = spark.createDataFrame(rows, "key string, t long, x long")
    srows = sorted(
        tuple(r)
        for r in cross_correlation(df, "a", "b", (0, 3, -3)).collect())
    orows = sorted(
        tuple(r)
        for r in duckdb.sql(sql_cross_correlation(
            _vals(rows), "a", "b", (0, 3, -3))).fetchall())
    assert srows == orows


@pytest.mark.spark
def test_empty_and_validation(spark):
    empty = spark.createDataFrame([], "key string, t long, x long")
    rows = cross_correlation(empty, "a", "b", (0, 1)).collect()
    assert sorted((r["lag"], r["m_pairs"], r["ccf"]) for r in rows) == [
        (0, 0, None), (1, 0, None)]
    with pytest.raises(ValueError):
        cross_correlation(empty, "a", "b", ())
    with pytest.raises(ValueError):
        cross_correlation(empty, "a", "b", (1, 1))
