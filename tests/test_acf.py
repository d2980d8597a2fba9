"""Sample ACF: Python-model parity on both engines, planted
periodicity detection, constant-series NULL, sparse-gap semantics,
guard, hygiene."""

from __future__ import annotations

import duckdb
import pytest

from core_spark.operators.acf import acf, sql_acf

LAGS = (1, 2, 4)


def model(rows, lags=LAGS):
    groups = {}
    for k, t, x in rows:
        if k is None or t is None or x is None:
            continue
        groups.setdefault(k, {})
        groups[k][t] = groups[k].get(t, 0) + x
    out = {}
    for k, buckets in groups.items():
        n = len(buckets)
        s = sum(buckets.values())
        d = {t: n * x - s for t, x in buckets.items()}
        den = sum(v * v for v in d.values())
        for lag in lags:
            pairs = [(d[t], d[t + lag]) for t in d if t + lag in d]
            num = sum(a * b for a, b in pairs)
            out[(k, lag)] = (
                n, len(pairs), num, den,
                (num / den) if den else None,
            )
    return out


ROWS = (
    # per4: period-4 sawtooth over 16 buckets — r_4 = 1-ish, r_2 < 0
    [("per4", t, [1, 5, 9, 5][t % 4]) for t in range(16)]
    # flat: constant -> den 0 -> NULL acf at every lag
    + [("flat", t, 3) for t in range(6)]
    # gap: buckets 0,1,2,10 — lag 1 pairs only inside the run
    + [("gap", t, v) for t, v in ((0, 1), (1, 4), (2, 2), (10, 9))]
    + [("h", None, 1), ("h", 1, None), (None, 1, 1)]
)


def test_model_hand_checks():
    m = model(ROWS)
    # the planted period dominates (0.75 = perfect correlation times
    # the standard (n-k)/n ACF taper at k=4, n=16)
    assert m[("per4", 4)][4] == 0.75
    assert m[("per4", 2)][4] < 0              # anti-phase at half period
    for lag in LAGS:
        assert m[("flat", lag)][4] is None    # constant -> NULL
    assert m[("gap", 1)][1] == 2              # only 0-1, 1-2 pair up
    assert m[("gap", 4)][1] == 0              # no pair at distance 4
    assert ("h", 1) not in m


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
        (r[0], r[1]): tuple(r[2:])
        for r in duckdb.sql(sql_acf(_vals(ROWS), LAGS)).fetchall()
    }
    assert got == model(ROWS)


@pytest.mark.spark
def test_spark_matches_model(spark):
    df = spark.createDataFrame(ROWS, "key string, t long, x long")
    got = {
        (r["key"], r["lag"]): (r["n_points"], r["n_pairs"], r["num"],
                               r["den"], r["acf"])
        for r in acf(df, LAGS).collect()
    }
    assert got == model(ROWS)


@pytest.mark.spark
def test_engines_bit_identical(spark):
    rows = [
        (f"g{i % 3}", i // 3, ((i // 3) % 7) * 2 + (i % 3))
        for i in range(600)
    ]
    df = spark.createDataFrame(rows, "key string, t long, x long")
    srows = sorted(tuple(r) for r in acf(df, (1, 7)).collect())
    orows = sorted(
        tuple(r)
        for r in duckdb.sql(sql_acf(_vals(rows), (1, 7))).fetchall()
    )
    assert srows == orows


@pytest.mark.spark
def test_guard_and_validation(spark):
    big = spark.createDataFrame(
        [("k", t, 2_000_000_000) for t in range(4)] + [("k", 4, 0)],
        "key string, t long, x long")
    with pytest.raises(Exception, match="overflows the int64"):
        acf(big, (1,)).collect()
    ok = spark.createDataFrame([("k", 0, 1)], "key string, t long, x long")
    for bad in ((), (0,), (1, 1)):
        with pytest.raises(ValueError):
            acf(ok, bad)


@pytest.mark.spark
def test_empty(spark):
    empty = spark.createDataFrame([], "key string, t long, x long")
    assert acf(empty, (1,)).count() == 0
