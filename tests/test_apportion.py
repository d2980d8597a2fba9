"""Hamilton apportionment: exact-sum invariant, ties, edges, parity."""

from __future__ import annotations

import duckdb
import pytest

from core_spark.operators.apportion import (
    apportion_budget,
    sql_apportion_budget,
)

ROWS = [("a", 37), ("b", 211), ("c", 52), ("d", 700), ("e", 0),
        ("f", 52), ("g", None)]  # c/f: remainder tie -> key asc wins


def model(rows, b):
    m = [(k, v) for k, v in rows if v is not None and v >= 0]
    mtot = sum(v for _, v in m)
    if mtot == 0:
        return {k: (v, 0, 0, 0) for k, v in m}
    q = {k: ((b * v) // mtot, (b * v) % mtot) for k, v in m}
    r = b - sum(base for base, _ in q.values())
    order = sorted(m, key=lambda kv: (-q[kv[0]][1], kv[0]))
    extras = {k for k, _ in order[:r]}
    return {
        k: (v, q[k][0], 1 if k in extras else 0,
            q[k][0] + (1 if k in extras else 0))
        for k, v in m
    }


@pytest.mark.parametrize("b", [0, 1, 7, 100, 1052, 9999])
def test_model_sums_exactly(b):
    got = model(ROWS, b)
    assert sum(v[3] for v in got.values()) == b
    # never off the real quota by >= 1 (Hamilton property)
    mtot = sum(v for _, v in ROWS if v is not None)
    for k, (mass, _, _, alloc) in got.items():
        assert abs(alloc - b * mass / mtot) < 1


def _vals():
    rows = ", ".join(
        f"('{k}', " + ("NULL" if v is None else str(v)) + ")"
        for k, v in ROWS
    )
    return f"SELECT * FROM (VALUES {rows}) t(stratum, mass)"


@pytest.mark.parametrize("b", [0, 7, 100, 1052])
def test_duckdb_twin_matches_model(b):
    got = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in duckdb.sql(
            sql_apportion_budget(_vals(), b, ["stratum"])).fetchall()
    }
    assert got == model(ROWS, b)


def test_duckdb_all_zero_mass_allocates_nothing():
    got = duckdb.sql(sql_apportion_budget(
        "SELECT 'x' AS stratum, 0 AS mass", 10, ["stratum"])).fetchall()
    assert got == [("x", 0, 0, 0, 0)]


@pytest.mark.spark
@pytest.mark.parametrize("b", [7, 100, 1052])
def test_spark_matches_model(spark, b):
    df = spark.createDataFrame(ROWS, "stratum string, mass long")
    got = {
        r["stratum"]: (r["mass"], r["base"], r["extra"], r["alloc"])
        for r in apportion_budget(df, b, ["stratum"]).collect()
    }
    assert got == model(ROWS, b)


@pytest.mark.spark
def test_spark_multi_key_and_tie_break(spark):
    rows = [(0, 0, 10), (0, 1, 10), (1, 0, 10)]  # all remainders tie at b=1
    df = spark.createDataFrame(rows, "cx long, cy long, mass long")
    got = {
        (r["cx"], r["cy"]): r["alloc"]
        for r in apportion_budget(df, 1, ["cx", "cy"]).collect()
    }
    assert got == {(0, 0): 1, (0, 1): 0, (1, 0): 0}
    oracle = {
        (r[0], r[1]): r[4]
        for r in duckdb.sql(sql_apportion_budget(
            "SELECT * FROM (VALUES (0, 0, 10), (0, 1, 10), (1, 0, 10))"
            " t(cx, cy, mass)", 1, ["cx", "cy"])).fetchall()
    }
    assert oracle == got


def test_rejects_bad_params():
    with pytest.raises(ValueError):
        apportion_budget(None, -1, ["k"])
    with pytest.raises(ValueError):
        apportion_budget(None, 1, [])
