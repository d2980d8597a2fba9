"""Kendall tau-b: Python-model parity on both engines, textbook hand
values (perfect/inverted/tied arms), constant-column NULL, guard,
hygiene."""

from __future__ import annotations

import math

import duckdb
import pytest

from core_spark.operators.kendall import kendall_tau, sql_kendall_tau


def model(rows):
    groups = {}
    for k, x, y in rows:
        if k is None or x is None or y is None:
            continue
        groups.setdefault(k, []).append((x, y))
    out = {}
    for k, pts in groups.items():
        n = len(pts)
        if n < 2:
            continue
        cd = tx = ty = 0
        for i in range(n):
            for j in range(i + 1, n):
                dx, dy = pts[i][0] - pts[j][0], pts[i][1] - pts[j][1]
                sx = 1 if dx > 0 else (-1 if dx < 0 else 0)
                sy = 1 if dy > 0 else (-1 if dy < 0 else 0)
                cd += sx * sy
                tx += dx == 0
                ty += dy == 0
        n0 = n * (n - 1) // 2
        tau = (
            float(cd) / math.sqrt(float(n0 - tx) * float(n0 - ty))
            if n0 > tx and n0 > ty else None
        )
        out[k] = (n, n0, cd, tx, ty, tau)
    return out


ROWS = [
    ("up", 1, 10), ("up", 2, 20), ("up", 3, 30), ("up", 4, 40),
    ("down", 1, 9), ("down", 2, 7), ("down", 3, 5),
    ("tied", 1, 1), ("tied", 1, 2), ("tied", 2, 2), ("tied", 3, 2),
    ("flat", 5, 1), ("flat", 5, 2), ("flat", 5, 3),   # constant x
    ("solo", 7, 7),                                    # absent (n=1)
    ("h", None, 1), ("h", 1, None), (None, 1, 1),      # dropped
]


def test_model_hand_checks():
    m = model(ROWS)
    assert m["up"] == (4, 6, 6, 0, 0, 1.0)
    assert m["down"] == (3, 3, -3, 0, 0, -1.0)
    n, n0, cd, tx, ty, tau = m["tied"]
    assert (n, n0, cd, tx, ty) == (4, 6, 2, 1, 3)
    assert tau == 2.0 / math.sqrt(5.0 * 3.0)
    assert m["flat"][5] is None                     # constant x -> NULL
    assert "solo" not in m and "h" not in m and None not in m


def _vals(rows):
    sql_rows = ", ".join(
        "(" + ", ".join(
            "NULL" if v is None else (f"'{v}'" if isinstance(v, str) else str(v))
            for v in r) + ")"
        for r in rows
    )
    return f"SELECT * FROM (VALUES {sql_rows}) t(key, x, y)"


def test_duckdb_twin_matches_model():
    got = {
        r[0]: tuple(r[1:])
        for r in duckdb.sql(sql_kendall_tau(_vals(ROWS))).fetchall()
    }
    assert got == model(ROWS)


@pytest.mark.spark
def test_spark_matches_model(spark):
    df = spark.createDataFrame(ROWS, "key string, x long, y long")
    got = {
        r["key"]: (r["n_points"], r["n0"], r["cd"], r["n1"], r["n2"],
                   r["tau_b"])
        for r in kendall_tau(df).collect()
    }
    assert got == model(ROWS)


@pytest.mark.spark
def test_engines_bit_identical(spark):
    rows = [(f"g{i % 3}", (i * 7) % 23, (i * i) % 19) for i in range(240)]
    df = spark.createDataFrame(rows, "key string, x long, y long")
    srows = sorted(tuple(r) for r in kendall_tau(df).collect())
    orows = sorted(
        tuple(r)
        for r in duckdb.sql(sql_kendall_tau(_vals(rows))).fetchall()
    )
    assert srows == orows


@pytest.mark.spark
def test_guard_raises(spark):
    rows = [("g", i, i) for i in range(5)]
    df = spark.createDataFrame(rows, "key string, x long, y long")
    with pytest.raises(Exception, match="exceeds 3 points"):
        kendall_tau(df, max_points=3).collect()
    with pytest.raises(ValueError):
        kendall_tau(df, max_points=1)


@pytest.mark.spark
def test_empty(spark):
    empty = spark.createDataFrame([], "key string, x long, y long")
    assert kendall_tau(empty).count() == 0
