"""CUSUM changepoint: Python-model parity on both engines, planted
step detection, tie-break determinism, bucket pre-aggregation,
hygiene."""

from __future__ import annotations

import duckdb
import pytest

from core_spark.operators.changepoint import (
    cusum_changepoint,
    sql_cusum_changepoint,
)


def model(rows):
    groups = {}
    for k, t, x in rows:
        if k is None or t is None or x is None:
            continue
        groups.setdefault(k, {})
        groups[k][t] = groups[k].get(t, 0) + x
    out = {}
    for k, buckets in groups.items():
        pts = sorted(buckets.items())
        n = len(pts)
        if n < 2:
            continue
        total = sum(x for _, x in pts)
        best = None
        s = 0
        for i, (t, x) in enumerate(pts[:-1], start=1):
            s += x
            d = abs(n * s - i * total)
            if best is None or d > best[0] or (d == best[0] and t < best[1]):
                best = (d, t, i, s)
        d, t, i, s = best
        out[k] = (n, total, i, t, d, d / n, s / i, (total - s) / (n - i))
    return out


ROWS = [
    # step: level 2 for 4 buckets, then level 10 — split after t=4
    *[("step", t, 2) for t in range(1, 5)],
    *[("step", t, 10) for t in range(5, 9)],
    # spike: one outlier at t=3 in a flat series
    *[("spike", t, 5) for t in range(1, 7) if t != 3],
    ("spike", 3, 50),
    # flat: constant series — every split ties at D=0, smallest t wins
    *[("flat", t, 7) for t in range(1, 5)],
    # dupt: duplicate t rows pre-aggregate into one bucket
    ("dupt", 1, 1), ("dupt", 1, 2), ("dupt", 2, 30), ("dupt", 3, 3),
    ("solo", 1, 5),                                   # absent (n=1)
    ("h", None, 1), ("h", 1, None), (None, 1, 1),     # dropped
]


def test_model_hand_checks():
    m = model(ROWS)
    n, total, k, t, d, cusum, ml, mr = m["step"]
    assert (n, total, k, t) == (8, 48, 4, 4)       # split at the jump
    assert (ml, mr) == (2.0, 10.0)
    assert m["flat"][3] == 1 and m["flat"][4] == 0  # tie -> smallest t
    assert m["dupt"][0] == 3                        # buckets, not rows
    assert "solo" not in m and "h" not in m and None not in m


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
        for r in duckdb.sql(sql_cusum_changepoint(_vals(ROWS))).fetchall()
    }
    assert got == model(ROWS)


@pytest.mark.spark
def test_spark_matches_model(spark):
    df = spark.createDataFrame(ROWS, "key string, t long, x long")
    got = {
        r["key"]: (r["n_points"], r["total"], r["k_split"], r["t_split"],
                   r["d_abs"], r["cusum"], r["mean_left"], r["mean_right"])
        for r in cusum_changepoint(df).collect()
    }
    assert got == model(ROWS)


@pytest.mark.spark
def test_engines_bit_identical(spark):
    rows = [
        (f"g{i % 4}", i // 4, ((i * 7) % 13) + (10 if (i // 4) > 30 else 0))
        for i in range(480)
    ]
    df = spark.createDataFrame(rows, "key string, t long, x long")
    srows = sorted(tuple(r) for r in cusum_changepoint(df).collect())
    orows = sorted(
        tuple(r)
        for r in duckdb.sql(sql_cusum_changepoint(_vals(rows))).fetchall()
    )
    assert srows == orows


@pytest.mark.spark
def test_planted_step_found_at_scale(spark):
    rows = [("k", t, 100 if t <= 500 else 130) for t in range(1, 1001)]
    df = spark.createDataFrame(rows, "key string, t long, x long")
    r = cusum_changepoint(df).collect()[0]
    assert r["t_split"] == 500
    assert r["mean_left"] == 100.0 and r["mean_right"] == 130.0


@pytest.mark.spark
def test_empty(spark):
    empty = spark.createDataFrame([], "key string, t long, x long")
    assert cusum_changepoint(empty).count() == 0
