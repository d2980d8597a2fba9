"""Theil-Sen slopes: Python-model parity both engines, robustness to
an outlier, median parity odd/even, hygiene arms."""

from __future__ import annotations

import duckdb
import pytest

from core_spark.operators.theilsen import sql_theil_sen, theil_sen

# linear: slope exactly 3; outlier: one wild point barely moves the
# median (the estimator's whole point); flat: slope 0; dup-t rows sum;
# single-point key absent; NULL hygiene
ROWS = [
    ("linear", 0, 10), ("linear", 1, 13), ("linear", 2, 16),
    ("linear", 3, 19),
    ("outlier", 0, 0), ("outlier", 1, 1), ("outlier", 2, 2),
    ("outlier", 3, 3), ("outlier", 4, 1000),
    ("flat", 10, 7), ("flat", 20, 7), ("flat", 30, 7),
    ("dup", 0, 1), ("dup", 0, 2), ("dup", 5, 13),
    ("lonely", 42, 1),
    (None, 1, 1), ("nullt", None, 1), ("nully", 1, None),
]


def model(rows):
    from collections import defaultdict

    b = defaultdict(lambda: defaultdict(int))
    for k, t, y in rows:
        if k is None or t is None or y is None:
            continue
        b[k][t] += y
    out = {}
    for k, series in b.items():
        pts = sorted(series.items())
        if len(pts) < 2:
            continue
        sl = sorted(
            (y2 - y1) / (t2 - t1)
            for i, (t1, y1) in enumerate(pts)
            for (t2, y2) in pts[i + 1:]
        )
        m = len(sl)
        med = (sl[(m + 1) // 2 - 1] + sl[(m + 2) // 2 - 1]) / 2
        out[k] = (len(pts), m, med)
    return out


def test_model_hand_checks():
    m = model(ROWS)
    assert m["linear"] == (4, 6, 3.0)
    assert m["flat"] == (3, 3, 0.0)
    assert m["dup"] == (2, 1, 2.0)  # (13 - 3) / 5
    assert "lonely" not in m
    # the outlier drags 4 of 10 slopes but not the median
    assert 0.9 <= m["outlier"][2] <= 1.5


def _vals(rows):
    txt = ", ".join(
        "(" + ", ".join(
            "NULL" if v is None else (f"'{v}'" if isinstance(v, str) else str(v))
            for v in r) + ")"
        for r in rows
    )
    return f"SELECT * FROM (VALUES {txt}) t(key, t, y)"


def test_duckdb_twin_matches_model():
    got = {
        r[0]: (r[1], r[2], r[3])
        for r in duckdb.sql(sql_theil_sen(_vals(ROWS))).fetchall()
    }
    assert got == model(ROWS)


@pytest.mark.spark
def test_spark_matches_model(spark):
    df = spark.createDataFrame(ROWS, "key string, t long, y long")
    got = {
        r["key"]: (r["n_points"], r["n_pairs"], r["slope"])
        for r in theil_sen(df).collect()
    }
    assert got == model(ROWS)


@pytest.mark.spark
def test_even_pair_count_median(spark):
    # 4 slopes -> median = mean of ranks 2 and 3
    rows = [("k", 0, 0), ("k", 1, 1), ("k", 2, 8)]
    # slopes: 1, 4, 7 -> odd; add a point for even pair count
    rows.append(("k", 3, 9))
    # slopes: (1,4,7),(4,4.5),(1) sorted = [1,1,3,4,4.5,7] -> wait,
    # recompute via model instead of by hand:
    want = model(rows)
    df = spark.createDataFrame(rows, "key string, t long, y long")
    r = theil_sen(df).collect()[0]
    assert (r["n_points"], r["n_pairs"], r["slope"]) == want["k"]
    assert r["n_pairs"] % 2 == 0


@pytest.mark.spark
def test_guard_and_empty(spark):
    empty = spark.createDataFrame([], "key string, t long, y long")
    assert theil_sen(empty).count() == 0
    big = spark.createDataFrame(
        [("k", i, i) for i in range(11)], "key string, t long, y long")
    with pytest.raises(Exception, match="exceeds 10 points"):
        theil_sen(big, max_points=10).count()


def test_rejects_bad_params():
    with pytest.raises(ValueError):
        theil_sen(None, max_points=1)
