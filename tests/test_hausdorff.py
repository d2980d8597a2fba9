"""Hausdorff join: Python-model parity both engines, blocking
completeness vs the no-blocking twin, asymmetry arms, hygiene."""

from __future__ import annotations

import math
from itertools import combinations

import duckdb
import pytest

from core_spark.operators.hausdorff import hausdorff_join, sql_hausdorff_join

# four shapes on a plane: t1/t2 near-identical squares (tiny H), t3 =
# t1 shifted by 0.3 (H = 0.3), t4 far away, t5 a SUBSET of t1 (the
# asymmetry trap: directed h(t5->t1)=0 but h(t1->t5)>0), plus dup
# points and NULL hygiene
PTS = [
    ("t1", 0.0, 0.0), ("t1", 0.0, 1.0), ("t1", 1.0, 0.0), ("t1", 1.0, 1.0),
    ("t2", 0.05, 0.0), ("t2", 0.0, 1.05), ("t2", 1.0, 0.05), ("t2", 1.05, 1.0),
    ("t3", 0.3, 0.0), ("t3", 0.3, 1.0), ("t3", 1.3, 0.0), ("t3", 1.3, 1.0),
    ("t4", 50.0, 50.0), ("t4", 51.0, 51.0),
    ("t5", 0.0, 0.0), ("t5", 1.0, 1.0),
    ("t1", 0.0, 0.0),                       # duplicate point
    (None, 0.0, 0.0), ("t6", None, 0.0), ("t6", 0.0, None),
]


def model(pts, threshold):
    t2m = int(threshold * threshold * 1_000_000)
    trajs = {}
    for tid, la, lo in pts:
        if tid is None or la is None or lo is None:
            continue
        trajs.setdefault(tid, set()).add((la, lo))

    def d2m(a, b):
        return math.floor(
            ((a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2) * 1000000)

    out = {}
    for ta, tb in combinations(sorted(trajs), 2):
        A, B = trajs[ta], trajs[tb]
        h = max(
            max(min(d2m(a, b) for b in B) for a in A),
            max(min(d2m(b, a) for a in A) for b in B),
        )
        if h <= t2m:
            out[(ta, tb)] = (len(A), len(B), h, math.sqrt(h / 1000000))
    return out


def test_model_hand_checks():
    m = model(PTS, 0.5)
    assert ("t1", "t2") in m and ("t1", "t3") in m
    assert ("t1", "t4") not in m
    # subset asymmetry: h(t5->t1)=0, so H = h(t1->t5) = 1.0 exactly
    # (corner (0,1) to (0,0)/(1,1)) — invisible at 0.5, caught at 1.0
    assert ("t1", "t5") not in m
    wide = model(PTS, 1.0)
    assert wide[("t1", "t5")][2] == 1_000_000
    tight = model(PTS, 0.2)
    assert ("t1", "t3") not in tight and ("t1", "t2") in tight


def _vals(pts):
    rows = ", ".join(
        "(" + ", ".join(
            "NULL" if v is None else (f"'{v}'" if isinstance(v, str) else repr(v))
            for v in p) + ")"
        for p in pts
    )
    return f"SELECT * FROM (VALUES {rows}) t(tid, lat, lon)"


@pytest.mark.parametrize("threshold", [0.2, 0.5, 2.0])
def test_duckdb_twin_matches_model(threshold):
    got = {
        (r[0], r[1]): (r[2], r[3], r[4], r[5])
        for r in duckdb.sql(
            sql_hausdorff_join(_vals(PTS), threshold)).fetchall()
    }
    assert got == model(PTS, threshold)


@pytest.mark.spark
@pytest.mark.parametrize("threshold", [0.2, 0.5, 2.0])
def test_spark_matches_model(spark, threshold):
    df = spark.createDataFrame(PTS, "tid string, lat double, lon double")
    got = {
        (r["tid_a"], r["tid_b"]): (r["n_a"], r["n_b"], r["hd2_micro"], r["hdist"])
        for r in hausdorff_join(df, threshold).collect()
    }
    assert got == model(PTS, threshold)


@pytest.mark.spark
def test_blocking_is_complete_on_a_grid_swarm(spark):
    # 25 single-point trajectories on a 0.7-spaced grid at threshold
    # 1.0: neighbors within 1.0 = rook moves (0.7) and diagonal (0.99)
    # — every surviving pair must equal the brute-force model
    pts = [(f"g{i}{j}", i * 0.7, j * 0.7)
           for i in range(5) for j in range(5)]
    df = spark.createDataFrame(pts, "tid string, lat double, lon double")
    got = {
        (r["tid_a"], r["tid_b"]) for r in hausdorff_join(df, 1.0).collect()
    }
    assert got == set(model(pts, 1.0))
    assert len(got) == 2 * 5 * 4 + 2 * 4 * 4  # rook + diagonal pairs


@pytest.mark.spark
def test_guard_and_empty(spark):
    empty = spark.createDataFrame([], "tid string, lat double, lon double")
    assert hausdorff_join(empty, 1.0).count() == 0
    big = spark.createDataFrame(
        [("k", float(i), 0.0) for i in range(4)],
        "tid string, lat double, lon double")
    with pytest.raises(Exception, match="exceeds 3 points"):
        hausdorff_join(big, 1.0, max_points=3).count()


def test_rejects_bad_params():
    with pytest.raises(ValueError):
        hausdorff_join(None, 0.0)
    with pytest.raises(ValueError):
        sql_hausdorff_join("SELECT 1", -1.0)
    with pytest.raises(ValueError):
        hausdorff_join(None, 1.0, max_points=0)
