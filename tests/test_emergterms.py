"""Emerging terms: model parity both engines, planted trends, cuts."""

from __future__ import annotations

import math

import duckdb
import pytest

from core_spark.operators.emergterms import emerging_terms, sql_emerging_terms

T, H, M = 4, 4, 3

# (doc_id, lat, lon, bucket, text): 'boom' ramps up in the west cell
# (0,0,1,2 docs across buckets), 'bust' ramps down, 'noise' has support
# but no order, 'rare' misses min_total, dup tokens count once per doc.
DOCS = []
_id = 0


def _add(lat, lon, b, text):
    global _id
    DOCS.append((_id, lat, lon, b, text))
    _id += 1


for b in range(T):
    for _ in range(b):                   # boom: 0,1,2,3 docs per bucket
        _add(0.5, 0.5, b, "boom boom steady")
    for _ in range(T - 1 - b):           # bust: 3,2,1,0
        _add(0.5, 0.5, b, "bust steady")
    _add(0.5, 0.5, b, "noise steady" if b % 2 else "steady noise")
_add(0.5, 0.5, 0, "rare")
_add(0.5, 0.5, 1, "rare")                # n_total=2 < M -> cut
_add(9.5, 9.5, 0, "boom")                # other cell: below M there
_add(None, 0.5, 0, "boom boom boom")     # NULL lat dropped
_add(0.5, 0.5, None, "boom")             # NULL bucket dropped
_add(0.5, 0.5, 9, "boom")                # out-of-range bucket dropped


def model(docs, g=1.0, t=T, h=H, m=M):
    cube = {}
    for _i, la, lo, b, text in docs:
        if la is None or lo is None or b is None or not (0 <= b < t):
            continue
        cx, cy = math.floor(lo / g), math.floor(la / g)
        for term in set((text or "").split(" ")):
            if term:
                k = (cx, cy, term, b)
                cube[k] = cube.get(k, 0) + 1
    keys = {}
    for (cx, cy, term, b), n in cube.items():
        keys.setdefault((cx, cy, term), [0] * t)[b] = n
    out = {}
    for key, series in keys.items():
        total = sum(series)
        if total < m:
            continue
        s = sum(
            (series[j] > series[i]) - (series[j] < series[i])
            for i in range(t) for j in range(i + 1, t)
        )
        trend = "rising" if s >= h else ("falling" if s <= -h else "flat")
        out[key] = (total, s, trend)
    return out


EXPECT = model(DOCS)


def test_model_hand_checks():
    # boom series 0,1,2,3 -> S=+6 rising; bust 3,2,1,0 -> -6 falling
    assert EXPECT[(0, 0, "boom")] == (6, 6, "rising")
    assert EXPECT[(0, 0, "bust")] == (6, -6, "falling")
    # steady: constant 4,4,4,4 -> S=0 flat; noise 1,1,1,1 flat
    assert EXPECT[(0, 0, "steady")][2] == "flat"
    assert EXPECT[(0, 0, "noise")] == (4, 0, "flat")
    assert (0, 0, "rare") not in EXPECT
    assert (9, 9, "boom") not in EXPECT


def _vals():
    rows = ", ".join(
        f"({i}, "
        + ("NULL" if la is None else repr(la)) + ", "
        + ("NULL" if lo is None else repr(lo)) + ", "
        + ("NULL" if b is None else str(b)) + ", "
        + ("NULL" if t is None else f"'{t}'") + ")"
        for i, la, lo, b, t in DOCS
    )
    return (f"SELECT * FROM (VALUES {rows})"
            " t(doc_id, lat, lon, bucket, text)")


def test_duckdb_twin_matches_model():
    got = {
        (r[0], r[1], r[2]): (r[3], r[4], r[5])
        for r in duckdb.sql(
            sql_emerging_terms(_vals(), 1.0, T, H, M)).fetchall()
    }
    # model keys are (cx, cy, term); twin emits cx, cy, term
    assert got == {(k[0], k[1], k[2]): v for k, v in EXPECT.items()}


@pytest.mark.spark
def test_spark_matches_model(spark):
    df = spark.createDataFrame(
        DOCS, "doc_id long, lat double, lon double, bucket long, text string")
    got = {
        (r["cx"], r["cy"], r["term"]): (r["n_total"], r["mk_s"], r["trend"])
        for r in emerging_terms(df, 1.0, T, H, M).collect()
    }
    assert got == {(k[0], k[1], k[2]): v for k, v in EXPECT.items()}


@pytest.mark.spark
def test_plan_two_hashaggs_no_join_no_python(spark):
    df = spark.createDataFrame(
        DOCS, "doc_id long, lat double, lon double, bucket long, text string")
    plan = (
        emerging_terms(df, 1.0, T, H, M)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan and "Python" not in plan


def test_rejects_bad_params():
    for args in ((0.0, T, H, M), (1.0, 1, H, M), (1.0, T, -1, M),
                 (1.0, T, H, 0)):
        with pytest.raises(ValueError):
            emerging_terms(None, *args)
