"""DBSCAN: model parity, determinized border tiebreak, twins, plan shape."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from core_spark.operators.dbscan import dbscan, sql_dbscan

EPS, MIN_PTS = 1.5, 5

# Textbook fixture (coords are 0.05-grid multiples — exact in binary):
#   blob A (ids 0-5, all core, cluster 0), blob B (ids 10-14, all core,
#   cluster 10), id 20 between them within eps of cores in BOTH blobs
#   (border; the deterministic tiebreak must pick min cluster = 0),
#   id 30 a classic single-blob border, ids 40-42 noise (isolated +
#   a 2-chain below min_pts with no core neighbor).
FIXTURE = {
    0: (0.0, 0.0), 1: (0.4, 0.0), 2: (0.0, 0.4), 3: (0.4, 0.4),
    4: (0.2, 0.2), 5: (0.8, 0.0),
    10: (3.6, 0.0), 11: (4.0, 0.0), 12: (3.6, 0.4), 13: (4.0, 0.4),
    14: (3.8, 0.2),
    20: (2.2, 0.0),
    30: (0.0, -1.4),
    40: (10.0, 10.0), 41: (10.0, 12.0), 42: (10.0, 12.8),
}

EXPECTED = {
    **{i: ("core", 0) for i in range(6)},
    **{i: ("core", 10) for i in range(10, 15)},
    20: ("border", 0),
    30: ("border", 0),
    40: ("noise", None), 41: ("noise", None), 42: ("noise", None),
}


def model_dbscan(pts: dict, eps: float, min_pts: int) -> dict:
    """Brute-force reference: strict <, neighborhood includes self,
    border -> min core-neighbor cluster."""
    ids = sorted(pts)
    e2 = eps * eps

    def d2(i, j):
        dx = pts[i][0] - pts[j][0]
        dy = pts[i][1] - pts[j][1]
        return dx * dx + dy * dy

    nbrs = {i: [j for j in ids if j != i and d2(i, j) < e2] for i in ids}
    core = {i for i in ids if len(nbrs[i]) + 1 >= min_pts}
    parent = {i: i for i in core}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in core:
        for j in nbrs[i]:
            if j in core:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    comp = {}
    for i in core:
        r = find(i)
        comp.setdefault(r, []).append(i)
    label = {i: min(comp[find(i)]) for i in core}
    out = {}
    for i in ids:
        if i in core:
            out[i] = ("core", label[i])
        else:
            cl = [label[j] for j in nbrs[i] if j in core]
            out[i] = ("border", min(cl)) if cl else ("noise", None)
    return out


def _duck(pts: dict, eps: float, min_pts: int) -> dict:
    vals = ", ".join(
        f"({i}, {x!r}, {y!r})" for i, (x, y) in sorted(pts.items())
    )
    sql = sql_dbscan(
        f"SELECT * FROM (VALUES {vals}) p(doc_id, lat, lon)", eps, min_pts
    )
    return {r[0]: (r[1], r[2]) for r in duckdb.sql(sql).fetchall()}


def test_model_matches_hand_expectation():
    assert model_dbscan(FIXTURE, EPS, MIN_PTS) == EXPECTED


def test_duckdb_twin_matches_expectation():
    assert _duck(FIXTURE, EPS, MIN_PTS) == EXPECTED


@settings(max_examples=60, deadline=None)
@given(
    st.dictionaries(
        st.integers(0, 30),
        st.tuples(
            st.integers(0, 40).map(lambda v: v * 0.25),
            st.integers(0, 40).map(lambda v: v * 0.25),
        ),
        min_size=1,
        max_size=18,
    ),
    st.integers(1, 5),
)
def test_duckdb_twin_matches_model_fuzz(pts, min_pts):
    assert _duck(pts, 1.5, min_pts) == model_dbscan(pts, 1.5, min_pts)


def test_rejects_bad_min_pts():
    with pytest.raises(ValueError):
        sql_dbscan("SELECT 1 AS doc_id, 0.0 AS lat, 0.0 AS lon", 1.0, 0)


@pytest.mark.spark
def test_spark_matches_expectation_and_twin(spark):
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in sorted(FIXTURE.items())],
        ["doc_id", "lat", "lon"],
    )
    got = {
        r["doc_id"]: (r["role"], r["cluster"])
        for r in dbscan(df, EPS, MIN_PTS).collect()
    }
    assert got == EXPECTED


@pytest.mark.spark
def test_spark_matches_model_on_a_random_grid(spark):
    pts = {i: ((i * 7) % 13 * 0.5, (i * 11) % 17 * 0.5) for i in range(60)}
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in sorted(pts.items())],
        ["doc_id", "lat", "lon"],
    )
    got = {
        r["doc_id"]: (r["role"], r["cluster"])
        for r in dbscan(df, EPS, 4).collect()
    }
    assert got == model_dbscan(pts, EPS, 4)


@pytest.mark.spark
def test_spark_plan_has_no_cartesian(spark):
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in sorted(FIXTURE.items())],
        ["doc_id", "lat", "lon"],
    )
    plan = (
        dbscan(df, EPS, MIN_PTS)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
