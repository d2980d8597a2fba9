"""Link prediction: Python-model parity both engines, cap arm, guards."""

from __future__ import annotations

from collections import defaultdict

import duckdb
import pytest

from core_spark.operators.linkpred import (
    link_predictions,
    sql_link_predictions,
)

SCALE = 1_000_000

# path + chord: 1-2-3-4 chain, 2-4 chord -> candidate pairs (1,3) (1,4)
# (2,4 is an edge), (3, ...) etc.
EDGES_A = [(1, 2), (2, 3), (3, 4), (2, 4)]
# star hub 9 over leaves 1..5 + a ring 1-2-3-4-5-1: hub evidence for
# every leaf pair; cap=4 kills the hub (deg 5) but keeps ring centers
EDGES_B = [(9, i) for i in (1, 2, 3, 4, 5)] + [
    (1, 2), (2, 3), (3, 4), (4, 5), (5, 1)]
# hygiene: NULLs, self loops, duplicate + reversed edges
EDGES_H = [(1, 1), (None, 2), (2, None), (1, 2), (2, 1), (1, 2),
           (2, 3), (1, 4), (3, 4)]


def model(edges, cap):
    adj = defaultdict(set)
    for a, b in edges:
        if a is None or b is None or a == b:
            continue
        adj[a].add(b)
        adj[b].add(a)
    deg = {n: len(ns) for n, ns in adj.items()}
    out = {}
    nodes = sorted(adj)
    for i, u in enumerate(nodes):
        for v in nodes[i + 1:]:
            if v in adj[u]:
                continue
            zs = [z for z in adj[u] & adj[v] if deg[z] <= cap]
            if not zs:
                continue
            cn = len(zs)
            ra = sum(SCALE // deg[z] for z in zs)
            jac = cn / (deg[u] + deg[v] - cn)
            out[(u, v)] = (cn, deg[u], deg[v], ra, jac)
    return out


def test_model_hand_checks():
    m = model(EDGES_A, 10)
    # (1,3): center 2 (deg 3) -> cn 1, du 1, dv 2, ra 333333
    assert m[(1, 3)] == (1, 1, 2, SCALE // 3, 1 / 2)
    # (1,4): center 2 -> cn 1; deg(4) = 2
    assert m[(1, 4)] == (1, 1, 2, SCALE // 3, 1 / 2)
    # hub cap arm: without cap (2,4) in B has centers {9, 3} (+ring);
    # with cap=4 the hub drops and only center 3 remains
    loose = model(EDGES_B, 99)
    tight = model(EDGES_B, 4)
    assert loose[(2, 4)][0] == 2 and tight[(2, 4)][0] == 1
    # a pair whose ONLY evidence is the hub vanishes under the cap:
    # none here (ring covers all), so check count shrink instead
    assert sum(v[0] for v in tight.values()) < sum(
        v[0] for v in loose.values())


def _vals(edges):
    rows = ", ".join(
        f"({'NULL' if a is None else a}, {'NULL' if b is None else b})"
        for a, b in edges
    )
    return f"SELECT * FROM (VALUES {rows}) t(src, dst)"


@pytest.mark.parametrize("edges,cap", [
    (EDGES_A, 10), (EDGES_B, 4), (EDGES_B, 99), (EDGES_H, 5),
])
def test_duckdb_twin_matches_model(edges, cap):
    got = {
        (r[0], r[1]): (r[2], r[3], r[4], r[5], r[6])
        for r in duckdb.sql(
            sql_link_predictions(_vals(edges), cap)).fetchall()
    }
    assert got == model(edges, cap)


@pytest.mark.spark
@pytest.mark.parametrize("edges,cap", [(EDGES_A, 10), (EDGES_B, 4)])
def test_spark_matches_model(spark, edges, cap):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        (r["u"], r["v"]): (r["cn"], r["du"], r["dv"], r["ra_fp"],
                           r["jaccard"])
        for r in link_predictions(df, cap).collect()
    }
    assert got == model(edges, cap)


@pytest.mark.spark
def test_all_capped_and_empty(spark):
    # every node in a triangle has degree 2: cap=1 admits no center
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src long, dst long")
    assert link_predictions(df, 1).count() == 0
    empty = spark.createDataFrame([], "src long, dst long")
    assert link_predictions(empty, 5).count() == 0


def test_rejects_bad_params():
    with pytest.raises(ValueError):
        link_predictions(None, 0)
    with pytest.raises(ValueError):
        link_predictions(None, 5, scale=0)
