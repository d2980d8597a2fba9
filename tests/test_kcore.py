"""k-core: model parity both engines, cascade, degenerates, guards."""

from __future__ import annotations

from collections import Counter

import duckdb
import pytest

from core_spark.operators.kcore import k_core, sql_k_core

# triangle+tail: {1,2,3} triangle (deg 2 each), 4-5-6 chain hanging off 3
EDGES_A = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6)]
# dense K4 core {10,11,12,13} + a chain 14-15-16 whose peel CASCADES
EDGES_B = [(10, 11), (10, 12), (10, 13), (11, 12), (11, 13), (12, 13),
           (13, 14), (14, 15), (15, 16)]
# hygiene: self loop, NULLs, duplicate + reversed duplicate edges
EDGES_H = [(1, 1), (None, 2), (2, None), (1, 2), (2, 1), (1, 2)]


def model(edges, k):
    sym = {(a, b) for a, b in edges if a is not None and b is not None
           and a != b}
    sym |= {(b, a) for a, b in sym}
    while True:
        deg = Counter(a for a, _ in sym)
        keep = {n for n, d in deg.items() if d >= k}
        ns = {(a, b) for a, b in sym if a in keep and b in keep}
        if ns == sym:
            break
        sym = ns
    return dict(Counter(a for a, _ in sym))


def test_model_hand_checks():
    assert model(EDGES_A, 2) == {1: 2, 2: 2, 3: 2}  # tail peels, cascade
    assert model(EDGES_A, 3) == {}
    assert model(EDGES_B, 3) == {10: 3, 11: 3, 12: 3, 13: 3}
    assert model(EDGES_H, 1) == {1: 1, 2: 1}


def _vals(edges):
    rows = ", ".join(
        f"({'NULL' if a is None else a}, {'NULL' if b is None else b})"
        for a, b in edges
    )
    return f"SELECT * FROM (VALUES {rows}) t(src, dst)"


@pytest.mark.parametrize("edges,k", [
    (EDGES_A, 2), (EDGES_A, 3), (EDGES_B, 3), (EDGES_B, 4), (EDGES_H, 1),
])
def test_duckdb_twin_matches_model(edges, k):
    got = {
        r[0]: r[1]
        for r in duckdb.sql(sql_k_core(_vals(edges), k, rounds=8)).fetchall()
    }
    assert got == model(edges, k)


@pytest.mark.spark
@pytest.mark.parametrize("edges,k", [(EDGES_A, 2), (EDGES_B, 3)])
def test_spark_matches_model(spark, edges, k):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["core_degree"]
        for r in k_core(df, k).collect()
    }
    assert got == model(edges, k)
    assert all(d >= k for d in got.values())


@pytest.mark.spark
def test_empty_core_and_empty_input(spark):
    df = spark.createDataFrame(EDGES_A, "src long, dst long")
    assert k_core(df, 5).count() == 0
    empty = spark.createDataFrame([], "src long, dst long")
    assert k_core(empty, 2).count() == 0


@pytest.mark.spark
def test_nonconvergence_raises(spark):
    # a 12-node path peels one end per round: max_rounds=2 must raise
    path = [(i, i + 1) for i in range(12)]
    df = spark.createDataFrame(path, "src long, dst long")
    with pytest.raises(RuntimeError, match="fixed point"):
        k_core(df, 2, max_rounds=2)
    # and with enough rounds the 2-core of a path is empty
    assert k_core(df, 2, max_rounds=15).count() == 0


def test_rejects_bad_params():
    with pytest.raises(ValueError):
        k_core(None, 0)
    with pytest.raises(ValueError):
        k_core(None, 2, max_rounds=0)
