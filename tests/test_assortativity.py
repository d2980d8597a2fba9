"""Degree assortativity: hand-derived classics (path → −1/−0.5,
regular → NULL), Python-model parity on both engines, hygiene."""

from __future__ import annotations

import duckdb
import pytest

from core_spark.operators.assortativity import (
    degree_assortativity,
    sql_degree_assortativity,
)


def model(edges):
    canon = {
        (min(a, b), max(a, b))
        for a, b in edges
        if a is not None and b is not None and a != b
    }
    deg = {}
    for u, v in canon:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    m = len(canon)
    sj = sum(deg[u] + deg[v] for u, v in canon)
    sdudv = sum(deg[u] * deg[v] for u, v in canon)
    sj2 = sum(deg[u] ** 2 + deg[v] ** 2 for u, v in canon)
    num = 2 * m * (2 * sdudv) - sj * sj
    den = 2 * m * sj2 - sj * sj
    return (m, num, den, num / den if den != 0 else None)


def _vals(edges):
    rows = ", ".join(
        "(" + ", ".join("NULL" if x is None else f"'{x}'" for x in e) + ")"
        for e in edges
    )
    return f"SELECT * FROM (VALUES {rows}) t(src, dst)"


PATH3 = [("a", "b"), ("b", "c")]
PATH4 = [("a", "b"), ("b", "c"), ("c", "d")]
STAR = [("hub", "x"), ("hub", "y"), ("hub", "z")]
CYCLE4 = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
MIXED = PATH4 + STAR + [("x", "y"), ("c", "hub")]
DIRTY = PATH3 + [("b", "a"), ("a", "a"), (None, "b"), ("c", None)]


def test_model_hand_checks():
    assert model(PATH3)[3] == -1.0
    assert model(PATH4)[3] == -0.5
    assert model(STAR)[3] == -1.0          # star is perfectly disassortative
    assert model(CYCLE4)[3] is None        # regular graph: zero variance
    assert model(DIRTY) == model(PATH3)    # hygiene collapses to the path


@pytest.mark.parametrize(
    "edges", [PATH3, PATH4, STAR, CYCLE4, MIXED, DIRTY])
def test_duckdb_twin_matches_model(edges):
    got = duckdb.sql(sql_degree_assortativity(_vals(edges))).fetchone()
    assert got == model(edges)


@pytest.mark.spark
@pytest.mark.parametrize("edges", [PATH4, STAR, CYCLE4, MIXED, DIRTY])
def test_spark_matches_model(spark, edges):
    df = spark.createDataFrame(edges, "src string, dst string")
    row = degree_assortativity(df).collect()[0]
    assert (row["m_edges"], row["num"], row["den"],
            row["assortativity"]) == model(edges)


@pytest.mark.spark
def test_empty_graph(spark):
    empty = spark.createDataFrame([], "src string, dst string")
    row = degree_assortativity(empty).collect()[0]
    assert row["m_edges"] == 0 and row["assortativity"] is None
    got = duckdb.sql(sql_degree_assortativity(
        "SELECT 'a' AS src, 'b' AS dst WHERE 1 = 0")).fetchone()
    assert got == (0, 0, 0, None)
