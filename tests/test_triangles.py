"""Triangle counting: hand graphs, hub skew, model parity, twin parity."""

from __future__ import annotations

import itertools

import duckdb
import pytest

from core_spark.operators.triangles import (
    sql_triangle_counts,
    triangle_counts,
)


def _run(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: (r["degree"], r["triangles"])
        for r in triangle_counts(df).collect()
    }


def _model(edges):
    """Brute-force Python model over the simple undirected graph."""
    simple = {
        (min(u, v), max(u, v))
        for u, v in edges
        if u is not None and v is not None and u != v
    }
    nodes = sorted({n for e in simple for n in e})
    deg = {n: sum(n in e for e in simple) for n in nodes}
    tri = {n: 0 for n in nodes}
    for a, b, c in itertools.combinations(nodes, 3):
        if ((a, b) in simple and (b, c) in simple and (a, c) in simple):
            tri[a] += 1
            tri[b] += 1
            tri[c] += 1
    return {n: (deg[n], tri[n]) for n in nodes}


def test_k4_every_node_in_three_triangles(spark):
    edges = [(a, b) for a in range(4) for b in range(4) if a < b]
    got = _run(spark, edges)
    assert got == {n: (3, 3) for n in range(4)}


def test_triangle_with_pendant(spark):
    got = _run(spark, [(0, 1), (1, 2), (0, 2), (2, 3)])
    assert got == {0: (2, 1), 1: (2, 1), 2: (3, 1), 3: (1, 0)}


def test_hygiene_null_selfloop_multiedge_direction(spark):
    edges = [
        (0, 1), (1, 0), (0, 1),          # multi-edge both directions
        (1, 2), (0, 2),
        (5, 5),                           # self-loop dropped
        (None, 3), (3, None),             # NULL endpoints dropped
    ]
    got = _run(spark, edges)
    assert got == {0: (2, 1), 1: (2, 1), 2: (2, 1)}


def test_star_hub_has_no_triangles(spark):
    """Degree orientation's whole point: the hub receives every edge,
    generates no wedges, and the count is 0 without a d² blow-up."""
    got = _run(spark, [(0, leaf) for leaf in range(1, 12)])
    assert got[0] == (11, 0)
    assert all(got[leaf] == (1, 0) for leaf in range(1, 12))


def _pseudo_edges(n_edges, n_nodes):
    """Deterministic congruential edge draws (test-only randomness).

    Uses the LCG's HIGH bits: the low bits of a power-of-two-modulus
    LCG have tiny periods (bit k cycles every 2^k), which makes
    ``x % n`` alternate parity and the whole graph bipartite —
    triangle-free by construction, a useless fixture."""
    edges, x = [], 7
    for _ in range(n_edges):
        x = (x * 1103515245 + 12345) % (2**31)
        u = (x >> 16) % n_nodes
        x = (x * 1103515245 + 12345) % (2**31)
        edges.append((u, (x >> 16) % n_nodes))
    return edges


def test_model_parity_and_handshake(spark):
    edges = _pseudo_edges(160, 24)
    got = _run(spark, edges)
    want = _model(edges)
    assert got == want
    total3 = sum(t for _, t in got.values())
    assert total3 % 3 == 0 and total3 > 0


def test_duckdb_twin_parity():
    edges = _pseudo_edges(120, 20)
    vals = ", ".join(f"({u}, {v})" for u, v in edges)
    sql = sql_triangle_counts(
        f"SELECT src, dst FROM (VALUES {vals}) e(src, dst)"
    )
    got = {
        n: (d, t) for n, d, t in duckdb.connect().execute(sql).fetchall()
    }
    assert got == _model(edges)


def test_plan_never_cartesian(spark):
    df = spark.createDataFrame(
        _pseudo_edges(60, 12), "src long, dst long"
    )
    plan = triangle_counts(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_empty_graph(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert triangle_counts(df).count() == 0


class TestClusteringCoefficients:
    """lcc = 2T/(d(d-1)), NULL under degree 2, bit-identical doubles."""

    CASES = [
        # K4: every node d=3, T=3, lcc=1.0
        ([(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)],
         {1: (3, 3, 1.0), 2: (3, 3, 1.0), 3: (3, 3, 1.0), 4: (3, 3, 1.0)}),
        # star: center d=3 T=0 lcc=0.0; leaves d=1 -> NULL
        ([(0, 1), (0, 2), (0, 3)],
         {0: (3, 0, 0.0), 1: (1, 0, None), 2: (1, 0, None),
          3: (1, 0, None)}),
        # triangle + tail: node 3 has d=3 T=1 -> 1/3
        ([(1, 2), (2, 3), (3, 1), (3, 4)],
         {1: (2, 1, 1.0), 2: (2, 1, 1.0), 3: (3, 1, 1.0 / 3.0),
          4: (1, 0, None)}),
    ]

    @pytest.mark.parametrize("edges,want", CASES)
    def test_duckdb_twin(self, edges, want):
        from core_spark.operators.triangles import (
            sql_clustering_coefficients,
        )

        rows = ", ".join(f"({a}, {b})" for a, b in edges)
        got = {
            r[0]: (r[1], r[2], r[3])
            for r in duckdb.sql(sql_clustering_coefficients(
                f"SELECT * FROM (VALUES {rows}) t(src, dst)")).fetchall()
        }
        assert got == want

    @pytest.mark.spark
    @pytest.mark.parametrize("edges,want", CASES)
    def test_spark(self, spark, edges, want):
        from core_spark.operators.triangles import clustering_coefficients

        df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r["node"]: (r["degree"], r["triangles"], r["lcc"])
            for r in clustering_coefficients(df).collect()
        }
        assert got == want
