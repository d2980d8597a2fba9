"""Bounded Bellman-Ford: improvement-after-set, hop-bound semantics,
cycles, hygiene, Python-model parity, and the DuckDB twin."""

from __future__ import annotations

import duckdb
import pytest

from core_spark.operators.sssp import sql_sssp_costs, sssp_costs


def _run(spark, edges, seeds, k):
    e = spark.createDataFrame(edges, "src long, dst long, w long")
    s = spark.createDataFrame([(x,) for x in seeds], "node long")
    return {r["node"]: r["cost"] for r in sssp_costs(e, s, k).collect()}


def _model(edges, seeds, k):
    """Textbook <=k-edge Bellman-Ford over min-collapsed edges."""
    best = {}
    for u, v, w in edges:
        if u is None or v is None or w is None:
            continue
        best[(u, v)] = min(w, best.get((u, v), w))
    dist = {s: 0 for s in seeds if s is not None}
    for _ in range(k):
        nxt = dict(dist)
        for (u, v), w in best.items():
            if u in dist and dist[u] + w < nxt.get(v, float("inf")):
                nxt[v] = dist[u] + w
        dist = nxt
    return dist


def test_lighter_long_path_overrides_heavy_direct_edge(spark):
    # 0->3 direct costs 9; 0->1->2->3 costs 3 but needs 3 hops
    edges = [(0, 3, 9), (0, 1, 1), (1, 2, 1), (2, 3, 1)]
    assert _run(spark, edges, [0], 1) == {0: 0, 1: 1, 3: 9}
    assert _run(spark, edges, [0], 2) == {0: 0, 1: 1, 2: 2, 3: 9}
    assert _run(spark, edges, [0], 3) == {0: 0, 1: 1, 2: 2, 3: 3}


def test_cycle_terminates_and_parallel_edges_collapse(spark):
    edges = [(0, 1, 2), (1, 0, 2), (0, 1, 7), (1, 2, 1)]
    assert _run(spark, edges, [0], 5) == {0: 0, 1: 2, 2: 3}


def test_multi_source_min_and_isolated_seed(spark):
    edges = [(0, 1, 5), (9, 1, 1)]
    assert _run(spark, edges, [0, 9, 42], 2) == {0: 0, 9: 0, 42: 0, 1: 1}


def test_zero_hops_and_validation_and_nulls(spark):
    edges = [(0, 1, 5), (None, 1, 1), (0, None, 1), (0, 1, None)]
    assert _run(spark, edges, [0, None], 0) == {0: 0}
    assert _run(spark, edges, [0], 3) == {0: 0, 1: 5}
    with pytest.raises(ValueError):
        _run(spark, edges, [0], -1)


def test_model_parity_on_a_dense_residue_graph(spark):
    edges = [(a, (a * 3 + b) % 11, (a * 7 + b * 5) % 9 + 1)
             for a in range(11) for b in range(3)]
    seeds = [0, 7]
    for k in (0, 1, 3, 5):
        assert _run(spark, edges, seeds, k) == _model(edges, seeds, k)


def test_twin_parity_with_duckdb(spark):
    edges = [(a, (a * a + 2) % 13, (a * 5) % 7 + 1) for a in range(13)] \
        + [(a, (a + 6) % 13, 3) for a in range(13)]
    got = _run(spark, edges, [0], 4)
    con = duckdb.connect()
    con.execute("CREATE TABLE e AS SELECT * FROM (VALUES "
                + ",".join(f"({a},{b},{c})" for a, b, c in edges)
                + ") t(src, dst, w)")
    exp = dict(con.execute(sql_sssp_costs(
        "SELECT * FROM e", "SELECT 0 AS node", 4)).fetchall())
    assert got == {k: int(v) for k, v in exp.items()}
