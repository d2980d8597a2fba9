"""BFS hop distances: hand graphs, model parity, twin parity, bounds."""

from __future__ import annotations

import duckdb
import pytest

from core_spark.operators.bfs import bfs_hops, sql_bfs_hops


def _run(spark, edges, seeds, max_hops):
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(x,) for x in seeds], "node long")
    return {
        r["node"]: r["hops"]
        for r in bfs_hops(e, s, max_hops).collect()
    }


def _model(edges, seeds, max_hops):
    """Driver-side reference BFS (directed, multi-source)."""
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        if u is None or v is None:
            continue
        adj.setdefault(u, set()).add(v)
    dist = {s: 0 for s in seeds if s is not None}
    frontier = set(dist)
    for h in range(1, max_hops + 1):
        nxt = set()
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = h
                    nxt.add(v)
        frontier = nxt
        if not frontier:
            break
    return dist


def test_chain_hops(spark):
    edges = [(i, i + 1) for i in range(5)]
    assert _run(spark, edges, [0], 10) == {i: i for i in range(6)}


def test_hop_bound_truncates(spark):
    edges = [(i, i + 1) for i in range(5)]
    assert _run(spark, edges, [0], 2) == {0: 0, 1: 1, 2: 2}


def test_cycle_terminates_and_min_wins(spark):
    # 0→1→2→0 cycle plus shortcut 0→2: node 2 is at hop 1, not 2.
    edges = [(0, 1), (1, 2), (2, 0), (0, 2)]
    assert _run(spark, edges, [0], 8) == {0: 0, 1: 1, 2: 1}


def test_multi_source_takes_nearest_seed(spark):
    edges = [(0, 1), (1, 2), (2, 3), (10, 3)]
    got = _run(spark, edges, [0, 10], 8)
    assert got == {0: 0, 10: 0, 1: 1, 2: 2, 3: 1}


def test_direction_respected(spark):
    # Edges point INTO the seed: nothing but the seed is reached.
    edges = [(1, 0), (2, 0)]
    assert _run(spark, edges, [0], 5) == {0: 0}


def test_disconnected_component_absent(spark):
    edges = [(0, 1), (5, 6)]
    assert _run(spark, edges, [0], 5) == {0: 0, 1: 1}


def test_null_hygiene(spark):
    edges = [(0, 1), (None, 2), (1, None)]
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(0,), (None,)], "node long")
    got = {r["node"]: r["hops"] for r in bfs_hops(e, s, 3).collect()}
    assert got == {0: 0, 1: 1}


def test_zero_hops_is_seed_set(spark):
    edges = [(0, 1)]
    assert _run(spark, edges, [0], 0) == {0: 0}


def test_negative_bound_rejected(spark):
    with pytest.raises(ValueError):
        _run(spark, [(0, 1)], [0], -1)


def test_seed_dedup_and_seed_not_in_graph(spark):
    edges = [(0, 1)]
    assert _run(spark, edges, [0, 0, 99], 3) == {0: 0, 1: 1, 99: 0}


@pytest.mark.parametrize("seed_mod,max_hops", [(7, 3), (5, 4)])
def test_model_parity_on_derived_graph(spark, seed_mod, max_hops):
    """Random-ish md5-derived graph vs the driver-side model."""
    from core_spark.operators.linkgraph import derive_host_edges

    docs = spark.range(400).selectExpr("id AS doc_id")
    edges_df = derive_host_edges(docs, n_hosts=53, k_out=3)
    edges = [(r["src"], r["dst"]) for r in edges_df.collect()]
    seeds = sorted({u for u, _ in edges if u % seed_mod == 0})
    s = spark.createDataFrame([(x,) for x in seeds], "node long")
    got = {
        r["node"]: r["hops"]
        for r in bfs_hops(edges_df, s, max_hops).collect()
    }
    assert got == _model(edges, seeds, max_hops)


def test_duckdb_twin_parity(spark):
    """Spark frontier BFS == DuckDB recursive-CTE enumeration, on a
    graph with cycles, a shortcut, and an unreachable island."""
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 3), (4, 5),
             (2, 2), (1, 0)]
    clean = [(u, v) for u, v in edges]
    got = _run(spark, clean, [0], 6)
    rows = ", ".join(f"({u}, {v})" for u, v in clean)
    sql = sql_bfs_hops(
        f"SELECT * FROM (VALUES {rows}) AS e(src, dst)",
        "SELECT 0 AS node",
        6,
    )
    want = {n: h for n, h in duckdb.sql(sql).fetchall()}
    assert got == want
