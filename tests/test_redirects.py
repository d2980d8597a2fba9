"""Redirect-chain resolution: model parity, cycles, budget, engine twins."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from core_spark.operators.redirects import (
    resolve_redirects,
    sql_resolve_redirects,
)

ROUNDS = 4  # budget = 16 hops


def model_resolve(edges: dict[str, str], rounds: int = ROUNDS):
    """Reference walk: min(chain_len, 2**rounds) hops, then terminal check."""
    budget = 2 ** rounds
    out = {}
    for s in edges:
        cur, h = s, 0
        while cur in edges and h < budget:
            cur, h = edges[cur], h + 1
        if cur in edges:  # still a redirecting URL after the budget
            out[s] = (None, None, 0)
        else:
            out[s] = (cur, h, 1)
    return out


def _duck(edges: dict[str, str], rounds: int = ROUNDS):
    vals = ", ".join(
        f"({s!r}, {d!r})" for s, d in sorted(edges.items())
    )
    sql = sql_resolve_redirects(
        f"SELECT * FROM (VALUES {vals}) e(src, dst)", rounds=rounds
    )
    return {
        r[0]: (r[1], r[2], r[3])
        for r in duckdb.sql(sql).fetchall()
    }


CHAIN = {f"x{j}": f"x{j-1}" for j in range(1, 8)}  # x7 -> ... -> x0
CYCLE = {"cyc0": "cyc1", "cyc1": "cyc2", "cyc2": "cyc0", "selfy": "selfy"}
LONG = {f"L{j}": f"L{j-1}" for j in range(1, 19)}  # 18 deep vs budget 16
TREE = {"a1": "root", "a2": "root", "b1": "a1"}  # many srcs, one target


def test_model_arms():
    got = model_resolve({**CHAIN, **CYCLE, **LONG, **TREE})
    assert got["x7"] == ("x0", 7, 1)
    assert got["x1"] == ("x0", 1, 1)
    assert got["cyc0"] == (None, None, 0)
    assert got["selfy"] == (None, None, 0)
    assert got["L16"] == ("L0", 16, 1)  # exactly at the 2**rounds budget
    assert got["L17"] == (None, None, 0)  # one past it
    assert got["L18"] == (None, None, 0)
    assert got["a1"] == ("root", 1, 1)
    assert got["b1"] == ("root", 2, 1)


def test_duckdb_twin_matches_model_on_arms():
    edges = {**CHAIN, **CYCLE, **LONG, **TREE}
    assert _duck(edges) == model_resolve(edges)


@settings(max_examples=120, deadline=None)
@given(
    st.dictionaries(
        st.sampled_from([f"n{i}" for i in range(10)]),
        st.sampled_from([f"n{i}" for i in range(10)] + ["t0", "t1"]),
        max_size=10,
    )
)
def test_duckdb_twin_matches_model_fuzz(edges):
    if not edges:
        return
    assert _duck(edges, rounds=3) == model_resolve(edges, rounds=3)


def test_rejects_bad_rounds():
    with pytest.raises(ValueError):
        sql_resolve_redirects("SELECT 1 AS src, 2 AS dst", rounds=0)


@pytest.mark.spark
def test_spark_matches_model_and_twin(spark):
    edges = {**CHAIN, **CYCLE, **LONG, **TREE}
    df = spark.createDataFrame(
        sorted(edges.items()), ["src", "dst"]
    )  # test fixture: createDataFrame is fine off the query path
    got = {
        r["src"]: (r["final_url"], r["hops"], r["resolved"])
        for r in resolve_redirects(df, rounds=ROUNDS).collect()
    }
    assert got == model_resolve(edges)
    assert got == _duck(edges)


@pytest.mark.spark
def test_null_edges_dropped_on_ingest(spark):
    """Malformed rows (NULL src or dst) never surface as resolved=1 /
    final_url=NULL — they are dropped on ingest on BOTH engines."""
    df = spark.createDataFrame(
        [("a", None), (None, "b"), ("c", "d")], "src string, dst string"
    )
    got = {
        r["src"]: (r["final_url"], r["hops"], r["resolved"])
        for r in resolve_redirects(df, rounds=2).collect()
    }
    assert got == {"c": ("d", 1, 1)}
    sql = sql_resolve_redirects(
        "SELECT * FROM (VALUES ('a', NULL), (NULL, 'b'), ('c', 'd'))"
        " e(src, dst)",
        rounds=2,
    )
    assert duckdb.sql(sql).fetchall() == [("c", "d", 1, 1)]


@pytest.mark.spark
def test_spark_plan_has_no_cartesian(spark):
    df = spark.createDataFrame(sorted(CHAIN.items()), ["src", "dst"])
    plan = resolve_redirects(df, rounds=2)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.mark.spark
def test_spark_rejects_bad_rounds(spark):
    df = spark.createDataFrame([("a", "b")], ["src", "dst"])
    with pytest.raises(ValueError):
        resolve_redirects(df, rounds=0)
