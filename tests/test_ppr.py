"""Battery for linkgraph.pagerank_personalized — walk with restart."""

from __future__ import annotations

import duckdb
import pytest

from core_spark.operators.linkgraph import (
    pagerank_personalized,
    sql_pagerank_personalized,
)

pytestmark = pytest.mark.spark


def _edges(spark, triples):
    return spark.createDataFrame(
        triples, "src_host BIGINT, dst_host BIGINT, n_links BIGINT")


def _got(spark, triples, seeds, iters=3):
    return {
        r.host: (r.rank, r.is_seed)
        for r in pagerank_personalized(
            _edges(spark, triples), seeds, iters=iters
        ).collect()
    }


def test_rank_decays_with_distance_and_unreachable_zero(spark):
    # chain 1 -> 2 -> 3 -> 4, plus isolated pair 8 -> 9
    chain = [(1, 2, 1), (2, 3, 1), (3, 4, 1), (8, 9, 1)]
    got = _got(spark, chain, seeds=[1])
    assert got[1][1] == 1 and got[2][1] == 0
    # monotone decay along the chain from the seed
    assert got[1][0] > 0 and got[2][0] > got[3][0] > got[4][0]
    # disconnected from the seed: exactly zero mass
    assert got[8][0] == 0 and got[9][0] == 0


def test_global_vs_personalized_disagree(spark):
    # hub 5 gets links from everyone; seed 1 only reaches 2
    triples = [(1, 2, 1), (3, 5, 1), (4, 5, 1), (2, 5, 1), (5, 5, 1)]
    got = _got(spark, triples, seeds=[1])
    # personalized to 1: node 2 outranks nodes 3 and 4 (which get
    # nothing), even though 5 is the global hub
    assert got[2][0] > got[3][0] == got[4][0] == 0
    assert got[5][0] > 0  # reachable via 2


def test_seed_set_union_behaviour(spark):
    triples = [(1, 2, 1), (3, 4, 1)]
    one = _got(spark, triples, seeds=[1])
    both = _got(spark, triples, seeds=[1, 3])
    assert one[4][0] == 0          # 3's component dark
    assert both[4][0] > 0          # lit by the second seed
    assert both[2][0] == one[2][0]  # components don't interfere


def test_validation(spark):
    e = _edges(spark, [(1, 2, 1)])
    with pytest.raises(ValueError):
        pagerank_personalized(e, [])
    with pytest.raises(ValueError):
        pagerank_personalized(e, [1], iters=0)
    with pytest.raises(ValueError):
        sql_pagerank_personalized("SELECT 1", [])


def test_duckdb_twin_matches(spark):
    triples = [
        ((i * 3) % 11, (i * 7 + 2) % 11, i % 2 + 1) for i in range(25)
    ]
    got = _got(spark, triples, seeds=[0, 4])
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE e (src_host BIGINT, dst_host BIGINT,"
        " n_links BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?, ?)", triples)
    want = {
        h: (r, s)
        for h, r, s in con.sql(
            sql_pagerank_personalized("SELECT * FROM e", [0, 4])
        ).fetchall()
    }
    assert got == want
