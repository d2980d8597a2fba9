"""Battery for operators/communities.py — synchronous label propagation."""

from __future__ import annotations

import duckdb
import pytest

from core_spark.operators.communities import (
    label_propagation,
    sql_label_propagation,
)

pytestmark = pytest.mark.spark


def _got(spark, edges, iters=3):
    df = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
    return {
        r.host: (r.community, r.csize)
        for r in label_propagation(df, iters=iters).collect()
    }


def test_two_cliques_with_bridge(spark):
    # triangles {1,2,3} and {10,11,12} joined by one bridge edge: each
    # clique collapses to its min label; the bridge does not merge them
    clique = lambda a, b, c: [(a, b), (b, c), (a, c)]
    got = _got(spark, clique(1, 2, 3) + clique(10, 11, 12) + [(3, 10)])
    assert got[1][0] == got[2][0] == got[3][0] == 1
    assert got[10][0] == got[11][0] == got[12][0]
    assert got[1][0] != got[10][0]
    assert got[1][1] == 3 and got[10][1] == 3


def test_min_label_tie_break_single_edge(spark):
    # round 1: 2's only neighbor is 1 -> adopts 1; 1 adopts 2; round 2
    # re-evaluates from the SYNCHRONOUS round-1 state (2-cycle) — the
    # fixed horizon makes the result deterministic either way
    got1 = _got(spark, [(1, 2)], iters=1)
    assert got1[2][0] == 1 and got1[1][0] == 2
    got2 = _got(spark, [(1, 2)], iters=2)
    assert got2[1][0] == 1 and got2[2][0] == 2


def test_star_adopts_center_and_multiedge_weight(spark):
    # star: center 5 with leaves 6,7,8 -> leaves all adopt 5 in round 1
    got = _got(spark, [(5, 6), (5, 7), (5, 8)], iters=1)
    assert got[6][0] == 5 and got[7][0] == 5 and got[8][0] == 5
    # duplicate edges vote twice: node 3's neighbors are {1 x2, 2 x1},
    # so plurality picks 1 even though 2 is also adjacent
    got = _got(spark, [(1, 3), (1, 3), (2, 3), (7, 1), (7, 2)], iters=1)
    assert got[3][0] == 1


def test_fixture_is_pure_function(spark):
    edges = [((i * 7) % 13, (i * 11) % 13) for i in range(20)]
    a = _got(spark, edges)
    b = _got(spark, edges)
    assert a == b


def test_validation(spark):
    df = spark.createDataFrame([(1, 2)], "src BIGINT, dst BIGINT")
    with pytest.raises(ValueError):
        label_propagation(df, iters=0)
    with pytest.raises(ValueError):
        sql_label_propagation("SELECT 1 AS src, 2 AS dst", iters=0)


def test_duckdb_twin_matches(spark):
    edges = [((i * i) % 17, (i * 5 + 3) % 17) for i in range(30)]
    got = _got(spark, edges, iters=3)
    con = duckdb.connect()
    con.execute("CREATE TABLE e (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?)", edges)
    want = {
        h: (c, s)
        for h, c, s in con.sql(
            sql_label_propagation("SELECT * FROM e", iters=3)
        ).fetchall()
    }
    assert got == want
