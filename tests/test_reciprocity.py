"""Reciprocity + degree CCDF: Python-model parity on both engines,
handshake/citation regimes, self-loop exclusion, doubling buckets,
hygiene."""

from __future__ import annotations

import duckdb
import pytest

from core_spark.operators.reciprocity import (
    degree_ccdf,
    reciprocity,
    sql_degree_ccdf,
    sql_reciprocity,
)


def rmodel(rows):
    e = {(s, d) for s, d in rows if s is not None and d is not None}
    plain = {(s, d) for s, d in e if s != d}
    n_recip = sum(1 for s, d in plain if (d, s) in plain)
    n_self = len(e) - len(plain)
    return (
        len(plain), n_recip, n_self,
        (n_recip / len(plain)) if plain else None,
    )


def cmodel(rows, max_pow=6):
    e = {(s, d) for s, d in rows if s is not None and d is not None
         and s != d}
    deg = {}
    for s, _ in e:
        deg[s] = deg.get(s, 0) + 1
    out = []
    for j in range(max_pow + 1):
        th = 1 << j
        ge = sum(1 for d in deg.values() if d >= th)
        out.append((th, len(deg), ge,
                    (ge / len(deg)) if deg else None))
    return out


EDGES = (
    [(1, 2), (2, 1)]                 # handshake
    + [(3, 4), (4, 5), (5, 3)]       # one-way cycle (no reciprocity)
    + [(6, 6)]                       # self loop, excluded
    + [(1, 2)]                       # duplicate edge collapses
    + [(7, i) for i in range(10, 19)]  # hub: out-degree 9
    + [(None, 1), (1, None)]
)


def test_models():
    n, r, s, ratio = rmodel(EDGES)
    assert (n, r, s) == (14, 2, 1)
    assert ratio == 2 / 14
    rows = cmodel(EDGES)
    assert rows[0][2] == rows[0][1]          # everyone has degree >= 1
    assert rows[3][2] == 1                   # only the hub reaches 8
    assert rows[4][2] == 0                   # nobody reaches 16


def _vals(rows):
    sql_rows = ", ".join(
        "(" + ", ".join("NULL" if v is None else str(v) for v in r) + ")"
        for r in rows
    )
    return f"SELECT * FROM (VALUES {sql_rows}) t(src, dst)"


def test_duckdb_twins_match_models():
    got = duckdb.sql(sql_reciprocity(_vals(EDGES))).fetchall()[0]
    assert tuple(got) == rmodel(EDGES)
    rows = sorted(duckdb.sql(
        sql_degree_ccdf(_vals(EDGES), 6)).fetchall())
    assert [tuple(r) for r in rows] == cmodel(EDGES)


@pytest.mark.spark
def test_spark_matches_models(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    assert tuple(reciprocity(df).collect()[0]) == rmodel(EDGES)
    rows = sorted(tuple(r) for r in degree_ccdf(df, 6).collect())
    assert rows == cmodel(EDGES)


@pytest.mark.spark
def test_engines_bit_identical(spark):
    rows = [((i * 3) % 40, (i * 7) % 40) for i in range(500)]
    df = spark.createDataFrame(rows, "src long, dst long")
    assert tuple(reciprocity(df).collect()[0]) == tuple(
        duckdb.sql(sql_reciprocity(_vals(rows))).fetchall()[0])
    srows = sorted(tuple(r) for r in degree_ccdf(df, 8).collect())
    orows = sorted(
        tuple(r)
        for r in duckdb.sql(sql_degree_ccdf(_vals(rows), 8)).fetchall())
    assert srows == orows


@pytest.mark.spark
def test_empty_and_validation(spark):
    empty = spark.createDataFrame([], "src long, dst long")
    assert tuple(reciprocity(empty).collect()[0]) == (0, 0, 0, None)
    rows = degree_ccdf(empty, 3).collect()
    assert len(rows) == 4
    assert all(tuple(r)[1:] == (0, 0, None) for r in rows)
    with pytest.raises(ValueError):
        degree_ccdf(empty, -1)
