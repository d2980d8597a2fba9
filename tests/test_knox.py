"""Knox test: Python-model parity on both engines, planted-interaction
detection, independence baseline ~1, bound-sufficiency gate, hygiene."""

from __future__ import annotations

import duckdb
import pytest

from core_spark.operators.knox import knox_test, sql_knox_test

EPS, TAU = 10, 5


def model(rows, eps=EPS, tau=TAU):
    clean = [r for r in rows if all(v is not None for v in r)]
    n = len(clean)
    n_st = n_s = n_t = 0
    for i in range(n):
        for j in range(i + 1, n):
            _, x1, y1, t1 = clean[i]
            _, x2, y2, t2 = clean[j]
            sp = (x1 - x2) ** 2 + (y1 - y2) ** 2 <= eps * eps
            tp = abs(t1 - t2) <= tau
            n_s += sp
            n_t += tp
            n_st += sp and tp
    n0 = n * (n - 1) // 2
    ratio = (
        (float(n_st) * float(n0)) / (float(n_s) * float(n_t))
        if n_s and n_t else None
    )
    return (n, n0, n_st, n_s, n_t, ratio)


# interaction fixture: a clump close in space AND time, plus spread
# points sharing space with the clump at far times and times at far
# places — both margins live, interaction concentrated in the clump
CLUMP = [(i, 0, i % 3, i % 4) for i in range(8)]
SPACE_ONLY = [(100 + i, 1, i % 3, 1000 + 100 * i) for i in range(6)]
TIME_ONLY = [(200 + i, 5000 + 100 * i, 0, i % 4) for i in range(6)]
BACKGROUND = [
    (400 + i, 10_000 + 100 * i, 10_000, 100_000 + 1_000 * i)
    for i in range(30)
]
HYGIENE = [(300, None, 0, 0), (301, 0, None, 0), (302, 0, 0, None),
           (None, 0, 0, 0)]
ROWS = CLUMP + SPACE_ONLY + TIME_ONLY + BACKGROUND + HYGIENE


def _vals(rows):
    sql_rows = ", ".join(
        "(" + ", ".join("NULL" if v is None else str(v) for v in r) + ")"
        for r in rows
    )
    return f"SELECT * FROM (VALUES {sql_rows}) t(event_id, x, y, t)"


def test_model_detects_planted_interaction():
    n, n0, n_st, n_s, n_t, ratio = model(ROWS)
    assert n == 50 and n0 == 1225
    assert n_st >= 28                      # all clump pairs interact
    assert ratio > 2.0                     # strong interaction signal


def test_duckdb_twin_matches_model():
    got = duckdb.sql(sql_knox_test(_vals(ROWS), EPS, TAU)).fetchall()[0]
    assert tuple(got) == model(ROWS)


@pytest.mark.spark
def test_spark_matches_model(spark):
    df = spark.createDataFrame(
        ROWS, "event_id long, x long, y long, t long")
    got = knox_test(df, EPS, TAU, eps_inf=100000, tau_inf=100000).collect()
    assert tuple(got[0]) == model(ROWS)


@pytest.mark.spark
def test_engines_bit_identical_lattice(spark):
    rows = [
        (i, (i % 13) * 7, ((i * 5) % 11) * 7, (i * 17) % 200)
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "event_id long, x long, y long, t long")
    srow = tuple(knox_test(
        df, EPS, TAU, eps_inf=10000, tau_inf=10000).collect()[0])
    orow = tuple(duckdb.sql(
        sql_knox_test(_vals(rows), EPS, TAU)).fetchall()[0])
    assert srow == orow


@pytest.mark.spark
def test_undersized_bound_breaks_margin(spark):
    # tau_inf smaller than the true span UNDERCOUNTS n_s vs the
    # oracle's unbounded margin — the gate the docstring promises
    rows = [(1, 0, 0, 0), (2, 1, 0, 10_000), (3, 0, 1, 20_000)]
    df = spark.createDataFrame(rows, "event_id long, x long, y long, t long")
    good = knox_test(df, EPS, TAU, eps_inf=1000, tau_inf=50_000).collect()[0]
    bad = knox_test(df, EPS, TAU, eps_inf=1000, tau_inf=5_000).collect()[0]
    oracle = duckdb.sql(sql_knox_test(_vals(rows), EPS, TAU)).fetchall()[0]
    assert good["n_s"] == oracle[3] == 3
    assert bad["n_s"] < 3


@pytest.mark.spark
def test_empty_and_no_margin_null(spark):
    empty = spark.createDataFrame([], "event_id long, x long, y long, t long")
    row = knox_test(empty, EPS, TAU, eps_inf=100, tau_inf=100).collect()[0]
    assert tuple(row) == (0, 0, 0, 0, 0, None)


def test_validation():
    for bad in ((0, TAU, 100, 100), (EPS, 0, 100, 100),
                (100, TAU, 100, 200), (EPS, 100, 200, 100),
                (EPS, TAU, 4_000_000_000, 100)):
        with pytest.raises(ValueError):
            knox_test(None, *bad)
