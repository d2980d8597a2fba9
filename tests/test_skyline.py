"""Battery for operators/skyline.py — 2-D Pareto front."""

from __future__ import annotations

import duckdb
import pytest

from core_spark.operators.skyline import pareto_front, sql_pareto_front

pytestmark = pytest.mark.spark


def _got(spark, data):
    df = spark.createDataFrame(data, "id BIGINT, x BIGINT, y BIGINT")
    return {r.id: r.is_pareto for r in pareto_front(df).collect()}


def _model(data):
    out = {}
    for i, x, y in data:
        dom = any(
            qx >= x and qy >= y and (qx > x or qy > y)
            for j, qx, qy in data if j != i
        )
        out[i] = 0 if dom else 1
    return out


def test_staircase_front(spark):
    data = [(1, 1, 9), (2, 3, 7), (3, 5, 5), (4, 7, 3), (5, 9, 1),
            (6, 2, 2), (7, 4, 4)]  # 6 and 7 sit under the staircase
    got = _got(spark, data)
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 0, 7: 0}


def test_single_dominator(spark):
    data = [(1, 10, 10), (2, 9, 10), (3, 10, 9), (4, 1, 1)]
    assert _got(spark, data) == {1: 1, 2: 0, 3: 0, 4: 0}


def test_duplicates_do_not_dominate_each_other(spark):
    data = [(1, 5, 5), (2, 5, 5), (3, 4, 4)]
    assert _got(spark, data) == {1: 1, 2: 1, 3: 0}


def test_equal_x_tie_and_equal_y_tie(spark):
    # same x: only the max y survives; same y: only the max x
    data = [(1, 5, 9), (2, 5, 7), (3, 8, 3), (4, 6, 3)]
    assert _got(spark, data) == {1: 1, 2: 0, 3: 1, 4: 0}


def test_model_parity_on_random_points(spark):
    data = [(i, (i * 37) % 23, (i * 53) % 19) for i in range(80)]
    assert _got(spark, data) == _model(data)


def test_null_axes_dropped_and_twin(spark):
    df = spark.createDataFrame(
        [(1, 5, 5), (2, None, 9), (3, 9, None)],
        "id BIGINT, x BIGINT, y BIGINT")
    assert {r.id for r in pareto_front(df).collect()} == {1}
    data = [(i, (i * 7) % 13, (i * 11) % 17) for i in range(50)]
    got = _got(spark, data)
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, x BIGINT, y BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", data)
    want = {
        i: p for i, _, _, p in con.sql(
            sql_pareto_front("SELECT * FROM t")
        ).fetchall()
    }
    assert got == want
