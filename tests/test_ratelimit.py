"""Battery for operators/ratelimit.py — RANGE-frame rate audit."""

from __future__ import annotations

import duckdb
import pytest

from core_spark.operators.ratelimit import sliding_rate, sql_sliding_rate

pytestmark = pytest.mark.spark


def _got(spark, data, **kw):
    df = spark.createDataFrame(data, "k STRING, t_sec BIGINT, id BIGINT")
    return {r.id: r for r in sliding_rate(df, **kw).collect()}


def test_time_distance_not_row_position(spark):
    # 3 events in 10s, then one 1000s later: the late one sees only itself
    data = [("a", 0, 1), ("a", 5, 2), ("a", 10, 3), ("a", 1010, 4)]
    got = _got(spark, data, window_sec=60, limit=2)
    assert got[3].win_count == 3 and got[3].over_limit == 1
    assert got[4].win_count == 1 and got[4].over_limit == 0


def test_peer_rows_count_fully(spark):
    # a burst of 4 simultaneous events: EVERY member sees all 4
    data = [("a", 100, i) for i in range(4)]
    got = _got(spark, data, window_sec=10, limit=3)
    assert all(got[i].win_count == 4 and got[i].over_limit == 1
               for i in range(4))


def test_window_boundary_inclusive(spark):
    # frame is [t-W, t]: an event exactly W seconds back is IN
    data = [("a", 0, 1), ("a", 60, 2), ("a", 61, 3)]
    got = _got(spark, data, window_sec=60, limit=1)
    assert got[2].win_count == 2       # t=0 within [0, 60]
    assert got[3].win_count == 2       # t=0 now outside [1, 61]


def test_keys_isolated_and_validation(spark):
    data = [("a", 0, 1), ("b", 0, 2), ("a", 1, 3)]
    got = _got(spark, data, window_sec=10, limit=1)
    assert got[2].win_count == 1 and got[3].win_count == 2
    df = spark.createDataFrame(data, "k STRING, t_sec BIGINT, id BIGINT")
    with pytest.raises(ValueError):
        sliding_rate(df, window_sec=0, limit=1)


def test_duckdb_twin_matches(spark):
    data = [("u%d" % (i % 3), (i * i) % 40, i) for i in range(60)]
    got = {
        i: (r.k, r.t_sec, r.win_count, r.over_limit)
        for i, r in _got(spark, data, window_sec=7, limit=2).items()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE e (k VARCHAR, t_sec BIGINT, id BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?, ?)", data)
    want = {
        i: (k, t, wc, ol)
        for k, t, i, wc, ol in con.sql(
            sql_sliding_rate("SELECT * FROM e", window_sec=7, limit=2)
        ).fetchall()
    }
    assert got == want
