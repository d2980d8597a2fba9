"""Battery for operators/twa.py — left-constant time-weighted average."""

from __future__ import annotations

import duckdb
import pytest

from core_spark.operators.twa import sql_time_weighted_avg, time_weighted_avg

pytestmark = pytest.mark.spark


def _got(spark, data):
    df = spark.createDataFrame(data, "k STRING, t BIGINT, v BIGINT, id BIGINT")
    return {r.k: r for r in time_weighted_avg(df).collect()}


def test_step_function_exact(spark):
    # v=10 holds 0..5, v=20 holds 5..10: TWA = (50+100)/10 = 15
    r = _got(spark, [("a", 0, 10, 1), ("a", 5, 20, 2), ("a", 10, 0, 3)])["a"]
    assert (r.n, r.span, r.num) == (3, 10, 150)
    assert r.twa == 15.0


def test_burst_oversampling_does_not_skew(spark):
    # plain mean of values would be ~92; TWA weights the long-held 10
    data = [("a", 0, 10, 1), ("a", 100, 100, 2), ("a", 101, 100, 3),
            ("a", 102, 100, 4), ("a", 103, 10, 5), ("a", 200, 10, 6)]
    r = _got(spark, data)["a"]
    # 10*100 + 100*1 + 100*1 + 100*1 + 10*97 = 2270 over span 200
    assert r.num == 2270 and r.span == 200
    assert r.twa == 2270 / 200


def test_single_sample_and_zero_span_null(spark):
    r = _got(spark, [("a", 5, 99, 1)])["a"]
    assert r.n == 1 and r.span == 0 and r.twa is None
    # all samples at the same instant: span 0 -> NULL, no divide
    r = _got(spark, [("b", 5, 1, 1), ("b", 5, 9, 2)])["b"]
    assert r.span == 0 and r.twa is None


def test_duplicate_timestamps_last_write_wins(spark):
    # at t=0 two writes (ids 1,2): id=1 holds 0s, id=2 holds to t=10
    r = _got(spark, [("a", 0, 100, 1), ("a", 0, 7, 2), ("a", 10, 0, 3)])["a"]
    assert r.num == 70 and r.twa == 7.0


def test_null_hygiene(spark):
    df = spark.createDataFrame(
        [("a", 0, 5, 1), ("a", None, 9, 2), ("a", 10, None, 3),
         ("a", 20, 1, 4)],
        "k STRING, t BIGINT, v BIGINT, id BIGINT",
    )
    r = {q.k: q for q in time_weighted_avg(df).collect()}["a"]
    # only the two valid samples: v=5 holds 0..20
    assert r.n == 2 and r.num == 100 and r.twa == 5.0


def test_duckdb_twin_matches(spark):
    data = [("g%d" % (i % 2), (i * 13) % 50, (i * 7) % 30, i)
            for i in range(40)]
    got = {
        k: (r.n, r.span, r.num, r.twa)
        for k, r in _got(spark, data).items()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE s (k VARCHAR, t BIGINT, v BIGINT, id BIGINT)")
    con.executemany("INSERT INTO s VALUES (?, ?, ?, ?)", data)
    want = {
        k: (n, sp, nm, tw)
        for k, n, sp, nm, tw in con.sql(
            sql_time_weighted_avg("SELECT * FROM s")
        ).fetchall()
    }
    assert got == want
