"""Battery for operators/outliers.py — MAD/Hampel outlier flags."""

from __future__ import annotations

import duckdb
import pytest

from core_spark.operators.outliers import mad_outliers, sql_mad_outliers

pytestmark = pytest.mark.spark


def _got(spark, data, k=3):
    df = spark.createDataFrame(data, "g STRING, id BIGINT, x BIGINT")
    return {r.id: r for r in mad_outliers(df, k=k).collect()}


def test_obvious_outlier_flagged(spark):
    # med=10, MAD=1: 100 is miles past 3 MADs; 12 is not (|12-10|=2 < 3)
    got = _got(spark, [
        ("a", 1, 9), ("a", 2, 10), ("a", 3, 10), ("a", 4, 11),
        ("a", 5, 12), ("a", 6, 100),
    ])
    assert got[6].is_outlier and not got[5].is_outlier
    assert sum(r.is_outlier for r in got.values()) == 1


def test_doubled_statistics_even_and_odd(spark):
    # odd group: med2 = 2*median exactly
    got = _got(spark, [("a", i, v) for i, v in
                       enumerate([1, 5, 9])])
    assert all(r.med2 == 10 for r in got.values())  # median 5
    # devs: |2-10|=8, 0, 8 -> sorted 0,8,8 -> doubled med 16 (4*MAD, MAD=4)
    assert all(r.mad2d == 16 for r in got.values())
    # even group: med2 = lo+hi
    got = _got(spark, [("b", i, v) for i, v in
                       enumerate([1, 3, 7, 9])])
    assert all(r.med2 == 10 for r in got.values())  # (3+7)


def test_groups_independent(spark):
    data = [("a", i, 10) for i in range(5)] + [("a", 9, 1000)]
    data += [("b", 100 + i, 1000) for i in range(5)] + [("b", 109, 10)]
    got = _got(spark, data)
    # each group flags only ITS deviant
    assert got[9].is_outlier and got[109].is_outlier
    assert sum(r.is_outlier for r in got.values()) == 2


def test_constant_group_never_flags(spark):
    # MAD = 0 and every dev = 0: 2*0 > k*0 is false — no flags, no NaN
    got = _got(spark, [("a", i, 42) for i in range(7)])
    assert not any(r.is_outlier for r in got.values())
    assert all(r.mad2d == 0 for r in got.values())


def test_null_x_dropped_and_validation(spark):
    df = spark.createDataFrame(
        [("a", 1, 5), ("a", 2, None), ("a", 3, 6), ("a", 4, 7)],
        "g STRING, id BIGINT, x BIGINT",
    )
    rows = mad_outliers(df).collect()
    assert {r.id for r in rows} == {1, 3, 4}
    with pytest.raises(ValueError):
        mad_outliers(df, k=0)


def test_duckdb_twin_matches(spark):
    data = [("g%d" % (i % 3), i, (i * 37) % 101 + (500 if i % 13 == 0
             else 0)) for i in range(60)]
    got = {
        r.id: (r.g, r.x, r.med2, r.mad2d, r.is_outlier)
        for r in _got(spark, data).values()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, id BIGINT, x BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", data)
    want = {
        i: (g, x, m2, md, o)
        for g, i, x, m2, md, o in con.sql(
            sql_mad_outliers("SELECT * FROM t")
        ).fetchall()
    }
    assert got == want


def test_hypothesis_fuzz_vs_python_model(spark):
    from hypothesis import given, settings, strategies as st

    def model(data, k=3):
        out = {}
        by_g = {}
        for g, i, x in data:
            by_g.setdefault(g, []).append((x, i))
        for g, xs in by_g.items():
            xs.sort()
            n = len(xs)
            med2 = xs[(n + 1) // 2 - 1][0] + xs[n // 2][0]
            devs = sorted(abs(2 * x - med2) for x, _ in xs)
            mad2d = devs[(n + 1) // 2 - 1] + devs[n // 2]
            for x, i in xs:
                out[i] = 2 * abs(2 * x - med2) > k * mad2d
        return out

    @settings(max_examples=25, deadline=None)
    @given(st.lists(
        st.tuples(st.integers(0, 2), st.integers(-1000, 1000)),
        min_size=1, max_size=40,
    ))
    def run(raw):
        data = [("g%d" % g, i, x) for i, (g, x) in enumerate(raw)]
        got = {r.id: bool(r.is_outlier)
               for r in mad_outliers(
                   spark.createDataFrame(
                       data, "g STRING, id BIGINT, x BIGINT")
               ).collect()}
        want = model([(g, i, x) for g, i, x in data])
        assert got == want

    run()
