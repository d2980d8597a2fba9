"""Battery for operators/benford.py — first-digit audit."""

from __future__ import annotations

import duckdb
import pytest

from core_spark.operators.benford import (
    BENFORD_MILLIS,
    first_digit_audit,
    sql_first_digit_audit,
)

pytestmark = pytest.mark.spark


def _audit(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "x DOUBLE")
    return {r.digit: r for r in first_digit_audit(df, "x").collect()}


def test_expectation_literals_sum_to_1000():
    assert sum(BENFORD_MILLIS) == 1000
    assert len(BENFORD_MILLIS) == 9


def test_first_digit_extraction(spark):
    got = _audit(spark, [1.0, 19.5, 123.0, 2.0, 999.99, 9.0])
    obs = {d: r.n_obs for d, r in got.items()}
    assert obs == {1: 3, 2: 1, 3: 0, 4: 0, 5: 0, 6: 0, 7: 0, 8: 0, 9: 2}
    # zero-count digits still report, with full one-sided deviation
    assert got[3].dev == BENFORD_MILLIS[2] * 6


def test_exclusions_counted_not_digited(spark):
    got = _audit(spark, [0.5, 0.0, -7.0, None, 42.0])
    assert got[4].n_obs == 1
    assert all(r.n_total == 1 and r.n_excluded == 4 for r in got.values())


def test_perfect_benford_sample_has_small_dev(spark):
    # a sample drawn exactly at the per-mille expectation: dev == 0
    vals = []
    for d, m in zip(range(1, 10), BENFORD_MILLIS):
        vals += [float(d)] * m
    got = _audit(spark, vals)
    for d, m in zip(range(1, 10), BENFORD_MILLIS):
        r = got[d]
        assert r.n_obs == m and r.n_total == 1000
        assert r.dev == 0 and r.obs_millis == m
        assert r.share == m / 1000.0


def test_empty_input_is_typed_and_null_safe(spark):
    got = _audit(spark, [])
    assert len(got) == 9
    for r in got.values():
        assert r.n_obs == 0 and r.n_total == 0 and r.dev == 0
        assert r.obs_millis is None and r.share is None


def test_duckdb_twin_matches(spark):
    vals = [float(v) for v in
            [1, 17, 23, 456, 78, 9000, 0.2, -3, 111, 65, 41, 2]]
    got = {
        d: (r.n_obs, r.exp_millis, r.dev, r.obs_millis, r.share,
            r.n_total, r.n_excluded)
        for d, r in _audit(spark, vals).items()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    want = {
        d: tuple(rest)
        for d, *rest in con.sql(
            sql_first_digit_audit("SELECT * FROM t", "x")
        ).fetchall()
    }
    assert got == want
