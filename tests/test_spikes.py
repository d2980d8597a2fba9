"""Battery for operators/spikes.py — trailing-window spike flags."""

from __future__ import annotations

import duckdb
import pytest

from core_spark.operators.spikes import sql_trailing_spikes, trailing_spikes

pytestmark = pytest.mark.spark


def _got(spark, data, **kw):
    df = spark.createDataFrame(data, "k STRING, t BIGINT, x BIGINT")
    return {(r.k, r.t): r for r in trailing_spikes(df, **kw).collect()}


def test_cold_start_is_null_then_verdicts(spark):
    # W=3: t=1..3 have <3 history points -> NULL; t=4 on get verdicts
    data = [("a", t, 10) for t in range(1, 5)] + [("a", 5, 100)]
    got = _got(spark, data, window=3, num=2, den=1)
    assert got[("a", 1)].is_spike is None
    assert got[("a", 3)].is_spike is None
    assert got[("a", 4)].is_spike == 0   # 10 vs baseline 10
    assert got[("a", 5)].is_spike == 1   # 100 > 2x baseline 10


def test_cleared_denominator_boundary_is_strict(spark):
    # baseline mean 10, threshold 2x: x=20 is NOT a spike (strict >)
    data = [("a", t, 10) for t in range(1, 4)] + [("a", 4, 20), ("a", 5, 21)]
    got = _got(spark, data, window=3, num=2, den=1)
    assert got[("a", 4)].is_spike == 0
    # t=5 baseline = (10+10+20)/3: 21*3*1=63 > 2*40=80? no
    assert got[("a", 5)].is_spike == 0


def test_series_isolated_per_key(spark):
    data = [("a", t, 1000) for t in range(1, 5)]
    data += [("b", t, 1) for t in range(1, 4)] + [("b", 4, 5)]
    got = _got(spark, data, window=3, num=2, den=1)
    assert got[("b", 4)].is_spike == 1          # vs b's own baseline
    assert got[("a", 4)].is_spike == 0          # a's plateau


def test_baseline_window_slides(spark):
    # after a spike enters the baseline, the same level stops spiking
    data = [("a", 1, 10), ("a", 2, 10), ("a", 3, 100), ("a", 4, 100)]
    got = _got(spark, data, window=2, num=2, den=1)
    assert got[("a", 3)].is_spike == 1           # 100 vs mean 10
    assert got[("a", 4)].is_spike == 0           # 100 vs mean (10+100)/2
    assert got[("a", 4)].prev_sum == 110 and got[("a", 4)].n_prev == 2


def test_null_x_dropped_and_validation(spark):
    df = spark.createDataFrame(
        [("a", 1, 5), ("a", 2, None)], "k STRING, t BIGINT, x BIGINT")
    assert len(trailing_spikes(df, window=2).collect()) == 1
    with pytest.raises(ValueError):
        trailing_spikes(df, window=0)


def test_duckdb_twin_matches(spark):
    data = [("s%d" % (i % 2), i // 2, (i * 17) % 23 + 1)
            for i in range(40)]
    got = {
        k: (r.x, r.prev_sum, r.n_prev, r.is_spike)
        for k, r in _got(spark, data, window=4, num=3, den=2).items()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k VARCHAR, t BIGINT, x BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", data)
    want = {
        (k, t): (x, ps, np, s)
        for k, t, x, ps, np, s in con.sql(
            sql_trailing_spikes("SELECT * FROM t", window=4, num=3,
                                den=2)
        ).fetchall()
    }
    assert got == want
