"""Battery for operators/frechet.py — order-aware trajectory join."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest

from core_spark.operators.frechet import frechet_join, sql_frechet_decision

pytestmark = pytest.mark.spark


def _model(A, B):
    """Independent Python value-DP (the probe formulation: full (m,n)
    matrix, no rolling rows, no lower-bound shortcut)."""
    A, B = np.asarray(A, float), np.asarray(B, float)
    d = np.floor(
        ((A[:, None, 0] - B[None, :, 0]) ** 2
         + (A[:, None, 1] - B[None, :, 1]) ** 2) * 1e6
    ).astype(np.int64)
    m, n = d.shape
    dp = np.empty((m, n), np.int64)
    dp[0, 0] = d[0, 0]
    for j in range(1, n):
        dp[0, j] = max(dp[0, j - 1], d[0, j])
    for i in range(1, m):
        dp[i, 0] = max(dp[i - 1, 0], d[i, 0])
        for j in range(1, n):
            dp[i, j] = max(d[i, j],
                           min(dp[i - 1, j], dp[i, j - 1],
                               dp[i - 1, j - 1]))
    return int(dp[m - 1, n - 1])


def _df(spark, trajs):
    rows = [
        (tid, t, t, float(la), float(lo))
        for tid, pts in trajs.items()
        for t, (la, lo) in enumerate(pts)
    ]
    return spark.createDataFrame(
        rows, "tid BIGINT, t BIGINT, id BIGINT, lat DOUBLE, lon DOUBLE")


def _got(spark, trajs, t):
    return {
        (r.tid_a, r.tid_b): r.fd2_micro
        for r in frechet_join(_df(spark, trajs), t).collect()
    }


def test_order_matters_vs_hausdorff(spark):
    # same point SET walked in opposite directions: Hausdorff 0, but
    # Fréchet = the full path span (the leash must cross)
    path = [(0.0, 0.0), (0.0, 1.0), (0.0, 2.0), (0.0, 3.0)]
    trajs = {1: path, 2: path[::-1]}
    got = _got(spark, trajs, 10.0)
    fd = got[(1, 2)]
    assert fd == _model(path, path[::-1])
    assert math.sqrt(fd / 1e6) == pytest.approx(3.0, abs=1e-3)


def test_identical_and_shifted(spark):
    p = [(0.0, 0.0), (1.0, 1.0), (2.0, 0.0)]
    q = [(0.0, 0.5), (1.0, 1.5), (2.0, 0.5)]
    got = _got(spark, {1: p, 2: p, 3: q}, 1.0)
    assert got[(1, 2)] == 0
    # uniform 0.5 shift: dF = 0.5 exactly
    assert got[(1, 3)] == got[(2, 3)] == 250000


def test_threshold_excludes(spark):
    p = [(0.0, 0.0), (1.0, 0.0)]
    q = [(0.0, 5.0), (1.0, 5.0)]
    assert _got(spark, {1: p, 2: q}, 1.0) == {}
    got = _got(spark, {1: p, 2: q}, 6.0)
    assert got[(1, 2)] == _model(p, q)


def test_value_matches_model_on_random_walks(spark):
    rng = {
        tid: [((i * 13 + tid * 7) % 9 * 0.25,
               (i * 5 + tid * 3) % 7 * 0.25)
              for i in range(12)]
        for tid in range(1, 6)
    }
    got = _got(spark, rng, 3.0)
    assert got  # live
    for (a, b), fd in got.items():
        assert fd == _model(rng[a], rng[b])
    # and nothing qualifying was missed by blocking/lower-bound
    want = {
        (a, b)
        for a in rng for b in rng if a < b
        if _model(rng[a], rng[b]) <= int(9.0 * 1e6)
    }
    assert set(got) == want


def test_validation_and_guard(spark):
    df = _df(spark, {1: [(0.0, 0.0)]})
    with pytest.raises(ValueError):
        frechet_join(df, 0)
    with pytest.raises(Exception) as ei:
        frechet_join(
            _df(spark, {1: [(0.0, float(i) * 0.001) for i in range(5)]}),
            1.0, max_points=3,
        ).collect()
    assert "exceeds" in str(ei.value)


def test_decision_twin_matches(spark):
    trajs = {
        tid: [((i * 11 + tid * 5) % 8 * 0.3,
               (i * 7 + tid * 2) % 6 * 0.3)
              for i in range(10)]
        for tid in range(1, 7)
    }
    got = set(_got(spark, trajs, 1.2))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE p (tid BIGINT, t BIGINT, id BIGINT,"
        " lat DOUBLE, lon DOUBLE)")
    con.executemany(
        "INSERT INTO p VALUES (?, ?, ?, ?, ?)",
        [(tid, t, t, la, lo)
         for tid, pts in trajs.items()
         for t, (la, lo) in enumerate(pts)],
    )
    want = {
        (a, b)
        for a, b, _, _ in con.sql(
            sql_frechet_decision("SELECT * FROM p", 1.2)
        ).fetchall()
    }
    assert got == want and got
