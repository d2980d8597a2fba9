"""Battery for operators/abtest.py — pooled two-proportion z."""

from __future__ import annotations

import math

import duckdb
import pytest

from core_spark.operators.abtest import sql_two_proportion, two_proportion

pytestmark = pytest.mark.spark


def _got(spark, data):
    df = spark.createDataFrame(data, "is_a BOOLEAN, converted BOOLEAN")
    return two_proportion(df).collect()[0]


def test_sufficient_statistics_and_z_model(spark):
    data = [(True, True)] * 30 + [(True, False)] * 70
    data += [(False, True)] * 50 + [(False, False)] * 50
    r = _got(spark, data)
    assert (r.n_a, r.c_a, r.n_b, r.c_b) == (100, 30, 100, 50)
    assert r.rate_a == 0.3 and r.rate_b == 0.5
    p = 80 / 200
    z = (0.3 - 0.5) / math.sqrt(p * (1 - p) * (1 / 100 + 1 / 100))
    assert r.z == pytest.approx(z, rel=1e-12)
    assert r.z < 0  # arm A converts worse


def test_degenerate_arms_are_null_never_nan(spark):
    # all converted: pooled p = 1 -> zero variance -> NULL z
    r = _got(spark, [(True, True)] * 5 + [(False, True)] * 5)
    assert r.z is None and r.rate_a == 1.0
    # none converted
    r = _got(spark, [(True, False)] * 5 + [(False, False)] * 5)
    assert r.z is None
    # empty arm
    r = _got(spark, [(True, True), (True, False)])
    assert r.n_b == 0 and r.z is None and r.rate_b is None


def test_null_units_dropped(spark):
    r = _got(spark, [(True, True), (None, True), (False, None),
                     (False, False)])
    assert (r.n_a, r.c_a, r.n_b, r.c_b) == (1, 1, 1, 0)


def test_duckdb_twin_bit_identical(spark):
    data = [(i % 3 != 0, (i * 7) % 5 < 2) for i in range(200)]
    r = _got(spark, data)
    con = duckdb.connect()
    con.execute("CREATE TABLE u (is_a BOOLEAN, converted BOOLEAN)")
    con.executemany("INSERT INTO u VALUES (?, ?)", data)
    w = con.sql(sql_two_proportion("SELECT * FROM u")).fetchone()
    # FIXED-ORDER IEEE chain: the doubles must match bit-for-bit
    assert (r.n_a, r.c_a, r.n_b, r.c_b) == w[:4]
    assert r.rate_a == w[4] and r.rate_b == w[5] and r.z == w[6]
