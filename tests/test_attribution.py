"""Battery for operators/attribution.py — last/first-touch credit."""

from __future__ import annotations

import duckdb
import pytest

from core_spark.operators.attribution import attribution, sql_attribution

pytestmark = pytest.mark.spark


def _got(spark, data):
    df = spark.createDataFrame(
        data, "user_id BIGINT, t BIGINT, id BIGINT, event_type STRING")
    return {
        r.channel: (r.last_touch, r.first_touch)
        for r in attribution(df).collect()
    }


def test_last_vs_first_touch_divergence(spark):
    # user journey: view -> click -> purchase
    data = [(1, 0, 1, "view"), (1, 1, 2, "click"), (1, 2, 3, "purchase")]
    got = _got(spark, data)
    assert got["click"] == (1, 0)   # last touch
    assert got["view"] == (0, 1)    # first touch


def test_no_prior_touch_is_none_bucket(spark):
    data = [(1, 0, 1, "purchase"), (1, 1, 2, "view"),
            (2, 0, 3, "purchase")]
    got = _got(spark, data)
    assert got["(none)"] == (2, 2)


def test_conversion_never_self_credits(spark):
    # two purchases back to back: the second's last touch is the
    # click, NOT the first purchase (conversions are not channels)
    data = [(1, 0, 1, "click"), (1, 1, 2, "purchase"),
            (1, 2, 3, "purchase")]
    got = _got(spark, data)
    assert got["click"] == (2, 2)
    assert "(none)" not in got and "purchase" not in got


def test_users_isolated_and_tie_order(spark):
    # equal timestamps: id orders them — click(id=1) precedes
    # purchase(id=2)
    data = [(1, 5, 1, "click"), (1, 5, 2, "purchase"),
            (2, 0, 3, "view"), (2, 1, 4, "purchase")]
    got = _got(spark, data)
    assert got["click"] == (1, 1) and got["view"] == (1, 1)


def test_duckdb_twin_matches(spark):
    types = ["view", "click", "signup", "purchase", "error"]
    data = [(u, (u * 7 + i * 3) % 50, u * 100 + i,
             types[(u + i * i) % 5])
            for u in range(1, 8) for i in range(15)]
    got = _got(spark, data)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE e (user_id BIGINT, t BIGINT, id BIGINT,"
        " event_type VARCHAR)")
    con.executemany("INSERT INTO e VALUES (?, ?, ?, ?)", data)
    want = {
        c: (lt, ft)
        for c, lt, ft in con.sql(
            sql_attribution("SELECT * FROM e")
        ).fetchall()
    }
    assert got == want and got
