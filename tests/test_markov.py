"""Battery for operators/markov.py — first-order transition matrix."""

from __future__ import annotations

import duckdb
import pytest

from core_spark.operators.markov import (
    sql_transition_matrix,
    transition_matrix,
)

pytestmark = pytest.mark.spark


def _rows(spark, data):
    return spark.createDataFrame(
        data, "user_id BIGINT, ts BIGINT, event_type STRING, event_id BIGINT"
    )


def _got(spark, data):
    df = transition_matrix(_rows(spark, data), order_col="ts")
    return {
        (r.src, r.dst): (r.n, r.src_total, r.prob) for r in df.collect()
    }


def test_simple_chain(spark):
    # one user: a -> b -> a -> c
    got = _got(spark, [
        (1, 1, "a", 10), (1, 2, "b", 11), (1, 3, "a", 12), (1, 4, "c", 13),
    ])
    assert got == {
        ("a", "b"): (1, 2, 0.5),
        ("a", "c"): (1, 2, 0.5),
        ("b", "a"): (1, 1, 1.0),
    }


def test_entities_never_mix(spark):
    # last event of user 1 and first of user 2 form NO transition
    got = _got(spark, [
        (1, 1, "a", 10), (1, 2, "b", 11),
        (2, 3, "c", 12), (2, 4, "d", 13),
    ])
    assert got == {("a", "b"): (1, 1, 1.0), ("c", "d"): (1, 1, 1.0)}


def test_tiebreak_on_equal_timestamps(spark):
    # same ts: event_id orders them deterministically a(1) -> b(2) -> c(3)
    got = _got(spark, [
        (1, 5, "b", 2), (1, 5, "a", 1), (1, 5, "c", 3),
    ])
    assert got == {("a", "b"): (1, 1, 1.0), ("b", "c"): (1, 1, 1.0)}


def test_single_event_and_null_hygiene(spark):
    got = _got(spark, [
        (1, 1, "a", 10),            # single event: no transition
        (None, 1, "x", 11),          # NULL entity dropped
        (2, 1, None, 12), (2, 2, "b", 13), (2, 3, "c", 14),
    ])
    # user 2's NULL state is dropped on ingest: b -> c remains
    assert got == {("b", "c"): (1, 1, 1.0)}


def test_probabilities_row_normalize(spark):
    data = []
    eid = 0
    for rep in range(3):
        for s in ["a", "b"]:
            data.append((1, eid, s, eid))
            eid += 1
    # a->b, b->a, a->b, b->a, a->b  (6 events, 5 transitions)
    got = _got(spark, data)
    assert got[("a", "b")] == (3, 3, 1.0)
    assert got[("b", "a")] == (2, 2, 1.0)


def test_duckdb_twin_matches(spark):
    data = [
        (u, t, ["a", "b", "c"][(u * t) % 3], u * 100 + t)
        for u in range(1, 6) for t in range(1, 8)
    ]
    got = _got(spark, data)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE e (user_id BIGINT, ts BIGINT,"
        " event_type VARCHAR, event_id BIGINT)"
    )
    con.executemany("INSERT INTO e VALUES (?, ?, ?, ?)", data)
    want = {
        (src, dst): (n, st, p)
        for src, dst, n, st, p in con.sql(
            sql_transition_matrix("SELECT * FROM e")
        ).fetchall()
    }
    assert got == want
