"""Contact join: conjunction semantics, boundary exactness, single
emission, blocking completeness fuzz, hygiene, and the DuckDB twin."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from core_spark.operators.stjoin import contact_pairs, sql_contact_pairs


def _run(spark, events, eps, tau):
    df = spark.createDataFrame(
        events, "event_id long, x long, y long, t long")
    return sorted((r["a"], r["b"])
                  for r in contact_pairs(df, eps, tau).collect())


def _model(events, eps, tau):
    out = []
    for i, (ka, xa, ya, ta) in enumerate(events):
        for kb, xb, yb, tb in events[i + 1:]:
            lo, hi = min(ka, kb), max(ka, kb)
            if (xa - xb) ** 2 + (ya - yb) ** 2 <= eps * eps \
                    and abs(ta - tb) <= tau:
                out.append((lo, hi))
    return sorted(out)


def test_conjunction_near_in_space_xor_time_is_not_a_contact(spark):
    events = [
        (0, 0, 0, 100),
        (1, 3, 4, 100),    # dist 5, same time        -> contact at eps=5
        (2, 3, 4, 200),    # dist 5, 100 ticks apart  -> NOT (tau=10)
        (3, 100, 0, 100),  # same time, far away      -> NOT
        (4, 0, 0, 109),    # same spot, dt 9          -> contact
        (5, 0, 0, 111),    # same spot, dt 11         -> NOT
    ]
    # (1,4): dist 5 / dt 9 — both margins inside; (4,5): same spot dt 2
    assert _run(spark, events, eps=5, tau=10) \
        == [(0, 1), (0, 4), (1, 4), (4, 5)]


def test_boundaries_are_closed_and_exact(spark):
    # dist² == eps² and |dt| == tau both count (closed, integer-exact)
    events = [(0, 0, 0, 0), (1, 3, 4, 7)]
    assert _run(spark, events, eps=5, tau=7) == [(0, 1)]
    assert _run(spark, events, eps=4, tau=7) == []
    assert _run(spark, events, eps=5, tau=6) == []


def test_pair_in_same_block_emitted_once_and_validation(spark):
    events = [(7, 0, 0, 0), (9, 1, 1, 1)]
    assert _run(spark, events, eps=10, tau=10) == [(7, 9)]
    with pytest.raises(ValueError):
        _run(spark, events, 0, 5)
    with pytest.raises(ValueError):
        _run(spark, events, 5, 0)


def test_null_rows_dropped(spark):
    df = spark.createDataFrame(
        [(0, 0, 0, 0), (1, 1, 1, 1), (2, None, 0, 0), (3, 0, 0, None)],
        "event_id long, x long, y long, t long")
    assert sorted((r["a"], r["b"]) for r in
                  contact_pairs(df, 5, 5).collect()) == [(0, 1)]


_ev = st.tuples(st.integers(-9, 9), st.integers(-9, 9),
                st.integers(0, 40))


@given(st.lists(_ev, min_size=2, max_size=12),
       st.integers(1, 6), st.integers(1, 12))
@settings(max_examples=25, deadline=None)
def test_blocking_complete_vs_python_brute_force(spark, evs, eps, tau):
    events = [(i, *e) for i, e in enumerate(evs)]
    assert _run(spark, events, eps, tau) == _model(events, eps, tau)


def test_twin_parity_with_duckdb(spark):
    events = [(r, (r * 5) % 23, (r * 7) % 19, (r * 11) % 50)
              for r in range(80)]
    got = _run(spark, events, eps=3, tau=4)
    con = duckdb.connect()
    con.execute("CREATE TABLE ev0 AS SELECT * FROM (VALUES "
                + ",".join(f"({a},{b},{c},{d})" for a, b, c, d in events)
                + ") s(event_id, x, y, t)")
    exp = con.execute(sql_contact_pairs(
        "SELECT * FROM ev0", 3, 4)).fetchall()
    assert got == sorted((int(a), int(b)) for a, b in exp)
