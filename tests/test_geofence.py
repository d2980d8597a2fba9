"""Battery for operators/geofence.py — enter/exit/switch transitions."""

from __future__ import annotations

import duckdb
import pytest

from core_spark.operators.geofence import geofence_events, sql_geofence_events

pytestmark = pytest.mark.spark

_FENCES = [
    (0, 0.0, 0.0, 10.0, 10.0),
    (1, 20.0, 0.0, 30.0, 10.0),
    (2, 5.0, 0.0, 25.0, 10.0),   # overlaps 0 and 1: tie-break target
]


def _got(spark, pings, fences=_FENCES):
    p = spark.createDataFrame(
        pings, "user BIGINT, t BIGINT, id BIGINT, x DOUBLE, y DOUBLE")
    f = spark.createDataFrame(
        fences, "fence_id BIGINT, xmin DOUBLE, ymin DOUBLE,"
                " xmax DOUBLE, ymax DOUBLE")
    return [
        (r.user, r.t, r.from_fence, r.to_fence, r.event)
        for r in geofence_events(p, f)
        .orderBy("user", "t", "id").collect()
    ]


def test_enter_exit_switch_sequence(spark):
    pings = [
        (1, 0, 1, -5.0, 5.0),    # outside: no event (first ping out)
        (1, 1, 2, 2.0, 5.0),     # -> fence 0: enter
        (1, 2, 3, 3.0, 6.0),     # still 0: nothing
        (1, 3, 4, 22.0, 5.0),    # -> fence 1 (and 2; min wins): switch
        (1, 4, 5, 50.0, 50.0),   # -> outside: exit
    ]
    assert _got(spark, pings) == [
        (1, 1, -1, 0, "enter"),
        (1, 3, 0, 1, "switch"),
        (1, 4, 1, -1, "exit"),
    ]


def test_first_ping_inside_is_enter(spark):
    assert _got(spark, [(1, 0, 1, 2.0, 2.0)]) == [(1, 0, -1, 0, "enter")]


def test_overlap_resolves_to_lowest_id(spark):
    # x=7 is inside fences 0 AND 2 -> 0; x=15 only fence 2
    got = _got(spark, [(1, 0, 1, 7.0, 5.0), (1, 1, 2, 15.0, 5.0)])
    assert got == [(1, 0, -1, 0, "enter"), (1, 1, 0, 2, "switch")]


def test_boundary_edges_inclusive(spark):
    # exactly on xmax/ymax is inside
    assert _got(spark, [(1, 0, 1, 10.0, 10.0)]) == [
        (1, 0, -1, 0, "enter")]


def test_users_isolated_and_tie_on_t(spark):
    # same user, equal t: id orders the pings deterministically
    pings = [(1, 5, 2, 50.0, 50.0), (1, 5, 1, 2.0, 2.0),
             (2, 5, 3, 2.0, 2.0)]
    got = _got(spark, pings)
    assert (1, 5, -1, 0, "enter") in got       # id=1 first: enter
    assert (1, 5, 0, -1, "exit") in got        # id=2: exit
    assert (2, 5, -1, 0, "enter") in got       # user 2 independent


def test_null_pings_dropped(spark):
    pings = [(1, 0, 1, 2.0, 2.0), (1, 1, 2, None, 5.0),
             (1, 2, 3, 2.0, None), (1, None, 4, 3.0, 3.0)]
    assert _got(spark, pings) == [(1, 0, -1, 0, "enter")]


def test_duckdb_twin_matches(spark):
    pings = [
        (u, t, u * 100 + t,
         float((u * 7 + t * 13) % 35), float((u * 11 + t * 3) % 12))
        for u in range(1, 5) for t in range(12)
    ]
    got = set(_got(spark, pings))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE p (u BIGINT, t BIGINT, id BIGINT,"
        " x DOUBLE, y DOUBLE)")
    con.executemany("INSERT INTO p VALUES (?, ?, ?, ?, ?)", pings)
    con.execute(
        "CREATE TABLE f (fence_id BIGINT, xmin DOUBLE, ymin DOUBLE,"
        " xmax DOUBLE, ymax DOUBLE)")
    con.executemany("INSERT INTO f VALUES (?, ?, ?, ?, ?)", _FENCES)
    want = {
        (u, t, ff, tf, ev)
        for u, t, _, ff, tf, ev in con.sql(
            sql_geofence_events(
                "SELECT u AS \"user\", t, id, x, y FROM p",
                "SELECT * FROM f")
        ).fetchall()
    }
    assert {(u, t, ff, tf, ev) for u, t, ff, tf, ev in got} == want
