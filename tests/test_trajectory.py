"""Trajectory stats: model parity, ordering ties, zeros, one-Exchange plan."""

from __future__ import annotations

import math

import duckdb
import pytest

from core_spark.operators.trajectory import (
    sql_trajectory_stats,
    trajectory_stats,
)

# (user, ts, id, lat, lon) — 3-4-5 legs so step lengths are EXACT
ROWS = [
    (1, 10, 100, 0.0, 0.0),
    (1, 20, 101, 3.0, 4.0),    # step 5.0
    (1, 30, 102, 3.0, 10.0),   # step 6.0
    (2, 5, 200, 1.0, 1.0),     # single point
    (3, 7, 300, 0.0, 0.0),     # ts tie with 301: id breaks the order
    (3, 7, 301, 6.0, 8.0),     # step 10.0 (and order 300 -> 301)
    (3, 9, 302, 6.0, 8.0),     # zero-length step
    (4, 1, 400, None, 2.0),    # NULL position dropped on ingest
    (4, 2, 401, 5.0, 5.0),
]


def model(rows):
    by_e = {}
    for e, ts, i, la, lo in rows:
        if la is None or lo is None:
            continue
        by_e.setdefault(e, []).append((ts, i, la, lo))
    out = {}
    for e, pts in by_e.items():
        pts.sort()
        steps = [
            math.floor(
                math.sqrt((b[2] - a[2]) ** 2 + (b[3] - a[3]) ** 2) * 1e6
            )
            for a, b in zip(pts, pts[1:])
        ]
        disp = math.floor(
            math.sqrt(
                (pts[-1][2] - pts[0][2]) ** 2 + (pts[-1][3] - pts[0][3]) ** 2
            ) * 1e6
        )
        out[e] = (
            len(pts), sum(steps), disp, max(steps, default=0),
            min(p[2] for p in pts), max(p[2] for p in pts),
            min(p[3] for p in pts), max(p[3] for p in pts),
        )
    return out


EXPECT = model(ROWS)


def test_model_hand_checks():
    assert EXPECT[1] == (3, 11_000_000, 10_440_306, 6_000_000,
                         0.0, 3.0, 0.0, 10.0)
    assert EXPECT[2] == (1, 0, 0, 0, 1.0, 1.0, 1.0, 1.0)
    assert EXPECT[3][:4] == (3, 10_000_000, 10_000_000, 10_000_000)
    assert EXPECT[4] == (1, 0, 0, 0, 5.0, 5.0, 5.0, 5.0)


def _vals():
    rows = ", ".join(
        f"({e}, {ts}, {i}, "
        + ("NULL" if la is None else repr(la)) + ", "
        + ("NULL" if lo is None else repr(lo)) + ")"
        for e, ts, i, la, lo in ROWS
    )
    return f"SELECT * FROM (VALUES {rows}) t(user_id, ts, event_id, lat, lon)"


def test_duckdb_twin_matches_model():
    got = {
        r[0]: tuple(r[1:])
        for r in duckdb.sql(sql_trajectory_stats(_vals())).fetchall()
    }
    assert got == EXPECT


@pytest.mark.spark
def test_spark_matches_model_and_twin(spark):
    df = spark.createDataFrame(
        ROWS, "user_id long, ts long, event_id long, lat double, lon double"
    )
    got = {
        r["user_id"]: (
            r["n_points"], r["path_len_micro"], r["displacement_micro"],
            r["max_step_micro"], r["min_lat"], r["max_lat"],
            r["min_lon"], r["max_lon"],
        )
        for r in trajectory_stats(df).collect()
    }
    assert got == EXPECT


@pytest.mark.spark
def test_plan_single_exchange(spark):
    """The lag window and the rollup share the entity hash clustering."""
    df = spark.createDataFrame(
        ROWS, "user_id long, ts long, event_id long, lat double, lon double"
    )
    plan = (
        trajectory_stats(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
