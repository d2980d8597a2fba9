"""Stay points: model parity both engines, consecutiveness, plan."""

from __future__ import annotations

import datetime as dt
import math

import duckdb
import pytest

from core_spark.operators.staypoints import stay_points, sql_stay_points


def _t(minute):
    return dt.datetime(2024, 1, 1, 8, minute, 0)


# (user, ts, id, lat, lon), cell 1.0, min_pings 3:
# u1: 4-ping stay in (0,0), 1-ping hop to (5,5), 3-ping RETURN to (0,0)
#     — two separate stays in the same cell (consecutiveness!)
# u2: 3 pings in (2,2) but interleaved with (3,3) -> runs of 1-2: none
# u3: exactly 3 pings, tie timestamps broken by id
ROWS = [
    (1, _t(0), 10, 0.1, 0.1), (1, _t(1), 11, 0.5, 0.5),
    (1, _t(2), 12, 0.9, 0.2), (1, _t(3), 13, 0.3, 0.8),
    (1, _t(4), 14, 5.5, 5.5),
    (1, _t(5), 15, 0.2, 0.2), (1, _t(6), 16, 0.4, 0.4),
    (1, _t(7), 17, 0.6, 0.6),
    (2, _t(0), 20, 2.5, 2.5), (2, _t(1), 21, 3.5, 3.5),
    (2, _t(2), 22, 2.5, 2.5), (2, _t(3), 23, 3.5, 3.5),
    (2, _t(4), 24, 2.5, 2.5),
    (3, _t(0), 30, 7.5, 7.5), (3, _t(0), 31, 7.6, 7.6),
    (3, _t(1), 32, 7.7, 7.7),
    (4, None, 40, 1.0, 1.0), (None, _t(0), 41, 1.0, 1.0),
    (5, _t(0), 50, None, 1.0),
]


def model(rows, g=1.0, k=3):
    by_e = {}
    for e, ts, i, la, lo in rows:
        if e is None or ts is None or la is None or lo is None:
            continue
        by_e.setdefault(e, []).append(
            (ts, i, math.floor(la / g), math.floor(lo / g)))
    out = []
    for e, pts in by_e.items():
        pts.sort()
        run = []
        for p in pts + [(None, None, None, None)]:
            if run and (p[2], p[3]) != (run[-1][2], run[-1][3]):
                if len(run) >= k:
                    out.append((e, run[0][2], run[0][3],
                                run[0][0], run[-1][0], len(run)))
                run = []
            if p[0] is not None:
                run.append(p)
    return sorted(out)


EXPECT = model(ROWS)


def test_model_hand_checks():
    assert EXPECT == [
        (1, 0, 0, _t(0), _t(3), 4),
        (1, 0, 0, _t(5), _t(7), 3),
        (3, 7, 7, _t(0), _t(1), 3),
    ]


def _vals():
    rows = ", ".join(
        f"({'NULL' if e is None else e}, "
        + ("NULL" if ts is None else f"TIMESTAMP '{ts}'") + f", {i}, "
        + ("NULL" if la is None else repr(la)) + ", "
        + ("NULL" if lo is None else repr(lo)) + ")"
        for e, ts, i, la, lo in ROWS
    )
    return (f"SELECT * FROM (VALUES {rows})"
            " t(user_id, ts, event_id, lat, lon)")


@pytest.mark.parametrize("k", [1, 3, 4])
def test_duckdb_twin_matches_model(k):
    got = sorted(
        tuple(r) for r in
        duckdb.sql(sql_stay_points(_vals(), 1.0, k)).fetchall()
    )
    assert got == model(ROWS, k=k)


@pytest.mark.spark
@pytest.mark.parametrize("k", [1, 3])
def test_spark_matches_model(spark, k):
    df = spark.createDataFrame(
        ROWS, "user_id long, ts timestamp, event_id long,"
              " lat double, lon double")
    got = sorted(
        (r["user_id"], r["cell_i"], r["cell_j"],
         r["enter_ts"], r["exit_ts"], r["n_pings"])
        for r in stay_points(df, 1.0, k).collect()
    )
    assert got == model(ROWS, k=k)


@pytest.mark.spark
def test_plan_single_exchange(spark):
    """Both windows and the rollup share the entity hash clustering."""
    df = spark.createDataFrame(
        ROWS, "user_id long, ts timestamp, event_id long,"
              " lat double, lon double")
    plan = (
        stay_points(df, 1.0, 3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1


def test_rejects_bad_params():
    with pytest.raises(ValueError):
        stay_points(None, 0.0, 3)
    with pytest.raises(ValueError):
        stay_points(None, 1.0, 0)
