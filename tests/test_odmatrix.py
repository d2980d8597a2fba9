"""OD flow matrix: model parity on both engines, trip semantics, gates."""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest

from core_spark.operators.odmatrix import od_flows, sql_od_flows


def _t(day, hour):
    return dt.datetime(2024, 1, day, hour, 0, 0)


# (user, ts, id, lat, lon) — cell size 1.0 in the tests.
ROWS = [
    # u1 day1: three pings, middle ping ignored by trip endpoints
    (1, _t(1, 8), 100, 0.2, 0.2),
    (1, _t(1, 9), 101, 0.5, 3.4),
    (1, _t(1, 12), 102, 2.7, 5.1),
    # u1 day2: the reverse trip (its corridor has tiny marginals -> anomalous)
    (1, _t(2, 8), 110, 2.7, 5.1),
    (1, _t(2, 9), 111, 0.2, 0.2),
    # u2, u3 day1: same corridor as u1 day1
    (2, _t(1, 1), 200, 0.1, 0.9),
    (2, _t(1, 2), 201, 2.2, 5.9),
    (3, _t(1, 3), 300, 0.4, 0.3),
    (3, _t(1, 4), 301, 2.5, 5.5),
    # u4, u5, u6: other corridors
    (4, _t(1, 1), 400, 0.5, 0.5),
    (4, _t(1, 5), 401, 9.5, 9.5),
    (5, _t(1, 1), 500, 5.5, 5.5),
    (5, _t(1, 2), 501, 9.1, 9.9),
    (6, _t(1, 1), 600, 5.2, 5.8),
    (6, _t(1, 2), 601, 2.2, 5.2),
    # u7: single ping -> no trip
    (7, _t(1, 1), 700, 3.3, 3.3),
    # u8: both pings in one cell -> stationary, excluded
    (8, _t(1, 1), 800, 4.1, 4.1),
    (8, _t(1, 2), 801, 4.9, 4.9),
    # u9: NULL position dropped, remaining single ping -> no trip
    (9, _t(1, 1), 900, None, 2.0),
    (9, _t(1, 2), 901, 6.5, 6.5),
    # u10: timestamp tie -> event_id breaks endpoint order
    (10, _t(1, 6), 1000, 7.5, 7.5),
    (10, _t(1, 6), 1001, 2.2, 5.3),
]


def model(rows, g=1.0, num=2, den=1):
    trips_by = {}
    for e, ts, i, la, lo in rows:
        if e is None or ts is None or la is None or lo is None:
            continue
        import math
        key = (e, ts.date())
        cell = (math.floor(la / g), math.floor(lo / g))
        trips_by.setdefault(key, []).append((ts, i, cell))
    flows = {}
    for pings in trips_by.values():
        pings.sort()
        o, d = pings[0][2], pings[-1][2]
        if o != d:
            flows[(o, d)] = flows.get((o, d), 0) + 1
    total = sum(flows.values())
    m_o, m_d = {}, {}
    for (o, d), f in flows.items():
        m_o[o] = m_o.get(o, 0) + f
        m_d[d] = m_d.get(d, 0) + f
    out = {}
    for (o, d), f in flows.items():
        lift = float(f) * float(total) / (float(m_o[o]) * float(m_d[d]))
        anom = 1 if f * total * den > num * m_o[o] * m_d[d] else 0
        out[o + d] = (f, m_o[o], m_d[d], total, lift, anom)
    return out


EXPECT = model(ROWS)


def test_model_hand_checks():
    # 6 corridors, 8 trips total; the reverse corridor is the anomaly
    assert len(EXPECT) == 6
    assert EXPECT[(0, 0, 2, 5)][:4] == (3, 4, 5, 8)
    assert EXPECT[(0, 0, 2, 5)][5] == 0          # 3*8 < 2*4*5
    assert EXPECT[(2, 5, 0, 0)] == (1, 1, 1, 8, 8.0, 1)
    assert (3, 3) not in {k[:2] for k in EXPECT}  # u7 single ping
    assert (4, 4, 4, 4) not in EXPECT             # u8 stationary
    assert EXPECT[(7, 7, 2, 5)][0] == 1           # u10 tie broken by id


def _vals():
    rows = ", ".join(
        f"({e}, TIMESTAMP '{ts}', {i}, "
        + ("NULL" if la is None else repr(la)) + ", "
        + ("NULL" if lo is None else repr(lo)) + ")"
        for e, ts, i, la, lo in ROWS
    )
    return f"SELECT * FROM (VALUES {rows}) t(user_id, ts, event_id, lat, lon)"


def _key(r):
    return (r[0], r[1], r[2], r[3])


def test_duckdb_twin_matches_model():
    got = {
        _key(r): tuple(r[4:])
        for r in duckdb.sql(sql_od_flows(_vals(), 1.0)).fetchall()
    }
    assert got == EXPECT


@pytest.mark.spark
def test_spark_matches_model(spark):
    df = spark.createDataFrame(
        ROWS,
        "user_id long, ts timestamp, event_id long, lat double, lon double",
    )
    got = {
        (r["o_i"], r["o_j"], r["d_i"], r["d_j"]): (
            r["flow"], r["m_o"], r["m_d"], r["total"],
            r["lift"], r["anomalous"],
        )
        for r in od_flows(df, 1.0).collect()
    }
    assert got == EXPECT


@pytest.mark.spark
def test_boundary_lift_is_not_anomalous(spark):
    """flow·total·den == num·m_o·m_d exactly -> strict > keeps it 0."""
    rows = [(1, _t(1, 1), 1, 0.5, 0.5), (1, _t(1, 2), 2, 3.5, 3.5)]
    df = spark.createDataFrame(
        rows,
        "user_id long, ts timestamp, event_id long, lat double, lon double",
    )
    out = od_flows(df, 1.0, factor_num=1, factor_den=1).collect()
    assert len(out) == 1 and out[0]["lift"] == 1.0
    assert out[0]["anomalous"] == 0


@pytest.mark.spark
def test_marginals_broadcast_never_sortmerge(spark):
    df = spark.createDataFrame(
        ROWS,
        "user_id long, ts timestamp, event_id long, lat double, lon double",
    )
    plan = od_flows(df, 1.0)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_rejects_bad_params():
    # validation fires before the DataFrame is touched
    with pytest.raises(ValueError):
        od_flows(None, 0.0)
    with pytest.raises(ValueError):
        od_flows(None, 1.0, factor_num=0)
    with pytest.raises(ValueError):
        od_flows(None, 1.0, factor_den=-1)
