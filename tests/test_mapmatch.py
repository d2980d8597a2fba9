"""Map matching: model parity both engines, argmin ties, sequences."""

from __future__ import annotations

import duckdb
import pytest

from core_spark.operators.mapmatch import map_match, sql_map_match

# Roads: two horizontal segments y=0 and y=10, one vertical x=20.
ROADS = [
    (1, 0, 0, 10, 0),
    (2, 0, 10, 10, 10),
    (3, 20, 0, 20, 10),
]

# Pings (user, seq, x, y): u1 walks road1 -> road2 -> road3 -> road3;
# u2 stays on road1 (no transition); u3 has an unmatched gap ping that
# the sequence must SKIP (transition still counted across the gap);
# u4's ping at y=5 ties road1/road2 at distance 5 -> seg id 1 wins.
PINGS = [
    (1, 1, 2, 1), (1, 2, 3, 9), (1, 3, 20, 5), (1, 4, 19, 6),
    (2, 1, 1, 0), (2, 2, 8, 1),
    (3, 1, 5, 1), (3, 2, 50, 50), (3, 3, 6, 9),
    (4, 1, 5, 5),
    (5, None, 1, 1), (None, 1, 1, 1), (6, 1, None, 1),
]
EPS = 6


def model(pings, roads, eps):
    def d2(px, py, x1, y1, x2, y2):
        from fractions import Fraction
        abx, aby = x2 - x1, y2 - y1
        apx, apy = px - x1, py - y1
        tn = apx * abx + apy * aby
        td = abx * abx + aby * aby
        if td == 0 or tn <= 0:
            return Fraction(apx * apx + apy * apy)
        if tn >= td:
            return Fraction((px - x2) ** 2 + (py - y2) ** 2)
        return Fraction(apx * apx + apy * apy) - Fraction(tn * tn, td)

    best = {}
    for e, q, px, py in pings:
        if e is None or q is None or px is None or py is None:
            continue
        cands = []
        for sid, x1, y1, x2, y2 in roads:
            dd = d2(px, py, x1, y1, x2, y2)
            if dd <= eps * eps:
                cands.append((float(dd), sid))
        if cands:
            best[(e, q)] = min(cands)[1]
    seqs = {}
    for (e, q), road in sorted(best.items()):
        seqs.setdefault(e, []).append(road)
    out = {}
    for roads_seq in seqs.values():
        for a, b in zip(roads_seq, roads_seq[1:]):
            if a != b:
                out[(a, b)] = out.get((a, b), 0) + 1
    return out


EXPECT = model(PINGS, ROADS, EPS)


def test_model_hand_checks():
    # u1: 1 -> 2 -> 3 (-> 3 dwell, no transition); u3: 1 -> 2 across gap
    assert EXPECT == {(1, 2): 2, (2, 3): 1}


def _pvals():
    rows = ", ".join(
        "(" + ", ".join("NULL" if v is None else str(v) for v in r) + ")"
        for r in PINGS
    )
    return f"SELECT * FROM (VALUES {rows}) t(user_id, event_id, x, y)"


def _rvals():
    rows = ", ".join(str(r) for r in ROADS)
    return f"SELECT * FROM (VALUES {rows}) t(seg_id, x1, y1, x2, y2)"


def test_duckdb_twin_matches_model():
    got = {
        (r[0], r[1]): r[2]
        for r in duckdb.sql(sql_map_match(_pvals(), _rvals(), EPS)).fetchall()
    }
    assert got == EXPECT


@pytest.mark.spark
def test_spark_matches_model(spark):
    pings = spark.createDataFrame(
        PINGS, "user_id long, event_id long, x long, y long")
    roads = spark.createDataFrame(
        ROADS, "seg_id long, x1 long, y1 long, x2 long, y2 long")
    got = {
        (r["road_from"], r["road_to"]): r["n_transitions"]
        for r in map_match(pings, roads, EPS, 4.0).collect()
    }
    assert got == EXPECT


@pytest.mark.spark
def test_tie_breaks_to_lowest_seg_id(spark):
    pings = spark.createDataFrame(
        [(4, 1, 5, 5), (4, 2, 20, 5)],
        "user_id long, event_id long, x long, y long")
    roads = spark.createDataFrame(
        ROADS, "seg_id long, x1 long, y1 long, x2 long, y2 long")
    got = map_match(pings, roads, EPS, 4.0).collect()
    # the tied ping resolves to road 1, then road 3: exactly one edge
    assert {(r["road_from"], r["road_to"]) for r in got} == {(1, 3)}


@pytest.mark.spark
def test_cell_size_invariance(spark):
    pings = spark.createDataFrame(
        PINGS, "user_id long, event_id long, x long, y long")
    roads = spark.createDataFrame(
        ROADS, "seg_id long, x1 long, y1 long, x2 long, y2 long")
    for cell in (2.0, 7.0, 25.0):
        got = {
            (r["road_from"], r["road_to"]): r["n_transitions"]
            for r in map_match(pings, roads, EPS, cell).collect()
        }
        assert got == EXPECT


def test_rejects_bad_params():
    with pytest.raises(ValueError):
        map_match(None, None, EPS, 0.0)
    with pytest.raises(ValueError):
        map_match(None, None, -1, 4.0)
