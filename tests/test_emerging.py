"""Emerging hot spots: planted trends, zero-fill semantics, degenerate
series, hygiene, model parity, and the DuckDB twin."""

from __future__ import annotations

import duckdb
import pytest

from core_spark.operators.emerging import emerging_hotspots, sql_emerging_hotspots


def _run(spark, pts, t=4, thresh=3, cell=1.0):
    df = spark.createDataFrame(pts, "lat double, lon double, bucket long")
    return {(r["cx"], r["cy"]): (r["n_total"], r["mk_s"], r["trend"])
            for r in emerging_hotspots(df, cell, t, thresh).collect()}


def _mk(series):
    return sum(
        (series[j] > series[i]) - (series[j] < series[i])
        for i in range(len(series)) for j in range(i + 1, len(series))
    )


def test_planted_rising_and_falling_trends(spark):
    pts = []
    for b in range(4):
        pts += [(0.5, 0.5, b)] * (b + 1)       # cell (0,0): 1,2,3,4 rising
        pts += [(0.5, 5.5, b)] * (4 - b)       # cell (5,0): 4,3,2,1 falling
        pts += [(0.5, 9.5, b)] * 2             # cell (9,0): flat
    got = _run(spark, pts)
    assert got[(0, 0)] == (10, _mk([1, 2, 3, 4]), "rising")
    assert got[(5, 0)] == (10, _mk([4, 3, 2, 1]), "falling")
    assert got[(9, 0)] == (8, 0, "flat")
    assert _mk([1, 2, 3, 4]) == 6 and _mk([4, 3, 2, 1]) == -6


def test_zero_fill_missing_buckets_count_as_zero(spark):
    # a cell seen only in the LAST bucket: series (0,0,0,5) -> S = +3
    pts = [(0.5, 0.5, 3)] * 5
    got = _run(spark, pts, t=4, thresh=3)
    assert got[(0, 0)] == (5, 3, "rising")


def test_constant_series_is_flat_and_validation(spark):
    pts = [(0.5, 0.5, b) for b in range(4)]
    assert _run(spark, pts)[(0, 0)] == (4, 0, "flat")
    with pytest.raises(ValueError):
        _run(spark, pts, t=1)
    with pytest.raises(ValueError):
        emerging_hotspots(
            spark.createDataFrame(pts, "lat double, lon double, bucket long"),
            0.0, 4, 3)


def test_hygiene_out_of_range_and_null(spark):
    pts = [(0.5, 0.5, 0), (0.5, 0.5, 99), (0.5, 0.5, -1),
           (None, 0.5, 1), (0.5, 0.5, None), (0.5, 0.5, 3)]
    got = _run(spark, pts, t=4, thresh=100)
    assert got[(0, 0)][0] == 2  # only the in-range, non-null rows


def test_matches_model_and_duckdb(spark):
    pts = [(float((r * 3) % 7) + 0.5, float((r * 5) % 6) + 0.5, r % 8)
           for r in range(300)]
    t, thresh = 8, 5
    got = _run(spark, pts, t=t, thresh=thresh)

    # python model
    from collections import Counter
    cube = Counter()
    for lat, lon, b in pts:
        cube[(int(lon), int(lat), b)] += 1
    cells = {(cx, cy) for cx, cy, _ in cube}
    for cx, cy in cells:
        series = [cube.get((cx, cy, b), 0) for b in range(t)]
        s = _mk(series)
        trend = ("rising" if s >= thresh else
                 "falling" if s <= -thresh else "flat")
        assert got[(cx, cy)] == (sum(series), s, trend), (cx, cy)

    con = duckdb.connect()
    con.execute("CREATE TABLE epts AS SELECT * FROM (VALUES "
                + ",".join(f"({a},{b},{c})" for a, b, c in pts)
                + ") s(lat, lon, bucket)")
    exp = {(int(cx), int(cy)): (int(n), int(s), tr)
           for cx, cy, n, s, tr in con.execute(sql_emerging_hotspots(
               "SELECT * FROM epts", 1.0, t, thresh)).fetchall()}
    assert exp == got
