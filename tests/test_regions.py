"""Region labeling: model parity both engines, shapes, cuts, guard."""

from __future__ import annotations

import math

import duckdb
import pytest

from core_spark.operators.regions import _B, regionize, sql_regionize

# cell 1.0, min_count 2: an L-shaped region, a separate 2-cell bar that
# only a DIAGONAL would bridge (rook must keep them apart), an isolated
# active cell, and a sparse cell cut by min_count.
PTS = []


def _fill(cx, cy, n):
    for i in range(n):
        PTS.append((cx + 0.1 + 0.2 * (i % 4), cy + 0.1 + 0.2 * (i // 4)))


_fill(0, 0, 3)   # L: (0,0)
_fill(1, 0, 2)   # L: (1,0)
_fill(1, 1, 4)   # L: (1,1)
_fill(2, 2, 2)   # bar: (2,2) — diagonal from (1,1): separate under rook
_fill(3, 2, 2)   # bar: (3,2)
_fill(9, 9, 5)   # isolated cell
_fill(5, 5, 1)   # below min_count=2: inactive
PTS.append((None, 3.0))
PTS.append((float("nan"), 3.0))


def model(pts, g=1.0, m=2):
    from collections import Counter
    counts = Counter(
        (math.floor(lo / g), math.floor(la / g))
        for la, lo in pts
        if la is not None and lo is not None
        and not math.isnan(la) and not math.isnan(lo)
    )
    active = {c: n for c, n in counts.items() if n >= m}
    # note: cell key is (cx, cy) = (floor(lon/g), floor(lat/g))
    parent = {c: c for c in active}

    def find(c):
        while parent[c] != c:
            c = parent[c]
        return c

    for (cx, cy) in active:
        for nx, ny in ((cx + 1, cy), (cx, cy + 1)):
            if (nx, ny) in active:
                ra, rb = find((cx, cy)), find((nx, ny))
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for c in active:
        comp.setdefault(find(c), []).append(c)
    out = {}
    for root, members in comp.items():
        rid = min((cx + _B) * 2 * _B + (cy + _B) for cx, cy in members)
        cells = len(members)
        mass = sum(active[c] for c in members)
        for cx, cy in members:
            out[(cx, cy)] = (active[(cx, cy)], rid, cells, mass)
    return out


EXPECT = model(PTS)


def test_model_hand_checks():
    # pts are (lat, lon); cells key on (cx=floor(lon), cy=floor(lat)):
    # _fill(cx, cy, n) places n pts in lat cell cx... so swap: _fill's
    # first arg landed in LAT -> cy' = first arg. Verify structure only:
    regions = {}
    for cell, (_x, rid, cells, mass) in EXPECT.items():
        regions.setdefault(rid, set()).add(cell)
    sizes = sorted(len(v) for v in regions.values())
    assert sizes == [1, 2, 3]
    masses = sorted(
        next(iter({EXPECT[c][3] for c in v})) for v in regions.values())
    assert masses == [4, 5, 9]


def _vals():
    rows = ", ".join(
        "(" + ("NULL" if la is None
               else ("'NaN'::DOUBLE" if math.isnan(la) else repr(la))) + ", "
        + repr(lo) + ")"
        for la, lo in PTS
    )
    return f"SELECT * FROM (VALUES {rows}) t(lat, lon)"


def test_duckdb_twin_matches_model():
    got = {
        (r[0], r[1]): (r[2], r[3], r[4], r[5])
        for r in duckdb.sql(sql_regionize(_vals(), 1.0, 2)).fetchall()
    }
    assert got == EXPECT


@pytest.mark.spark
def test_spark_matches_model(spark):
    df = spark.createDataFrame(PTS, "lat double, lon double")
    got = {
        (r["cx"], r["cy"]): (r["x"], r["region"],
                             r["region_cells"], r["region_mass"])
        for r in regionize(df, 1.0, 2).collect()
    }
    assert got == EXPECT


@pytest.mark.spark
def test_min_count_one_merges_more(spark):
    df = spark.createDataFrame(PTS, "lat double, lon double")
    got = {
        (r["cx"], r["cy"])
        for r in regionize(df, 1.0, 1).collect()
    }
    assert len(got) == len(EXPECT) + 1  # the sparse cell joins in


@pytest.mark.spark
def test_guard_fires_on_unpackable_grid(spark):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    df = spark.createDataFrame([(0.5, 3.0e8)], "lat double, lon double")
    with pytest.raises((Py4JJavaError, SparkRuntimeException, Exception),
                       match="packable"):
        regionize(df, 0.0001, 1).collect()


def test_rejects_bad_params():
    with pytest.raises(ValueError):
        regionize(None, 1.0, 0)
