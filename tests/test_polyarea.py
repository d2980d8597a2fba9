"""Shoelace area + centroid: hand geometry, holes, winding, engine twins."""

from __future__ import annotations

import duckdb
import pytest

from core_spark.operators.polyarea import area_exprs, polygon_area

SQUARE = [[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]]
SQUARE_CW = list(reversed(SQUARE))
HOLE = [[1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 2.0], [1.0, 1.0]]
TRIANGLE = [[0.0, 0.0], [6.0, 0.0], [0.0, 6.0], [0.0, 0.0]]
DEGENERATE = [[1.0, 1.0], [3.0, 3.0], [5.0, 5.0], [1.0, 1.0]]  # collinear

# (pid, rings, expected area2_abs, cx, cy)
CASES = [
    (0, [SQUARE], 32.0, 2.0, 2.0),
    (1, [SQUARE, HOLE], 30.0, 2.0, 2.0),      # hole subtracted, label stays
    (2, [SQUARE_CW], 32.0, 2.0, 2.0),          # winding-independent
    (3, [TRIANGLE], 36.0, 2.0, 2.0),           # centroid = (6/3, 6/3)
    (4, [DEGENERATE], 0.0, None, None),        # zero area -> NULL centroid
]


def _duck(rings) -> tuple:
    import json

    exprs = area_exprs("rings", "duckdb")
    cols = ", ".join(f"{e} AS {n}" for n, e in exprs.items())
    lit = json.dumps(rings).replace("[", "[").replace("]", "]")
    q = (
        f"SELECT {cols} FROM (SELECT CAST({lit} AS DOUBLE[][][]) AS rings)"
    )
    return duckdb.sql(q).fetchone()


def test_duckdb_emission_hand_geometry():
    for pid, rings, a2, cx, cy in CASES:
        n_rings, n_verts, area2, gx, gy = _duck(rings)
        assert n_rings == len(rings)
        assert n_verts == sum(len(r) for r in rings)
        assert area2 == a2, f"case {pid}"
        assert gx == cx and gy == cy, f"case {pid}"


@pytest.mark.spark
def test_spark_matches_duckdb_and_hand_values(spark):
    df = spark.createDataFrame(
        [(pid, rings) for pid, rings, *_ in CASES],
        "pid long, rings array<array<array<double>>>",
    )
    got = {
        r["pid"]: (r["n_rings"], r["n_vertices"], r["area2_abs"],
                   r["cx"], r["cy"])
        for r in polygon_area(df).collect()
    }
    for pid, rings, a2, cx, cy in CASES:
        assert got[pid] == (len(rings), sum(len(r) for r in rings),
                            a2, cx, cy)
        assert got[pid] == tuple(_duck(rings))


@pytest.mark.spark
def test_composes_with_geojson_source(spark):
    """geojson_scan rings feed polygon_area directly."""
    import json

    from core_spark.sources.geojson import parse_geojson

    doc = json.dumps({
        "type": "Feature",
        "geometry": {"type": "Polygon", "coordinates": [SQUARE, HOLE]},
    })
    parsed = parse_geojson(
        spark.createDataFrame([("s", doc)], ["src", "geojson"])
    ).filter("rings IS NOT NULL")
    row = polygon_area(parsed).collect()[0]
    assert row["area2_abs"] == 30.0 and row["cx"] == 2.0


@pytest.mark.spark
def test_degenerate_inputs_never_crash(spark):
    """Empty rings arrays and sub-2-point rings: NULL/zero outputs, no
    ANSI array-index error (Spark's rings[0] on [] throws unguarded)."""
    rows = [
        (0, []),                      # empty rings array
        (1, [[[1.0, 1.0]]]),          # 1-point "ring"
        (2, [[[1.0, 1.0], [2.0, 2.0]]]),  # 2-point degenerate
    ]
    df = spark.createDataFrame(
        rows, "pid long, rings array<array<array<double>>>"
    )
    got = {
        r["pid"]: (r["n_rings"], r["area2_abs"], r["cx"])
        for r in polygon_area(df).collect()
    }
    assert got[0] == (0, None, None)
    assert got[1] == (1, 0.0, None)
    assert got[2] == (1, 0.0, None)
    # duckdb emission agrees
    for pid, rings in rows:
        n_rings, _, area2, gx, _ = _duck(rings) if rings else (0, 0, None, None, None)
        assert (n_rings, area2, gx) == got[pid] or rings == []


@pytest.mark.spark
def test_plan_is_shuffle_and_python_free(spark):
    df = spark.createDataFrame(
        [(0, [SQUARE])], "pid long, rings array<array<array<double>>>"
    )
    plan = polygon_area(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
