"""Areal interpolation: closed-form splits, conservation, closed-open
edges, hygiene, model parity, and the DuckDB twin."""

from __future__ import annotations

import duckdb
import pytest

from core_spark.operators.areal import areal_interpolate, sql_areal_interpolate


def _run(spark, cells, zones, g):
    c = spark.createDataFrame(cells, "cx long, cy long, value long")
    z = spark.createDataFrame(
        zones, "zone_id long, xmin long, ymin long, xmax long, ymax long")
    return {r["zone_id"]: (r["n_cells"], r["est_scaled"], r["est"])
            for r in areal_interpolate(c, z, g).collect()}


def _model(cells, zones, g):
    out = {}
    for zid, zx0, zy0, zx1, zy1 in zones:
        if not (zx0 < zx1 and zy0 < zy1):
            continue
        n = scaled = 0
        for cx, cy, v in cells:
            ow = min(cx * g + g, zx1) - max(cx * g, zx0)
            oh = min(cy * g + g, zy1) - max(cy * g, zy0)
            if ow > 0 and oh > 0:
                n += 1
                scaled += v * ow * oh
        if n:
            out[zid] = (n, scaled, scaled / (g * g))
    return out


def test_quarter_half_full_splits_are_exact(spark):
    # one cell [0,8)x[0,8) with value 64; three zones overlapping a
    # quarter, a half, and all of it
    cells = [(0, 0, 64)]
    zones = [(1, 0, 0, 4, 4), (2, 0, 0, 8, 4), (3, 0, 0, 8, 8)]
    got = _run(spark, cells, zones, 8)
    assert got == {1: (1, 64 * 16, 16.0), 2: (1, 64 * 32, 32.0),
                   3: (1, 64 * 64, 64.0)}


def test_mass_conservation_over_a_partition_of_the_frame(spark):
    # zones tile [0,16)x[0,8) exactly -> estimates sum to total mass
    cells = [(0, 0, 10), (1, 0, 30)]
    zones = [(1, 0, 0, 5, 8), (2, 5, 0, 11, 8), (3, 11, 0, 16, 8)]
    got = _run(spark, cells, zones, 8)
    assert sum(v[2] for v in got.values()) == pytest.approx(40.0)


def test_closed_open_edges_do_not_double_count(spark):
    cells = [(0, 0, 8), (1, 0, 8)]
    zones = [(1, 0, 0, 8, 8), (2, 8, 0, 16, 8)]  # abut at x = 8
    got = _run(spark, cells, zones, 8)
    assert got[1] == (1, 8 * 64, 8.0) and got[2] == (1, 8 * 64, 8.0)


def test_hygiene_degenerate_zones_and_validation(spark):
    cells = [(0, 0, 5)]
    zones = [(1, 0, 0, 4, 4), (2, 4, 4, 4, 9), (3, 6, 2, 2, 6)]
    got = _run(spark, cells, zones, 8)
    assert list(got) == [1]
    with pytest.raises(ValueError):
        _run(spark, cells, zones, 0)


def test_random_directories_match_model_and_duckdb(spark):
    g = 8
    cells = [(cx, cy, (cx * 7 + cy * 11) % 50 + 1)
             for cx in range(12) for cy in range(10)
             if (cx + cy) % 3 != 0]
    zones = []
    for r in range(20):
        x0, y0 = (r * 17) % 89, (r * 23) % 71
        zones.append((r, x0, y0, x0 + r % 13 + 1, y0 + r % 9 + 1))
    got = _run(spark, cells, zones, g)
    want = _model(cells, zones, g)
    assert set(got) == set(want)
    for k in want:
        assert got[k][:2] == want[k][:2]
        assert got[k][2] == pytest.approx(want[k][2])

    con = duckdb.connect()
    con.execute("CREATE TABLE ac AS SELECT * FROM (VALUES "
                + ",".join(f"({a},{b},{c})" for a, b, c in cells)
                + ") t(cx, cy, value)")
    con.execute("CREATE TABLE az AS SELECT * FROM (VALUES "
                + ",".join(f"({a},{b},{c},{d},{e})"
                           for a, b, c, d, e in zones)
                + ") t(zone_id, xmin, ymin, xmax, ymax)")
    duck = {int(z): (int(n), int(s), float(e)) for z, n, s, e in
            con.execute(sql_areal_interpolate(
                "SELECT * FROM ac", "SELECT * FROM az", g)).fetchall()}
    assert got == duck  # bit-identical incl. the one division
