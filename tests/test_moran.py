"""Moran's I: closed-form lattices, sign behavior, degenerate surfaces,
hygiene, model parity, and the DuckDB twin."""

from __future__ import annotations

import duckdb
import pytest

from core_spark.operators.moran import cell_counts, morans_i, sql_morans_i


def _run(spark, cells):
    df = spark.createDataFrame(cells, "cx long, cy long, x long")
    return morans_i(df).collect()[0]


def _model(cells):
    """Brute-force Python model straight from the definition."""
    n = len(cells)
    s = sum(x for _, _, x in cells)
    dev = {(cx, cy): n * x - s for cx, cy, x in cells}
    pairs = [
        (di, dj)
        for (ci, di) in dev.items()
        for (cj, dj) in dev.items()
        if abs(ci[0] - cj[0]) + abs(ci[1] - cj[1]) == 1
    ]
    w = len(pairs)
    num = sum(di * dj for di, dj in pairs)
    den = sum(d * d for d in dev.values())
    moran = (num / den) * (n / w) if w > 0 and den > 0 else None
    return n, w, num, den, moran


def test_checkerboard_is_negative(spark):
    # 4x4 alternating 0/10: perfect repulsion -> I = -1
    cells = [(cx, cy, 10 * ((cx + cy) % 2)) for cx in range(4)
             for cy in range(4)]
    r = _run(spark, cells)
    n, w, num, den, moran = _model(cells)
    assert (r["n_cells"], r["w_edges"], r["num"], r["den"]) == (n, w, num, den)
    assert r["moran_i"] == pytest.approx(-1.0)


def test_two_blocks_is_positive(spark):
    # left half high, right half low: likes border likes -> I > 0
    cells = [(cx, cy, 100 if cx < 2 else 1) for cx in range(4)
             for cy in range(4)]
    r = _run(spark, cells)
    _, _, num, den, moran = _model(cells)
    assert (r["num"], r["den"]) == (num, den)
    assert r["moran_i"] == pytest.approx(moran) and r["moran_i"] > 0


def test_constant_surface_is_null(spark):
    cells = [(cx, 0, 7) for cx in range(5)]
    r = _run(spark, cells)
    assert r["den"] == 0 and r["moran_i"] is None


def test_no_adjacency_is_null(spark):
    cells = [(0, 0, 1), (5, 5, 2), (9, 0, 3)]
    r = _run(spark, cells)
    assert r["w_edges"] == 0 and r["num"] == 0 and r["moran_i"] is None


def test_ordered_pairs_counted_both_ways(spark):
    r = _run(spark, [(0, 0, 1), (1, 0, 2)])
    assert r["w_edges"] == 2  # (i,j) and (j,i), as the double sum demands


def test_cell_counts_hygiene(spark):
    pts = spark.createDataFrame(
        [(1.0, 2.0), (1.2, 2.2), (None, 1.0), (float("nan"), 1.0),
         (-3.7, -0.1)],
        "lat double, lon double",
    )
    rows = sorted(
        (r["cx"], r["cy"], r["x"])
        for r in cell_counts(pts, 1.0).collect()
    )
    assert rows == [(-1, -4, 1), (2, 1, 2)]
    with pytest.raises(ValueError):
        cell_counts(pts, 0.0)


def test_random_lattice_matches_model_and_duckdb(spark):
    cells = [(cx, cy, (cx * 7 + cy * 13) % 23 + ((cx * cy) % 5) * 11)
             for cx in range(6) for cy in range(5) if (cx + 2 * cy) % 7 != 0]
    r = _run(spark, cells)
    n, w, num, den, moran = _model(cells)
    assert (r["n_cells"], r["w_edges"], r["num"], r["den"]) == (n, w, num, den)
    assert r["moran_i"] == pytest.approx(moran)

    # twin parity on raw points through the full cell derivation
    pts = [(float(cy) + 0.5, float(cx) + 0.5, 1)
           for cx, cy, x in cells for _ in range(x)]
    pdf = spark.createDataFrame(
        [(a, b) for a, b, _ in pts], "lat double, lon double")
    got = morans_i(cell_counts(pdf, 1.0)).collect()[0]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE src AS SELECT * FROM (VALUES "
        + ",".join(f"({a},{b})" for a, b, _ in pts) + ") t(lat, lon)"
    )
    exp = con.execute(sql_morans_i("SELECT lat, lon FROM src", 1.0)).fetchone()
    assert (got["n_cells"], got["w_edges"], got["num"], got["den"]) == (
        exp[0], exp[1], exp[2], exp[3])
    assert got["moran_i"] == exp[4]  # bit-identical IEEE chain


# ---------------------------------------------------------------- Gi* --

from core_spark.operators.moran import getis_ord_gi, sql_getis_ord_gi  # noqa: E402
import math  # noqa: E402


def _run_gi(spark, cells):
    df = spark.createDataFrame(cells, "cx long, cy long, x long")
    return {(r["cx"], r["cy"]): (r["x"], r["nbr_sum"], r["nbr_cnt"], r["gi_z"])
            for r in getis_ord_gi(df).collect()}


def _model_gi(cells):
    n = len(cells)
    s = sum(x for _, _, x in cells)
    q = sum(x * x for _, _, x in cells)
    by = {(cx, cy): x for cx, cy, x in cells}
    out = {}
    for (cx, cy), x in by.items():
        hood = [by[(cx + dx, cy + dy)]
                for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                if (cx + dx, cy + dy) in by]
        g, k = sum(hood), len(hood)
        a, b = n * q - s * s, k * (n - k)
        z = (float(n * g - k * s)
             / math.sqrt(float(a) * float(b) / float(n - 1))
             if n > 1 and a > 0 and b > 0 else None)
        out[(cx, cy)] = (x, g, k, z)
    return out


def test_gi_hot_spot_is_positive_cold_negative(spark):
    # 5x5 flat background of 1 with a 10x spike at the center
    cells = [(cx, cy, 50 if (cx, cy) == (2, 2) else 1)
             for cx in range(5) for cy in range(5)]
    got = _run_gi(spark, cells)
    assert got == _model_gi(cells)
    # the spike's own hood is the hottest cell (a lone outlier also
    # inflates the global variance, so |z| stays modest — by design)
    assert got[(2, 2)][3] == max(v[3] for v in got.values())
    assert got[(2, 2)][3] > 0
    assert got[(0, 0)][3] < 0           # far corner reads cold


def test_gi_constant_surface_and_singleton_are_null(spark):
    assert all(v[3] is None
               for v in _run_gi(spark, [(cx, 0, 7) for cx in range(4)]).values())
    assert _run_gi(spark, [(0, 0, 5)])[(0, 0)][3] is None


def test_gi_random_lattice_matches_model_and_duckdb(spark):
    cells = [(cx, cy, (cx * 11 + cy * 5) % 13 + 1)
             for cx in range(6) for cy in range(5) if (cx + 3 * cy) % 6 != 0]
    got = _run_gi(spark, cells)
    model = _model_gi(cells)
    for key in model:
        assert got[key][:3] == model[key][:3]
        if model[key][3] is None:
            assert got[key][3] is None
        else:
            assert got[key][3] == pytest.approx(model[key][3], abs=1e-12)

    pts = [(float(cy) + 0.5, float(cx) + 0.5)
           for cx, cy, x in cells for _ in range(x)]
    pdf = spark.createDataFrame(pts, "lat double, lon double")
    from core_spark.operators.moran import cell_counts
    spark_rows = sorted(
        tuple(r) for r in getis_ord_gi(cell_counts(pdf, 1.0)).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE src AS SELECT * FROM (VALUES "
                + ",".join(f"({a},{b})" for a, b in pts) + ") t(lat, lon)")
    duck_rows = sorted(
        tuple(r) for r in
        con.execute(sql_getis_ord_gi("SELECT lat, lon FROM src", 1.0)).fetchall())
    assert spark_rows == duck_rows  # bit-identical incl. the sqrt chain


# ------------------------------------------------------------- Geary --

from core_spark.operators.moran import gearys_c, sql_gearys_c  # noqa: E402


def _run_geary(spark, cells):
    df = spark.createDataFrame(cells, "cx long, cy long, x long")
    return gearys_c(df).collect()[0]


def _model_geary(cells):
    n = len(cells)
    s = sum(x for _, _, x in cells)
    by = {(cx, cy): x for cx, cy, x in cells}
    pairs = [
        (xi, xj)
        for (ci, xi) in by.items()
        for (cj, xj) in by.items()
        if abs(ci[0] - cj[0]) + abs(ci[1] - cj[1]) == 1
    ]
    w = len(pairs)
    num = sum((xi - xj) ** 2 for xi, xj in pairs)
    den = sum((n * x - s) ** 2 for x in by.values())
    c = (float(n - 1) * float(num) * float(n) * float(n)
         / (2.0 * float(w) * float(den))) if w > 0 and den > 0 else None
    return n, w, num, den, c


def test_geary_checkerboard_reads_high_two_blocks_low(spark):
    checker = [(cx, cy, 10 * ((cx + cy) % 2)) for cx in range(4)
               for cy in range(4)]
    blocks = [(cx, cy, 100 if cx < 2 else 1) for cx in range(4)
              for cy in range(4)]
    rc = _run_geary(spark, checker)
    rb = _run_geary(spark, blocks)
    assert rc["geary_c"] > 1.0 > rb["geary_c"]  # repulsion vs clustering


def test_geary_undefined_cases(spark):
    assert _run_geary(spark, [(cx, 0, 7) for cx in range(4)])["geary_c"] \
        is None  # constant surface: den = 0
    assert _run_geary(spark, [(0, 0, 1), (9, 9, 5)])["geary_c"] is None


def test_geary_random_lattice_matches_model_and_duckdb(spark):
    cells = [(cx, cy, (cx * 7 + cy * 13) % 23 + ((cx * cy) % 5) * 11)
             for cx in range(6) for cy in range(5) if (cx + 2 * cy) % 7 != 0]
    r = _run_geary(spark, cells)
    n, w, num, den, c = _model_geary(cells)
    assert (r["n_cells"], r["w_edges"], r["num"], r["den"]) == (n, w, num, den)
    assert r["geary_c"] == pytest.approx(c)

    pts = [(float(cy) + 0.5, float(cx) + 0.5)
           for cx, cy, x in cells for _ in range(x)]
    pdf = spark.createDataFrame(pts, "lat double, lon double")
    got = gearys_c(cell_counts(pdf, 1.0)).collect()[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE gsrc AS SELECT * FROM (VALUES "
                + ",".join(f"({a},{b})" for a, b in pts) + ") t(lat, lon)")
    exp = con.execute(sql_gearys_c("SELECT lat, lon FROM gsrc", 1.0)).fetchone()
    assert tuple(got) == tuple(exp)  # bit-identical incl. the double


# -------------------------------------------------------------- LISA --

from core_spark.operators.moran import lisa_moran, sql_lisa_moran  # noqa: E402


def _run_lisa(spark, cells):
    df = spark.createDataFrame(cells, "cx long, cy long, x long")
    return {(r["cx"], r["cy"]): (r["x"], r["dev"], r["nbr_dev_sum"], r["lisa"])
            for r in lisa_moran(df).collect()}


def test_lisa_signs_and_global_decomposition(spark):
    # two-block surface: interior cells are high-high/low-low (I_i > 0);
    # and sum_i d_i*nbrsum_i must equal the GLOBAL moran numerator
    cells = [(cx, cy, 100 if cx < 2 else 1) for cx in range(4)
             for cy in range(4)]
    got = _run_lisa(spark, cells)
    assert got[(0, 0)][3] > 0 and got[(3, 3)][3] > 0   # cluster members
    local_num = sum(v[1] * v[2] for v in got.values())
    r = _run(spark, cells)  # the global statistic from the same module
    assert local_num == r["num"]


def test_lisa_outlier_is_negative(spark):
    # a lone spike in a flat field: the spike and its hood are outliers
    cells = [(cx, cy, 50 if (cx, cy) == (2, 2) else 1)
             for cx in range(5) for cy in range(5)]
    got = _run_lisa(spark, cells)
    assert got[(2, 2)][3] < 0          # high cell, low neighborhood
    assert got[(2, 1)][3] < 0          # low cell, spiked neighborhood


def test_lisa_constant_and_isolated(spark):
    assert all(v[3] is None for v in
               _run_lisa(spark, [(cx, 0, 7) for cx in range(4)]).values())
    got = _run_lisa(spark, [(0, 0, 1), (9, 9, 5)])
    assert got[(0, 0)][2] == 0 and got[(0, 0)][3] == 0.0


def test_lisa_matches_duckdb(spark):
    cells = [(cx, cy, (cx * 7 + cy * 13) % 23 + ((cx * cy) % 5) * 11)
             for cx in range(6) for cy in range(5) if (cx + 2 * cy) % 7 != 0]
    pts = [(float(cy) + 0.5, float(cx) + 0.5)
           for cx, cy, x in cells for _ in range(x)]
    pdf = spark.createDataFrame(pts, "lat double, lon double")
    got = sorted(tuple(r) for r in
                 lisa_moran(cell_counts(pdf, 1.0)).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE lsrc AS SELECT * FROM (VALUES "
                + ",".join(f"({a},{b})" for a, b in pts) + ") t(lat, lon)")
    exp = sorted(tuple(r) for r in con.execute(
        sql_lisa_moran("SELECT lat, lon FROM lsrc", 1.0)).fetchall())
    assert got == exp  # bit-identical incl. the double chain
