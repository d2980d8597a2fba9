"""Join counts: Python-model parity on both engines, segregated /
checkerboard / single-label regimes, adjacency enumeration, hygiene."""

from __future__ import annotations

import duckdb
import pytest

from core_spark.operators.joincount import join_counts, sql_join_counts


def model(cells):
    clean = [(ix, iy, b) for ix, iy, b in cells
             if ix is not None and iy is not None and b is not None]
    n = len(clean)
    n_b = sum(1 for _, _, b in clean if b)
    n_w = n - n_b
    j = bb = ww = bw = 0
    for i in range(n):
        for k in range(i + 1, n):
            x1, y1, b1 = clean[i]
            x2, y2, b2 = clean[k]
            if abs(x1 - x2) + abs(y1 - y2) == 1:
                j += 1
                bb += b1 and b2
                ww += (not b1) and (not b2)
                bw += b1 != b2
    exp_num, exp_den = 2 * j * n_b * n_w, n * (n - 1)
    expected = exp_num / exp_den if n >= 2 else None
    ratio = (
        (bw * exp_den) / exp_num if j and n_b and n_w else None
    )
    return (n, n_b, n_w, j, bb, ww, bw, exp_num, exp_den,
            expected, ratio)


def _grid(label):
    return [(x, y, label(x, y)) for x in range(4) for y in range(4)]


SEGREGATED = _grid(lambda x, y: x < 2)          # two halves
CHECKER = _grid(lambda x, y: (x + y) % 2 == 0)  # alternating
ALL_B = _grid(lambda x, y: True)                # single label
HYGIENE = SEGREGATED + [(None, 0, True), (9, None, False),
                        (10, 10, None)]


def test_model_regimes():
    n, n_b, n_w, j, bb, ww, bw, *_ , expected, ratio = model(SEGREGATED)
    assert (n, n_b, n_w, j) == (16, 8, 8, 24)
    assert bw == 4 and ratio < 0.5             # only the seam mixes
    _, _, _, j2, bb2, ww2, bw2, *_, ratio2 = model(CHECKER)
    assert bb2 == 0 and ww2 == 0 and bw2 == j2  # perfect repulsion
    assert ratio2 > 1.5
    m3 = model(ALL_B)
    assert m3[10] is None and m3[6] == 0        # no margin -> NULL ratio


def _vals(cells):
    rows = ", ".join(
        "(" + ", ".join(
            "NULL" if v is None else str(v).upper() if isinstance(v, bool)
            else str(v) for v in c) + ")"
        for c in cells
    )
    return f"SELECT * FROM (VALUES {rows}) t(ix, iy, is_b)"


def test_duckdb_twin_matches_model():
    for cells in (SEGREGATED, CHECKER, ALL_B, HYGIENE):
        got = duckdb.sql(sql_join_counts(_vals(cells))).fetchall()[0]
        assert tuple(got) == model(cells)


@pytest.mark.spark
def test_spark_matches_model(spark):
    for cells in (SEGREGATED, CHECKER, ALL_B, HYGIENE):
        df = spark.createDataFrame(
            cells, "ix long, iy long, is_b boolean")
        got = tuple(join_counts(df).collect()[0])
        assert got == model(cells)


@pytest.mark.spark
def test_engines_bit_identical(spark):
    cells = [
        (i % 23, i // 23, (i * 7) % 3 == 0) for i in range(400)
    ]
    df = spark.createDataFrame(cells, "ix long, iy long, is_b boolean")
    srow = tuple(join_counts(df).collect()[0])
    orow = tuple(duckdb.sql(sql_join_counts(_vals(cells))).fetchall()[0])
    assert srow == orow


@pytest.mark.spark
def test_empty(spark):
    empty = spark.createDataFrame([], "ix long, iy long, is_b boolean")
    row = tuple(join_counts(empty).collect()[0])
    assert row == (0, 0, 0, 0, 0, 0, 0, 0, 0, None, None)
