"""Gini concentration: Python-model parity on both engines, classical
hand values, tie invariance, hygiene arms."""

from __future__ import annotations

from collections import Counter

import duckdb
import pytest

from core_spark.operators.gini import gini_concentration, sql_gini_concentration


def model(items):
    cnts = sorted(Counter(i for i in items if i is not None).values())
    n, tot = len(cnts), sum(cnts)
    sri = sum(i * x for i, x in enumerate(cnts, start=1))
    num, den = 2 * sri - (n + 1) * tot, n * tot
    return (n, tot, num, den, (num / den) if den else None)


def test_model_hand_checks():
    # all-equal -> 0; extreme concentration -> (n-1)/n
    assert model(["a", "b", "c"])[4] == 0.0
    n, tot, num, den, g = model(["a"] * 97 + ["b", "c", "d"])
    assert g == pytest.approx((2 * (1 + 2 + 3 + 4 * 97) - 5 * 100) / (4 * 100))
    assert model(["x"])[4] == 0.0
    assert model([])[4] is None


def _vals(items):
    rows = ", ".join(
        "(" + ("NULL" if i is None else "'" + i + "'") + ")" for i in items
    )
    return f"SELECT * FROM (VALUES {rows}) t(item)"


CASES = [
    ["a", "b", "c"],                       # all equal -> 0
    ["a"] * 50 + ["b"] * 30 + ["c"] * 20,  # moderate skew
    ["a"] * 97 + ["b", "c", "d"],          # heavy skew
    ["solo"],                              # single group -> 0
    ["a", "a", "b", "b", "c", None],       # ties + NULL dropped
    ["h" + str(i) for i in range(40)],     # all singletons -> 0
]


@pytest.mark.parametrize("items", CASES)
def test_duckdb_twin_matches_model(items):
    row = duckdb.sql(sql_gini_concentration(_vals(items))).fetchone()
    n, tot, num, den, g = model(items)
    assert (row[0], row[1], row[2], row[3]) == (n, tot, num, den)
    assert row[4] == (None if g is None else pytest.approx(g, abs=0))


@pytest.mark.spark
@pytest.mark.parametrize("items", CASES)
def test_spark_matches_model(spark, items):
    df = spark.createDataFrame([(i,) for i in items], "item string")
    row = gini_concentration(df).collect()[0]
    n, tot, num, den, g = model(items)
    assert (row["n_groups"], row["total"], row["num"], row["den"]) == (
        n, tot, num, den)
    assert row["gini"] == (None if g is None else g)


@pytest.mark.spark
def test_engines_bit_identical(spark):
    items = [f"h{i % 7}" for i in range(200)] + ["mega"] * 300
    df = spark.createDataFrame([(i,) for i in items], "item string")
    srow = tuple(gini_concentration(df).collect()[0])
    orow = duckdb.sql(sql_gini_concentration(_vals(items))).fetchone()
    assert srow == tuple(orow)


@pytest.mark.spark
def test_empty_and_all_null(spark):
    empty = spark.createDataFrame([], "item string")
    row = gini_concentration(empty).collect()[0]
    assert tuple(row) == (0, 0, 0, 0, None)
    nulls = spark.createDataFrame([(None,), (None,)], "item string")
    assert tuple(gini_concentration(nulls).collect()[0]) == (0, 0, 0, 0, None)


@pytest.mark.spark
def test_custom_item_col(spark):
    df = spark.createDataFrame([("a",), ("a",), ("b",)], "host string")
    row = gini_concentration(df, item_col="host").collect()[0]
    assert (row["n_groups"], row["total"]) == (2, 3)
