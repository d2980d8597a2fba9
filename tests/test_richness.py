"""Chao1 + Good-Turing coverage: Python-model parity on both engines,
hand values (incl. the all-singletons and no-doubletons arms), bit
identity, hygiene."""

from __future__ import annotations

from collections import Counter

import duckdb
import pytest

from core_spark.operators.richness import (
    chao1_richness,
    sql_chao1_richness,
)

ROWS = [
    # t1: counts a=3, b=2, c=1, d=1 -> f1=2, f2=1, chao1 = 4 + 2/4
    ("t1", "a"), ("t1", "a"), ("t1", "a"), ("t1", "b"), ("t1", "b"),
    ("t1", "c"), ("t1", "d"),
    # t2: all singletons, f2=0 -> the bias-corrected denominator arm
    ("t2", "p"), ("t2", "q"), ("t2", "r"),
    # t3: one item seen many times -> chao1 = s_obs, coverage = 1
    ("t3", "x"), ("t3", "x"), ("t3", "x"), ("t3", "x"),
    # t4: single row -> chao1 = 1, coverage = 0
    ("t4", "solo"),
    ("t5", None), (None, "y"),                            # dropped
]


def model(rows):
    groups = {}
    for g, i in rows:
        if g is None or i is None:
            continue
        groups.setdefault(g, []).append(i)
    out = {}
    for g, items in groups.items():
        cnt = Counter(items)
        n, s = len(items), len(cnt)
        f1 = sum(1 for c in cnt.values() if c == 1)
        f2 = sum(1 for c in cnt.values() if c == 2)
        chao1 = float(s) + float(f1 * (f1 - 1)) / float(2 * (f2 + 1))
        coverage = float(n - f1) / float(n)
        out[g] = (n, s, f1, f2, chao1, coverage)
    return out


def test_model_hand_checks():
    m = model(ROWS)
    assert m["t1"] == (7, 4, 2, 1, 4.0 + 2.0 / 4.0, 5.0 / 7.0)
    assert m["t2"] == (3, 3, 3, 0, 3.0 + 6.0 / 2.0, 0.0)
    assert m["t3"] == (4, 1, 0, 0, 1.0, 1.0)
    assert m["t4"] == (1, 1, 1, 0, 1.0, 0.0)
    assert "t5" not in m and None not in m


def _vals(rows):
    sql_rows = ", ".join(
        "(" + ("NULL" if g is None else f"'{g}'") + ", "
        + ("NULL" if i is None else f"'{i}'") + ")"
        for g, i in rows
    )
    return f"SELECT * FROM (VALUES {sql_rows}) t(grp, item)"


def test_duckdb_twin_matches_model():
    got = {
        r[0]: tuple(r[1:])
        for r in duckdb.sql(sql_chao1_richness(_vals(ROWS))).fetchall()
    }
    assert got == model(ROWS)


@pytest.mark.spark
def test_spark_matches_model(spark):
    df = spark.createDataFrame(ROWS, "grp string, item string")
    got = {
        r["grp"]: (r["n_rows"], r["s_obs"], r["f1"], r["f2"],
                   r["chao1"], r["coverage"])
        for r in chao1_richness(df).collect()
    }
    assert got == model(ROWS)


@pytest.mark.spark
def test_engines_bit_identical(spark):
    rows = [(f"g{i % 4}", f"h{(i * i) % 37}") for i in range(400)]
    df = spark.createDataFrame(rows, "grp string, item string")
    srows = sorted(tuple(r) for r in chao1_richness(df).collect())
    orows = sorted(
        tuple(r)
        for r in duckdb.sql(sql_chao1_richness(_vals(rows))).fetchall()
    )
    assert srows == orows


@pytest.mark.spark
def test_custom_cols_and_empty(spark):
    df = spark.createDataFrame(
        [("c1", "a"), ("c1", "a")], "cell string, host string")
    row = chao1_richness(df, "cell", "host").collect()[0]
    assert (row["grp"], row["chao1"], row["coverage"]) == ("c1", 1.0, 1.0)
    empty = spark.createDataFrame([], "grp string, item string")
    assert chao1_richness(empty).count() == 0
