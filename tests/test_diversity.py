"""Simpson diversity: Python-model parity on both engines, hand
values, NULL-for-singletons, hygiene arms."""

from __future__ import annotations

from collections import Counter

import duckdb
import pytest

from core_spark.operators.diversity import (
    simpson_diversity,
    sql_simpson_diversity,
)

ROWS = [
    ("t1", "a"), ("t1", "a"), ("t1", "b"), ("t1", "c"),   # mixed
    ("t2", "x"), ("t2", "x"), ("t2", "x"),                # monoculture
    ("t3", "p"), ("t3", "q"),                             # perfect pair
    ("t4", "solo"),                                       # N=1 -> NULL
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
        n, k = len(items), len(cnt)
        same = sum(c * (c - 1) for c in cnt.values())
        num, den = n * (n - 1) - same, n * (n - 1)
        out[g] = (n, k, num, den, (num / den) if den else None)
    return out


def test_model_hand_checks():
    m = model(ROWS)
    assert m["t1"] == (4, 3, 12 - 2, 12, 10 / 12)
    assert m["t2"] == (3, 1, 0, 6, 0.0)          # monoculture -> 0
    assert m["t3"] == (2, 2, 2, 2, 1.0)          # perfectly mixed -> 1
    assert m["t4"][4] is None                    # single row -> NULL
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
        r[0]: (r[1], r[2], r[3], r[4], r[5])
        for r in duckdb.sql(sql_simpson_diversity(_vals(ROWS))).fetchall()
    }
    assert got == model(ROWS)


@pytest.mark.spark
def test_spark_matches_model(spark):
    df = spark.createDataFrame(ROWS, "grp string, item string")
    got = {
        r["grp"]: (r["n_rows"], r["n_items"], r["num"], r["den"],
                   r["simpson"])
        for r in simpson_diversity(df).collect()
    }
    assert got == model(ROWS)


@pytest.mark.spark
def test_engines_bit_identical(spark):
    rows = [(f"g{i % 5}", f"h{(i * 7) % 11}") for i in range(300)]
    df = spark.createDataFrame(rows, "grp string, item string")
    srows = sorted(tuple(r) for r in simpson_diversity(df).collect())
    orows = sorted(
        tuple(r)
        for r in duckdb.sql(sql_simpson_diversity(_vals(rows))).fetchall()
    )
    assert srows == orows


@pytest.mark.spark
def test_custom_cols_and_empty(spark):
    df = spark.createDataFrame(
        [("c1", "a"), ("c1", "b")], "cell string, host string")
    row = simpson_diversity(df, "cell", "host").collect()[0]
    assert (row["grp"], row["simpson"]) == ("c1", 1.0)
    empty = spark.createDataFrame([], "grp string, item string")
    assert simpson_diversity(empty).count() == 0
