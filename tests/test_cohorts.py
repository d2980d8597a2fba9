"""Cohort retention: Python-model parity on both engines, decay hand
values, age-0 identity, sparse-cell absence, hygiene."""

from __future__ import annotations

import duckdb
import pytest

from core_spark.operators.cohorts import (
    cohort_retention,
    sql_cohort_retention,
)


def model(rows):
    active = {}
    for k, p in rows:
        if k is None or p is None:
            continue
        active.setdefault(k, set()).add(p)
    cohorts = {k: min(ps) for k, ps in active.items()}
    sizes = {}
    for k, c in cohorts.items():
        sizes[c] = sizes.get(c, 0) + 1
    cells = {}
    for k, ps in active.items():
        c = cohorts[k]
        for p in ps:
            cells[(c, p - c)] = cells.get((c, p - c), 0) + 1
    return {
        (c, a): (n, sizes[c], n / sizes[c])
        for (c, a), n in cells.items()
    }


ROWS = [
    # cohort 1: u1 active weeks 1,2,3; u2 weeks 1,3; u3 week 1 only
    ("u1", 1), ("u1", 2), ("u1", 3),
    ("u2", 1), ("u2", 3),
    ("u3", 1),
    # cohort 2: u4 weeks 2,4
    ("u4", 2), ("u4", 4),
    # duplicate activity rows collapse
    ("u1", 2), ("u1", 2),
    ("h", None), (None, 1),
]


def test_model_hand_checks():
    m = model(ROWS)
    assert m[(1, 0)] == (3, 3, 1.0)          # age-0 identity
    assert m[(1, 1)] == (1, 3, 1 / 3)        # only u1 in week 2
    assert m[(1, 2)] == (2, 3, 2 / 3)        # u1+u2 in week 3
    assert m[(2, 2)] == (1, 1, 1.0)
    assert (2, 1) not in m                   # sparse cell absent
    assert all(a >= 0 for _, a in m)


def _vals(rows):
    sql_rows = ", ".join(
        "(" + ", ".join(
            "NULL" if v is None else (f"'{v}'" if isinstance(v, str) else str(v))
            for v in r) + ")"
        for r in rows
    )
    return f"SELECT * FROM (VALUES {sql_rows}) t(key, period)"


def test_duckdb_twin_matches_model():
    got = {
        (r[0], r[1]): tuple(r[2:])
        for r in duckdb.sql(sql_cohort_retention(_vals(ROWS))).fetchall()
    }
    assert got == model(ROWS)


@pytest.mark.spark
def test_spark_matches_model(spark):
    df = spark.createDataFrame(ROWS, "key string, period long")
    got = {
        (r["cohort"], r["age"]): (r["n_active"], r["cohort_size"],
                                  r["retention"])
        for r in cohort_retention(df).collect()
    }
    assert got == model(ROWS)


@pytest.mark.spark
def test_engines_bit_identical(spark):
    rows = [(f"u{i % 60}", (i * 7) % 12) for i in range(720)]
    df = spark.createDataFrame(rows, "key string, period long")
    srows = sorted(tuple(r) for r in cohort_retention(df).collect())
    orows = sorted(
        tuple(r)
        for r in duckdb.sql(sql_cohort_retention(_vals(rows))).fetchall()
    )
    assert srows == orows


@pytest.mark.spark
def test_empty(spark):
    empty = spark.createDataFrame([], "key string, period long")
    assert cohort_retention(empty).count() == 0
