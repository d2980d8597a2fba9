"""Streaks: Python-model parity on both engines, tie-break to the
earliest run, duplicate-day collapse, singleton streaks, hygiene."""

from __future__ import annotations

import duckdb
import pytest

from core_spark.operators.streaks import (
    longest_streaks,
    sql_longest_streaks,
)


def model(rows):
    groups = {}
    for k, d in rows:
        if k is None or d is None:
            continue
        groups.setdefault(k, set()).add(d)
    out = {}
    for k, ds in groups.items():
        days = sorted(ds)
        runs = []
        start = prev = days[0]
        for d in days[1:]:
            if d == prev + 1:
                prev = d
                continue
            runs.append((start, prev - start + 1))
            start = prev = d
        runs.append((start, prev - start + 1))
        best = max(runs, key=lambda r: (r[1], -r[0]))
        out[k] = (len(days), len(runs), best[1], best[0],
                  best[0] + best[1] - 1)
    return out


ROWS = (
    [("runs", d) for d in (1, 2, 3, 7, 8, 9, 10, 20)]   # longest 7-10
    + [("tie", d) for d in (1, 2, 5, 6, 9)]             # two 2-runs
    + [("dup", d) for d in (4, 4, 5, 5, 6)]             # dups collapse
    + [("solo", 42)]                                    # streak of 1
    + [("h", None), (None, 3)]
)


def test_model_hand_checks():
    m = model(ROWS)
    assert m["runs"] == (8, 3, 4, 7, 10)
    assert m["tie"] == (5, 3, 2, 1, 2)      # earliest 2-run wins
    assert m["dup"] == (3, 1, 3, 4, 6)
    assert m["solo"] == (1, 1, 1, 42, 42)
    assert "h" not in m


def _vals(rows):
    sql_rows = ", ".join(
        "(" + ", ".join(
            "NULL" if v is None else (f"'{v}'" if isinstance(v, str) else str(v))
            for v in r) + ")"
        for r in rows
    )
    return f"SELECT * FROM (VALUES {sql_rows}) t(key, day)"


def test_duckdb_twin_matches_model():
    got = {
        r[0]: tuple(r[1:])
        for r in duckdb.sql(sql_longest_streaks(_vals(ROWS))).fetchall()
    }
    assert got == model(ROWS)


@pytest.mark.spark
def test_spark_matches_model(spark):
    df = spark.createDataFrame(ROWS, "key string, day long")
    got = {
        r["key"]: (r["n_active_days"], r["n_streaks"],
                   r["longest_streak"], r["streak_start"],
                   r["streak_end"])
        for r in longest_streaks(df).collect()
    }
    assert got == model(ROWS)


@pytest.mark.spark
def test_engines_bit_identical(spark):
    rows = [(f"g{i % 7}", (i * 13) % 60) for i in range(700)]
    df = spark.createDataFrame(rows, "key string, day long")
    srows = sorted(tuple(r) for r in longest_streaks(df).collect())
    orows = sorted(
        tuple(r)
        for r in duckdb.sql(sql_longest_streaks(_vals(rows))).fetchall()
    )
    assert srows == orows


@pytest.mark.spark
def test_empty(spark):
    empty = spark.createDataFrame([], "key string, day long")
    assert longest_streaks(empty).count() == 0
