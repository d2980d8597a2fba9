"""Trimmed mean: Python-model parity on both engines, outlier
immunity, tie-straddling cuts, all-trimmed absence, hygiene."""

from __future__ import annotations

import duckdb
import pytest

from core_spark.operators.trimmed import sql_trimmed_mean, trimmed_mean

K = 2


def model(rows, k=K):
    groups = {}
    for key, v in rows:
        if key is None or v is None:
            continue
        groups.setdefault(key, []).append(v)
    out = {}
    for key, vs in groups.items():
        n = len(vs)
        if n <= 2 * k:
            continue
        kept = sorted(vs)[k:n - k]
        s = sum(kept)
        out[key] = (n, n - 2 * k, s, s / (n - 2 * k))
    return out


ROWS = (
    [("clean", v) for v in (10, 20, 30, 40, 50, 60)]
    + [("spiky", v) for v in (0, 0, 100, 101, 102, 9_999_999, 9_999_999)]
    + [("ties", v) for v in (5, 5, 5, 5, 7, 9, 9, 9, 9)]  # cut in ties
    + [("tiny", v) for v in (1, 2, 3, 4)]                 # n = 2k -> absent
    + [("h", None), (None, 3)]
)


def test_model_hand_checks():
    m = model(ROWS)
    assert m["clean"] == (6, 2, 70, 35.0)
    assert m["spiky"][3] == 101.0                # outliers gone
    # ties: sorted 5,5,5,5,7,9,9,9,9 -> keep 5,5,7,9,9 = 35
    assert m["ties"] == (9, 5, 35, 7.0)
    assert "tiny" not in m and "h" not in m


def _vals(rows):
    sql_rows = ", ".join(
        "(" + ", ".join(
            "NULL" if v is None else (f"'{v}'" if isinstance(v, str) else str(v))
            for v in r) + ")"
        for r in rows
    )
    return f"SELECT * FROM (VALUES {sql_rows}) t(key, value)"


def test_duckdb_twin_matches_model():
    got = {
        r[0]: tuple(r[1:])
        for r in duckdb.sql(sql_trimmed_mean(_vals(ROWS), K)).fetchall()
    }
    assert got == model(ROWS)


@pytest.mark.spark
def test_spark_matches_model(spark):
    df = spark.createDataFrame(ROWS, "key string, value long")
    got = {
        r["key"]: (r["n_rows"], r["n_kept"], r["trimmed_sum"],
                   r["trimmed_mean"])
        for r in trimmed_mean(df, K).collect()
    }
    assert got == model(ROWS)


@pytest.mark.spark
def test_engines_bit_identical(spark):
    rows = [(f"g{i % 6}", ((i * 31) % 97) - 40) for i in range(600)]
    df = spark.createDataFrame(rows, "key string, value long")
    srows = sorted(tuple(r) for r in trimmed_mean(df, 7).collect())
    orows = sorted(
        tuple(r)
        for r in duckdb.sql(sql_trimmed_mean(_vals(rows), 7)).fetchall()
    )
    assert srows == orows


@pytest.mark.spark
def test_empty_and_validation(spark):
    empty = spark.createDataFrame([], "key string, value long")
    assert trimmed_mean(empty, K).count() == 0
    with pytest.raises(ValueError):
        trimmed_mean(empty, 0)
