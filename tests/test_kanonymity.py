"""k-anonymity: Python-model parity on both engines, violating-mass
hand values, NULL-as-class semantics, empty release, validation."""

from __future__ import annotations

import duckdb
import pytest

from core_spark.operators.kanonymity import k_anonymity, sql_k_anonymity

K = 3
QUASI = ("lang", "bucket")


def model(rows, k=K):
    classes = {}
    for r in rows:
        classes[r] = classes.get(r, 0) + 1
    n = sum(classes.values())
    viol = {g: c for g, c in classes.items() if c < k}
    at_risk = sum(viol.values())
    return (
        k, n, len(classes), len(viol), at_risk,
        min(classes.values()) if classes else 0,
        (at_risk / n) if n else None,
    )


ROWS = (
    [("en", 1)] * 5          # safe class
    + [("en", 2)] * 3        # exactly k -> safe
    + [("de", 1)] * 2        # violating
    + [("fr", 9)]            # singleton -> violating
    + [(None, 1)] * 2        # NULL quasi forms its own (violating) class
)


def test_model_hand_checks():
    k, n, g, v, risk, mn, share = model(ROWS)
    assert (n, g, v, risk, mn) == (13, 5, 3, 5, 1)
    assert share == 5 / 13


def _vals(rows):
    sql_rows = ", ".join(
        "(" + ", ".join(
            "NULL" if v is None else (f"'{v}'" if isinstance(v, str) else str(v))
            for v in r) + ")"
        for r in rows
    )
    return f"SELECT * FROM (VALUES {sql_rows}) t(lang, bucket)"


def test_duckdb_twin_matches_model():
    got = duckdb.sql(sql_k_anonymity(_vals(ROWS), QUASI, K)).fetchall()[0]
    assert tuple(got) == model(ROWS)


@pytest.mark.spark
def test_spark_matches_model(spark):
    df = spark.createDataFrame(ROWS, "lang string, bucket long")
    got = tuple(k_anonymity(df, QUASI, K).collect()[0])
    assert got == model(ROWS)


@pytest.mark.spark
def test_engines_bit_identical(spark):
    rows = [(f"l{i % 7}", (i * i) % 11) for i in range(400)]
    df = spark.createDataFrame(rows, "lang string, bucket long")
    srow = tuple(k_anonymity(df, QUASI, 5).collect()[0])
    orow = tuple(duckdb.sql(
        sql_k_anonymity(_vals(rows), QUASI, 5)).fetchall()[0])
    assert srow == orow


@pytest.mark.spark
def test_empty_and_validation(spark):
    empty = spark.createDataFrame([], "lang string, bucket long")
    row = tuple(k_anonymity(empty, QUASI, K).collect()[0])
    assert row == (K, 0, 0, 0, 0, 0, None)
    with pytest.raises(ValueError):
        k_anonymity(empty, (), K)
    with pytest.raises(ValueError):
        k_anonymity(empty, QUASI, 1)
