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


# --- l-diversity -----------------------------------------------------

from core_spark.operators.kanonymity import l_diversity, sql_l_diversity

L = 2
LROWS = (
    [("en", 1, "s1")] * 3                      # diverse? one value -> viol
    + [("en", 2, "s1"), ("en", 2, "s2")]       # 2 values -> safe
    + [("de", 1, "s1"), ("de", 1, None)]       # NULL counts as a value
    + [("fr", 3, "s9")]                        # singleton -> violating
)


def lmodel(rows, l=L):
    classes = {}
    for lang, b, s in rows:
        classes.setdefault((lang, b), []).append(s)
    n = len(rows)
    viol_rows = 0
    viol = 0
    mindiv = None
    for vals in classes.values():
        d = len(set(vals))
        mindiv = d if mindiv is None else min(mindiv, d)
        if d < l:
            viol += 1
            viol_rows += len(vals)
    return (l, n, len(classes), viol, viol_rows, mindiv or 0,
            (viol_rows / n) if n else None)


def test_l_model_hand_checks():
    l, n, g, v, risk, mn, share = lmodel(LROWS)
    assert (n, g, v, risk, mn) == (8, 4, 2, 4, 1)


def _lvals(rows):
    sql_rows = ", ".join(
        "(" + ", ".join(
            "NULL" if v is None else (f"'{v}'" if isinstance(v, str) else str(v))
            for v in r) + ")"
        for r in rows
    )
    return f"SELECT * FROM (VALUES {sql_rows}) t(lang, bucket, sens)"


def test_l_duckdb_twin_matches_model():
    got = duckdb.sql(
        sql_l_diversity(_lvals(LROWS), QUASI, "sens", L)).fetchall()[0]
    assert tuple(got) == lmodel(LROWS)


@pytest.mark.spark
def test_l_spark_matches_model(spark):
    df = spark.createDataFrame(
        LROWS, "lang string, bucket long, sens string")
    got = tuple(l_diversity(df, QUASI, "sens", L).collect()[0])
    assert got == lmodel(LROWS)


@pytest.mark.spark
def test_l_bit_identity_and_validation(spark):
    rows = [(f"l{i % 5}", (i * 3) % 7, f"s{(i * i) % 4}")
            for i in range(300)]
    df = spark.createDataFrame(
        rows, "lang string, bucket long, sens string")
    srow = tuple(l_diversity(df, QUASI, "sens", 3).collect()[0])
    orow = tuple(duckdb.sql(
        sql_l_diversity(_lvals(rows), QUASI, "sens", 3)).fetchall()[0])
    assert srow == orow
    with pytest.raises(ValueError):
        l_diversity(df, QUASI, "sens", 1)
