"""Odds-ratio keyness: Python-model parity on both engines, hand
values (slam-dunk b=0 arm, shared-term OR~1, df-grain repetition
immunity), min_count, hygiene."""

from __future__ import annotations

import duckdb
import pytest

from core_spark.operators.keyness import (
    odds_ratio_keyness,
    sql_odds_ratio_keyness,
)


def model(rows, min_count=1):
    docs = [(ia, txt) for _, ia, txt in rows if ia is not None]
    n_a = sum(1 for ia, _ in docs if ia)
    n_b = len(docs) - n_a
    counts = {}
    for ia, txt in docs:
        for t in set(txt.strip().split(" ")):
            if not t:
                continue
            a0, b0 = counts.get(t, (0, 0))
            counts[t] = (a0 + (1 if ia else 0), b0 + (0 if ia else 1))
    out = {}
    for t, (a, b) in counts.items():
        if a + b < min_count:
            continue
        c, d = n_a - a, n_b - b
        num = (2 * a + 1) * (2 * d + 1)
        den = (2 * b + 1) * (2 * c + 1)
        out[t] = (a, b, n_a, n_b, num, den, num / den)
    return out


ROWS = [
    (1, True, "spam casino casino casino win"),   # df grain: casino once
    (2, True, "spam win news"),
    (3, True, "news weather"),
    (4, False, "news weather sport"),
    (5, False, "news sport"),
    (6, False, "weather  sport"),                 # double space -> '' drop
    (7, None, "ghost terms never counted"),       # dropped slice
]


def test_model_hand_checks():
    m = model(ROWS)
    # slam-dunk: spam in 2/3 A docs, 0/3 B docs
    assert m["spam"] == (2, 0, 3, 3, 5 * 7, 1 * 3, 35.0 / 3.0)
    # casino appears 3x in one doc but counts ONCE (df grain)
    assert m["casino"][0] == 1
    # news is everywhere: OR near 1
    assert 0.2 < m["news"][6] < 2.0
    assert "ghost" not in m


def _vals(rows):
    sql_rows = ", ".join(
        "(" + ", ".join(
            "NULL" if v is None else
            (f"'{v}'" if isinstance(v, str) else str(v).upper())
            for v in r) + ")"
        for r in rows
    )
    return f"SELECT * FROM (VALUES {sql_rows}) t(doc_id, is_a, text)"


def test_duckdb_twin_matches_model():
    got = {
        r[0]: tuple(r[1:])
        for r in duckdb.sql(
            sql_odds_ratio_keyness(_vals(ROWS))).fetchall()
    }
    assert got == model(ROWS)


@pytest.mark.spark
def test_spark_matches_model(spark):
    df = spark.createDataFrame(
        ROWS, "doc_id long, is_a boolean, text string"
    ).selectExpr("is_a", "split(trim(text), ' ') AS toks")
    got = {
        r["term"]: (r["a_docs"], r["b_docs"], r["n_a"], r["n_b"],
                    r["num"], r["den"], r["odds_ratio"])
        for r in odds_ratio_keyness(df).collect()
    }
    assert got == model(ROWS)


@pytest.mark.spark
def test_min_count_and_bit_identity(spark):
    rows = [
        (i, i % 3 == 0, " ".join(
            f"w{(i * j) % 17}" for j in range(1, 6)))
        for i in range(120)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, is_a boolean, text string"
    ).selectExpr("is_a", "split(trim(text), ' ') AS toks")
    srows = sorted(
        tuple(r)
        for r in odds_ratio_keyness(df, min_count=4).collect())
    orows = sorted(
        tuple(r)
        for r in duckdb.sql(
            sql_odds_ratio_keyness(_vals(rows), min_count=4)).fetchall()
    )
    assert srows == orows and len(srows) > 0
    assert all(r[1] + r[2] >= 4 for r in srows)


@pytest.mark.spark
def test_empty_and_validation(spark):
    empty = spark.createDataFrame(
        [], "is_a boolean, toks array<string>")
    assert odds_ratio_keyness(empty).count() == 0
    with pytest.raises(ValueError):
        odds_ratio_keyness(empty, min_count=0)
