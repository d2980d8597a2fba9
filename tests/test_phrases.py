"""Phrase search: model parity both engines, overlaps, edges, plan."""

from __future__ import annotations

import duckdb
import pytest

from core_spark.operators.phrases import phrase_search, sql_phrase_search

DOCS = [
    (1, "new york is not york new"),          # one hit at 0
    (2, "i love new york new york so much"),  # two hits (2, 4)
    (3, "new new york"),                      # hit at 1; first token decoy
    (4, "york new"),                          # reversed -> no hit
    (5, "new"),                               # incomplete phrase
    (6, None),                                # NULL text
    (7, ""),                                  # empty text
    (8, "a a a a"),                           # overlap fixture (phrase a a)
]


def model(docs, terms):
    out = {}
    for i, text in docs:
        toks = (text or "").split(" ")
        hits = [
            p for p in range(len(toks) - len(terms) + 1)
            if toks[p:p + len(terms)] == terms
        ]
        if hits:
            out[i] = (len(hits), hits[0])
    return out


def _vals():
    rows = ", ".join(
        f"({i}, " + ("NULL" if t is None else f"'{t}'") + ")"
        for i, t in DOCS
    )
    return f"SELECT * FROM (VALUES {rows}) t(doc_id, text)"


@pytest.mark.parametrize("terms", [["new", "york"], ["a", "a"], ["new"]])
def test_duckdb_twin_matches_model(terms):
    got = {
        r[0]: (r[1], r[2])
        for r in duckdb.sql(sql_phrase_search(_vals(), terms)).fetchall()
    }
    assert got == model(DOCS, terms)


def test_model_hand_checks():
    assert model(DOCS, ["new", "york"]) == {
        1: (1, 0), 2: (2, 2), 3: (1, 1)}
    assert model(DOCS, ["a", "a"]) == {8: (3, 0)}  # overlaps count


@pytest.mark.spark
@pytest.mark.parametrize("terms", [["new", "york"], ["a", "a"], ["new"]])
def test_spark_matches_model(spark, terms):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["match_count"], r["first_pos"])
        for r in phrase_search(df, terms).collect()
    }
    assert got == model(DOCS, terms)


@pytest.mark.spark
def test_quote_and_backslash_terms(spark):
    rows = [(1, "it's a\\b it's"), (2, "its ab")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["match_count"], r["first_pos"])
        for r in phrase_search(df, ["it's", "a\\b"]).collect()
    }
    assert got == {1: (1, 0)}
    oracle = duckdb.sql(sql_phrase_search(
        "SELECT 1 AS doc_id, 'it''s a\\b it''s' AS text",
        ["it's", "a\\b"],
    )).fetchall()
    assert oracle == [(1, 1, 0)]


@pytest.mark.spark
def test_plan_is_shuffle_and_python_free(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = (
        phrase_search(df, ["new", "york"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_rejects_bad_terms():
    for bad in ([], [""], ["two words"]):
        with pytest.raises(ValueError):
            sql_phrase_search("SELECT 1", bad)
