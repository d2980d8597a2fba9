"""Battery for operators/rake.py — fixed-point RAKE keywords."""

from __future__ import annotations

import duckdb
import pytest

from core_spark.operators.rake import rake_keywords, sql_rake_keywords

pytestmark = pytest.mark.spark

_SW = ("a", "the")


def _got(spark, texts, **kw):
    df = spark.createDataFrame([(t,) for t in texts], "text STRING")
    return [
        (r.phrase, r.n_occ, r.n_words, r.score_fp)
        for r in rake_keywords(df, stopwords=_SW, **kw).collect()
    ]


def test_segmentation_and_scores_closed_form(spark):
    # one doc: "red apple the red apple a pie" ->
    # phrases: "red apple" x2, "pie" x1
    rows = _got(spark, ["red apple the red apple a pie"])
    by = {p: (o, n, s) for p, o, n, s in rows}
    # red: freq 2, deg 4 -> 2e6; apple: freq 2, deg 4 -> 2e6;
    # pie: freq 1, deg 1 -> 1e6
    assert by["red apple"] == (2, 2, 4_000_000)
    assert by["pie"] == (1, 1, 1_000_000)
    # longer phrases outrank single words (the RAKE property)
    assert rows[0][0] == "red apple"


def test_max_len_discards_runs(spark):
    rows = _got(spark, ["w1 w2 w3 w4 w5 the ok go"], max_len=4)
    phrases = {p for p, *_ in rows}
    assert phrases == {"ok go"}  # the 5-word run is discarded


def test_stopword_edges_and_empty(spark):
    # leading/trailing/consecutive stopwords produce no empty phrases
    rows = _got(spark, ["the a red the the blue a"])
    assert {p for p, *_ in rows} == {"red", "blue"}
    assert _got(spark, ["", "the a the"]) == []


def test_deterministic_tie_break_and_k(spark):
    rows = _got(spark, ["x the y the x the y"], k=1)
    # x and y tie (freq 2, deg 2): lexicographic 'x' wins
    assert len(rows) == 1 and rows[0][0] == "x"


def test_validation(spark):
    df = spark.createDataFrame([("t",)], "text STRING")
    with pytest.raises(ValueError):
        rake_keywords(df, stopwords=())
    with pytest.raises(ValueError):
        rake_keywords(df, k=0)


def test_duckdb_twin_matches(spark):
    texts = [
        " ".join(
            ["the" if (i * j) % 5 == 0 else f"w{(i * 3 + j) % 7}"
             for j in range(30)])
        for i in range(25)
    ]
    got = _got(spark, texts)
    con = duckdb.connect()
    con.execute("CREATE TABLE d (text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?)", [(t,) for t in texts])
    want = [
        tuple(r) for r in con.sql(
            sql_rake_keywords("SELECT text FROM d", stopwords=_SW)
        ).fetchall()
    ]
    assert got == want and got
