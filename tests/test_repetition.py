"""Gopher repetition signals (core_spark/functions/repetition.py)."""

from __future__ import annotations

import duckdb
import pytest

from core_spark.functions import repetition as rp


# (text, n_tokens, n_distinct, top_token_n, top_bigram_n)
CASES = [
    ("a b a b a", 5, 2, 3, 2),          # bigrams: "a b"x2, "b a"x2
    ("x", 1, 1, 1, 0),
    ("", 0, 0, 0, 0),
    (None, 0, 0, 0, 0),
    ("u v w u v w u v", 8, 3, 3, 3),    # "u v" x3
    ("one two three four", 4, 4, 1, 1),
    ("  pad   pad  ", 2, 1, 2, 1),      # whitespace-run + trim handling
]


def _expected(i):
    t, n, d, tt, tb = CASES[i]
    dup = (n - d) / n if n else 0.0
    ttf = tt / n if n else 0.0
    tbf = tb / (n - 1) if n > 1 else 0.0
    return (n, d, tt, tb, dup, ttf, tbf)


@pytest.mark.spark
def test_with_repetition_spark(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, *_r) in enumerate(CASES)], "doc_id INT, text STRING"
    )
    rows = {r.doc_id: r for r in rp.with_repetition(df).collect()}
    for i in range(len(CASES)):
        r = rows[i]
        got = (r.n_tokens, r.n_distinct, r.top_token_n, r.top_bigram_n,
               r.dup_token_frac, r.top_token_frac, r.top_bigram_frac)
        assert got == _expected(i), f"case {i}: {got}"
    # intermediates must be dropped
    assert "_toks" not in rows[0].asDict() and "_bigrams" not in rows[0].asDict()


def test_duckdb_twin_matches():
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id INT, text VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", [(i, t) for i, (t, *_r) in enumerate(CASES)]
    )
    for row in con.execute(rp.duck_rep_sql("t") + " ORDER BY doc_id").fetchall():
        assert tuple(row[1:]) == _expected(row[0]), f"case {row[0]}: {row}"


@pytest.mark.spark
def test_no_shuffle_in_plan(spark):
    """The signal is within-row: the physical plan must not exchange."""
    df = spark.createDataFrame([(0, "a b a")], "doc_id INT, text STRING")
    plan = rp.with_repetition(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
