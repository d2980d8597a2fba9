"""Distinctive-term extraction (operators/termstats.py) vs a Python model."""

from __future__ import annotations

from collections import Counter

import pytest

from core_spark.operators.termstats import (
    distinctive_terms,
    document_frequency,
    top_vocab,
)

DOCS = [
    (0, ["a", "b", "b", "c", "rare"]),
    (1, ["a", "a", "a", "b", "z"]),
    (2, ["c", "c", "b", "q", "q", "q"]),
    (3, ["a", "b", "c"]),
]
V, K = 4, 2


def _model():
    dfreq = Counter()
    for _, toks in DOCS:
        dfreq.update(set(toks))
    vocab = dict(
        sorted(dfreq.items(), key=lambda kv: (-kv[1], kv[0]))[:V]
    )
    out = []
    for doc_id, toks in DOCS:
        tf = Counter(toks)
        rows = sorted(
            ((t, n, vocab[t]) for t, n in tf.items() if t in vocab),
            key=lambda r: (-r[1], r[2], r[0]),
        )[:K]
        out.extend(
            (doc_id, t, n, d, i + 1) for i, (t, n, d) in enumerate(rows)
        )
    return sorted(out)


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, toks array<string>")


@pytest.mark.spark
def test_document_frequency(spark):
    got = {
        r["term"]: r["df_count"]
        for r in document_frequency(_df(spark)).collect()
    }
    want = Counter()
    for _, toks in DOCS:
        want.update(set(toks))
    assert got == dict(want)


@pytest.mark.spark
def test_distinctive_terms_vs_model(spark):
    df = _df(spark)
    vocab = top_vocab(document_frequency(df), V)
    got = sorted(
        (r["doc_id"], r["term"], r["tf"], r["df_count"], r["rank"])
        for r in distinctive_terms(df, vocab, K).collect()
    )
    assert got == _model()


@pytest.mark.spark
def test_vocab_cap_bites(spark):
    """V=4 keeps b(4),a(3),c(3) and the df=1 tie resolves alphabetically:
    'q' makes the cut, 'rare'/'z' are dropped by the vocabulary contract
    even where they'd top a doc's tf ranking."""
    df = _df(spark)
    vocab = top_vocab(document_frequency(df), V)
    terms = {r["term"] for r in distinctive_terms(df, vocab, K).collect()}
    assert "rare" not in terms and "z" not in terms
    assert "q" in terms  # tf=3 in doc 2 and inside the vocab cut


@pytest.mark.spark
def test_plan_no_window_and_broadcast(spark):
    df = _df(spark)
    vocab = top_vocab(document_frequency(df), V)
    plan = distinctive_terms(df, vocab, K)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Window" not in plan
    assert "Broadcast" in plan


@pytest.mark.spark
def test_empty_input(spark):
    df = spark.createDataFrame([], "doc_id long, toks array<string>")
    vocab = top_vocab(document_frequency(df), V)
    assert distinctive_terms(df, vocab, K).count() == 0
